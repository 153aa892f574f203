"""Pallas-fused InfoNCE — the Stage-1 contrastive loss as one TPU kernel.

Fuses L2 normalization, the positive/negative cosine logits, the
log-softmax, and the masked per-anchor loss into a single VMEM-resident
kernel (forward), with a matching hand-written backward kernel via
jax.custom_vjp (the pattern of the guide's "Custom VJP" section). Replaces
four separate einsum/softmax ops of the XLA path (ops/contrastive.py:167-184,
≙ reference affinity_module.py:1226-1237) — the fusion keeps the [A, NEG]
logit matrix on-chip instead of round-tripping HBM, and the backward
recomputes it rather than saving it.

Anchors are tiled over the grid; NEG and E ride fully in VMEM (typical sizes
63 x 128). Numerics: f32 throughout, max-subtracted softmax.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12


def _norm_rows(x):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + _EPS)


def _fwd_kernel(a_ref, p_ref, n_ref, v_ref, t_ref, loss_ref):
    """Online-softmax (flash-style) over the negatives: Mosaic supports
    dynamic slicing only on REFS (pl.ds), not on values, so the negatives are
    streamed per-k from n_ref and reduced into a running (max, sum) carry —
    the [B, NEG] logit matrix never exists."""
    a = _norm_rows(a_ref[:].astype(jnp.float32))          # [B, E]
    p = _norm_rows(p_ref[:].astype(jnp.float32))          # [B, E]
    inv_t = 1.0 / t_ref[0]
    B = a.shape[0]
    NEG = n_ref.shape[1]

    lp = jnp.sum(a * p, axis=-1) * inv_t                  # [B]

    def step(k, carry):
        m, z = carry
        nk = _norm_rows(n_ref[:, pl.ds(k, 1)][:, 0].astype(jnp.float32))
        d = jnp.sum(a * nk, axis=-1) * inv_t              # [B]
        m_new = jnp.maximum(m, d)
        z = z * jnp.exp(m - m_new) + jnp.exp(d - m_new)
        return m_new, z

    m0 = lp
    z0 = jnp.ones((B,), jnp.float32)                      # exp(lp - m0)
    m, z = jax.lax.fori_loop(0, NEG, step, (m0, z0))
    per = (m + jnp.log(z) - lp) * v_ref[:, 0].astype(jnp.float32)
    loss_ref[:] = per[:, None]


def _bwd_kernel(a_ref, p_ref, n_ref, v_ref, t_ref, g_ref,
                da_ref, dp_ref, dn_ref):
    """Two streamed passes over the negatives (recompute-not-store): pass 1
    rebuilds the online-softmax statistics, pass 2 emits dn_k and accumulates
    the anchor gradient. 2-D values only (VMEM-stack friendly)."""
    a_raw = a_ref[:].astype(jnp.float32)
    p_raw = p_ref[:].astype(jnp.float32)
    inv_an = jax.lax.rsqrt(jnp.sum(a_raw * a_raw, -1, keepdims=True) + _EPS)
    inv_pn = jax.lax.rsqrt(jnp.sum(p_raw * p_raw, -1, keepdims=True) + _EPS)
    a = a_raw * inv_an
    p = p_raw * inv_pn
    inv_t = 1.0 / t_ref[0]
    B = a.shape[0]
    NEG = n_ref.shape[1]

    def read_k(k):
        nk_raw = n_ref[:, pl.ds(k, 1)][:, 0].astype(jnp.float32)
        inv = jax.lax.rsqrt(jnp.sum(nk_raw * nk_raw, -1, keepdims=True) + _EPS)
        return nk_raw * inv, inv

    lp = jnp.sum(a * p, axis=-1) * inv_t

    def stats(k, carry):
        m, z = carry
        nk, _ = read_k(k)
        d = jnp.sum(a * nk, axis=-1) * inv_t
        m_new = jnp.maximum(m, d)
        return m_new, z * jnp.exp(m - m_new) + jnp.exp(d - m_new)

    m, z = jax.lax.fori_loop(0, NEG, stats, (lp, jnp.ones((B,), jnp.float32)))
    sp = jnp.exp(lp - m) / z                               # [B]

    g = g_ref[:, 0].astype(jnp.float32) * v_ref[:, 0].astype(jnp.float32)  # [B]
    coef_p = (sp - 1.0) * g * inv_t                        # [B]

    # back through L2 normalization: d(x/|x|) = (gv - (gv.xhat) xhat)/|x|
    def unnorm(gv, xhat, inv):
        return (gv - jnp.sum(gv * xhat, -1, keepdims=True) * xhat) * inv

    def emit(k, g_a):
        nk, inv_k = read_k(k)
        d = jnp.sum(a * nk, axis=-1) * inv_t
        ck = (jnp.exp(d - m) / z * g * inv_t)[:, None]     # [B, 1]
        dn_ref[:, pl.ds(k, 1)] = unnorm(ck * a, nk, inv_k)[:, None, :]
        return g_a + ck * nk

    g_a = jax.lax.fori_loop(0, NEG, emit, coef_p[:, None] * p)
    da_ref[:] = unnorm(g_a, a, inv_an)
    dp_ref[:] = unnorm(coef_p[:, None] * a, p, inv_pn)


def _block_specs(A, NEG, E, B):
    anchor2d = pl.BlockSpec((B, E), lambda i: (i, 0), memory_space=pltpu.VMEM)
    neg3d = pl.BlockSpec((B, NEG, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # per-anchor vectors ride as [A, 1] (2-D: 1-D operands hit XLA/Mosaic
    # tile-layout mismatches)
    vec = pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec(memory_space=pltpu.SMEM)
    return anchor2d, neg3d, vec, scalar


def _per_anchor_loss(a, p, n, valid, t, interpret):
    A, E = a.shape
    NEG = n.shape[1]
    B = min(128, A)  # [B,NEG,E] f32 must fit VMEM twice (pipelining)
    assert A % B == 0, "anchor count must be a multiple of the block"
    a2d, n3d, vec, scal = _block_specs(A, NEG, E, B)
    per = pl.pallas_call(
        _fwd_kernel,
        grid=(A // B,),
        in_specs=[a2d, a2d, n3d, vec, scal],
        out_specs=vec,
        out_shape=jax.ShapeDtypeStruct((A, 1), jnp.float32),
        interpret=interpret,
    )(a, p, n, valid.astype(jnp.float32)[:, None], jnp.asarray([t], jnp.float32))
    return per[:, 0]


def _per_anchor_grads(a, p, n, valid, t, g, interpret):
    A, E = a.shape
    NEG = n.shape[1]
    # bwd streams the [B,NEG,E] negatives both IN and OUT (dn) — half the
    # forward's block keeps the double-buffered working set under VMEM
    B = min(64, A)
    a2d, n3d, vec, scal = _block_specs(A, NEG, E, B)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(A // B,),
        in_specs=[a2d, a2d, n3d, vec, scal, vec],
        out_specs=(a2d, a2d, n3d),
        out_shape=(
            jax.ShapeDtypeStruct((A, E), jnp.float32),
            jax.ShapeDtypeStruct((A, E), jnp.float32),
            jax.ShapeDtypeStruct((A, NEG, E), jnp.float32),
        ),
        interpret=interpret,
    )(a, p, n, valid.astype(jnp.float32)[:, None], jnp.asarray([t], jnp.float32),
      g[:, None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def info_nce_loss_fused(
    anchor_embed: jax.Array,    # [A, E]
    positive_embed: jax.Array,  # [A, E]
    negative_embed: jax.Array,  # [A, NEG, E]
    anchor_valid: jax.Array,    # [A] bool
    temperature: float = 0.07,
    interpret: bool = False,
) -> jax.Array:
    """Masked-mean InfoNCE (label 0 = positive), fused on TPU."""
    per = _per_anchor_loss(
        anchor_embed, positive_embed, negative_embed, anchor_valid,
        temperature, interpret,
    )
    w = anchor_valid.astype(jnp.float32)
    return jnp.sum(per) / jnp.maximum(jnp.sum(w), 1.0)


def _fused_fwd(a, p, n, valid, temperature, interpret):
    loss = info_nce_loss_fused(a, p, n, valid, temperature, interpret)
    return loss, (a, p, n, valid)


def _fused_bwd(temperature, interpret, res, g):
    a, p, n, valid = res
    w = valid.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    g_per = jnp.full((a.shape[0],), g / denom, jnp.float32)
    da, dp, dn = _per_anchor_grads(a, p, n, valid, temperature, g_per, interpret)
    return (da.astype(a.dtype), dp.astype(p.dtype), dn.astype(n.dtype), None)


info_nce_loss_fused.defvjp(_fused_fwd, _fused_bwd)
