"""Shared transformer / conv building blocks (NHWC, bf16-friendly).

Covers the primitives the reference composes from torch.nn + detectron2:
sine position embeddings, DETR-style pre/post-norm attention layers, MLPs,
GroupNorm'd convs. All modules take an optional ``dtype`` for bf16 compute
with f32 params.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def position_embedding_sine(
    h: int, w: int, num_pos_feats: int, temperature: float = 10000.0,
    normalize: bool = True, scale: Optional[float] = None, dtype=jnp.float32,
) -> jax.Array:
    """2D sine positional encoding, [H, W, 2*num_pos_feats] (DETR PositionEmbeddingSine)."""
    if scale is None:
        scale = 2 * math.pi
    y_embed = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=0)
    x_embed = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=1)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)


def gelu_poly(x):
    """GELU with erf via the Abramowitz & Stegun 7.1.26 rational polynomial
    (|erf err| <= 1.5e-7). Measured bf16 equivalence
    (tests/test_fast_gelu.py): in the numerically relevant range
    (|gelu| > 1e-3) the bf16 outputs match the exact-erf gelu except
    rounding-boundary single ulps on <0.05% of points; the deep negative
    tail differs only below 1e-6 absolute (the 1-(1-e) cancellation).
    Throughput option for bf16 compute paths; the f32 parity path keeps
    the exact erf."""
    x32 = x.astype(jnp.float32)
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    z = jnp.abs(x32) * np.float32(1.0 / np.sqrt(2.0))
    t = 1.0 / (1.0 + p * z)
    e = (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(-z * z)
    erf = jnp.sign(x32) * (1.0 - e)
    return (0.5 * x32 * (1.0 + erf)).astype(x.dtype)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    # torch nn.GELU default = exact erf (flax nn.gelu defaults to tanh-approx)
    act: Callable = functools.partial(nn.gelu, approximate=False)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class MLPHead(nn.Module):
    """num_layers-deep ReLU MLP (the reference's MLP prediction head)."""

    hidden_dim: int
    out_dim: int
    num_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"layers{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name=f"layers{self.num_layers - 1}")(x)


class MultiHeadAttention(nn.Module):
    """Explicit MHA with additive or boolean masks.

    Boolean mask semantics follow torch: True = BLOCKED. Softmax runs in f32.
    """

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask: Optional[jax.Array] = None):
        """q [B,Lq,C], k/v [B,Lk,C]; mask broadcastable to [B,H,Lq,Lk] bool (True=block)."""
        d = self.dim // self.num_heads
        wq = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(q)
        wk = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(k)
        wv = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(v)

        def split(x):
            b, l, _ = x.shape
            return x.reshape(b, l, self.num_heads, d).transpose(0, 2, 1, 3)

        qh, kh, vh = split(wq), split(wk), split(wv)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) / math.sqrt(d)
        if mask is not None:
            logits = jnp.where(mask, -jnp.inf, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        # fully-masked rows produce NaN; zero them (torch returns NaN too but the
        # reference unmasks such rows upstream — we stay safe regardless)
        attn = jnp.nan_to_num(attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(self.dtype), vh)
        out = out.transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class SelfAttentionLayer(nn.Module):
    """DETR-style self-attention layer; pos added to q,k only (interface/modules)."""

    dim: int
    num_heads: int
    pre_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos=None, tgt_mask=None):
        def attn_block(x):
            q = k = x if query_pos is None else x + query_pos
            return MultiHeadAttention(self.dim, self.num_heads, self.dtype, name="self_attn")(
                q, k, x, mask=tgt_mask
            )

        norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")
        if self.pre_norm:
            return tgt + attn_block(norm(tgt))
        return norm(tgt + attn_block(tgt)).astype(self.dtype)


class CrossAttentionLayer(nn.Module):
    dim: int
    num_heads: int
    pre_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, memory_mask=None, pos=None, query_pos=None):
        def attn_block(x):
            q = x if query_pos is None else x + query_pos
            k = memory if pos is None else memory + pos
            return MultiHeadAttention(self.dim, self.num_heads, self.dtype, name="multihead_attn")(
                q, k, memory, mask=memory_mask
            )

        norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")
        if self.pre_norm:
            return tgt + attn_block(norm(tgt))
        return norm(tgt + attn_block(tgt)).astype(self.dtype)


class FFNLayer(nn.Module):
    dim: int
    hidden_dim: int
    pre_norm: bool = False
    act: Callable = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def ffn(y):
            y = nn.Dense(self.hidden_dim, dtype=self.dtype, name="linear1")(y)
            y = self.act(y)
            return nn.Dense(self.dim, dtype=self.dtype, name="linear2")(y)

        norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")
        if self.pre_norm:
            return x + ffn(norm(x))
        return norm(x + ffn(x)).astype(self.dtype)


class TransformerEncoderLayer(nn.Module):
    """Post-norm DETR encoder layer: q=k=src+pos, v=src, then FFN."""

    dim: int
    num_heads: int
    hidden_dim: int
    pre_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos=None):
        def attn_block(x):
            q = k = x if pos is None else x + pos
            return MultiHeadAttention(self.dim, self.num_heads, self.dtype, name="self_attn")(q, k, x)

        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")

        def ffn(y):
            y = nn.Dense(self.hidden_dim, dtype=self.dtype, name="linear1")(y)
            y = nn.relu(y)
            return nn.Dense(self.dim, dtype=self.dtype, name="linear2")(y)

        if self.pre_norm:
            src = src + attn_block(norm1(src))
            src = src + ffn(norm2(src))
            return src
        src = norm1(src + attn_block(src)).astype(self.dtype)
        src = norm2(src + ffn(src)).astype(self.dtype)
        return src


class ConvGN(nn.Module):
    """Conv2D (NHWC) + optional GroupNorm(32) + optional ReLU — detectron2's Conv2d."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    use_gn: bool = True
    relu: bool = False
    use_bias: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bias = (not self.use_gn) if self.use_bias is None else self.use_bias
        x = nn.Conv(
            self.features, self.kernel, strides=self.stride, padding="SAME",
            use_bias=bias, dtype=self.dtype, name="conv",
        )(x)
        if self.use_gn:
            groups = math.gcd(32, self.features)  # 32 in production; tiny test dims divide down
            x = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        if self.relu:
            x = nn.relu(x)
        return x


def resize_nearest(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """NHWC nearest-neighbor resize with TORCH semantics: src index =
    floor(i * in/out) (truncation). jax.image.resize('nearest') maps through
    pixel centers (floor((i+0.5)*in/out)) and diverges at non-integer scales
    — caught by the full-size torch-oracle parity run on the FPN's odd-sized
    upsample targets (e.g. 60x81 -> 121x162)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    ri = (jnp.arange(oh) * h // oh).astype(jnp.int32)
    ci = (jnp.arange(ow) * w // ow).astype(jnp.int32)
    return x[:, ri][:, :, ci]


def resize_bilinear(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="bilinear")


def _torch_cubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Cubic convolution kernel. torch's ANTIALIAS bicubic uses the PIL
    convention a=-0.5 (oracle-verified: a=-0.75 is only the non-AA path)."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    inner = (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0
    outer = a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a
    return np.where(ax <= 1.0, inner, np.where(ax < 2.0, outer, 0.0))


@functools.lru_cache(maxsize=64)
def _aa_resize_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] weights of torch's _upsample_bicubic2d_aa along one axis.

    ATen's separable antialias path (PIL-style; UpSampleKernel.h): source
    center = scale*(i+0.5); kernel a=-0.5 stretched by max(scale, 1) (only
    widens on downscale); window clipped to bounds and renormalized — which is
    also how the borders differ from classic 4-tap + clamp. Verified exact
    against torch for up- AND downscale (tests/test_torch_parity.py).
    """
    scale = in_size / out_size
    support_scale = max(scale, 1.0)
    support = 2.0 * support_scale
    W = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = scale * (i + 0.5)
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), in_size)
        j = np.arange(lo, hi)
        w = _torch_cubic((j - center + 0.5) / support_scale)
        s = w.sum()
        if s != 0:
            w = w / s
        W[i, lo:hi] = w
    return W.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _bilinear_noaa_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] weights of torch F.interpolate(mode='bilinear',
    align_corners=False, antialias=False) along one axis: source position
    (i + 0.5) * in/out - 0.5, TWO taps with border clamping — NO kernel
    widening on downscale (unlike the antialias path and unlike
    jax.image.resize, which always antialiases when downscaling)."""
    scale = in_size / out_size
    W = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        src = max((i + 0.5) * scale - 0.5, 0.0)
        j0 = min(int(src), in_size - 1)
        j1 = min(j0 + 1, in_size - 1)
        d = src - j0
        W[i, j0] += 1.0 - d
        W[i, j1] += d
    return W.astype(np.float32)


def resize_bilinear_torch(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize exact to torch F.interpolate(mode='bilinear',
    align_corners=False) WITHOUT antialias — the SEEM decoder's attn-mask
    resize (seem_v0.py:371, attention_data_struct_seemv0.py:168). Same
    MXU-matmul formulation as resize_bicubic_antialias."""
    b, h, w, c = x.shape
    Wh = jnp.asarray(_bilinear_noaa_weights(h, out_hw[0]))
    Ww = jnp.asarray(_bilinear_noaa_weights(w, out_hw[1]))
    y = jnp.einsum(
        "Hh,bhwc->bHwc", Wh, x.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    y = jnp.einsum("Ww,bhwc->bhWc", Ww, y, preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


@functools.lru_cache(maxsize=64)
def _aa_resize_taps(in_size: int, out_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Compact per-output-row taps of ``_aa_resize_weights``: (tap_lo [out]
    int32, tap_w [out, T] float32). Row i of the dense matrix is nonzero only
    on columns [lo_i, hi_i) (ATen's clipped window); this extracts exactly
    that slice from the SAME cached matrix, so ``sum_t tap_w[i, t] *
    x[tap_lo[i] + t]`` equals the dense matmul bit-for-bit per term. T is the
    static max window width (4 for any upscale; wider when downscaling).

    Used by the point-evaluated mask lift (models/lift.py): interpolating the
    [Q, h, w] masks only AT the Pv view-point pixels replaces the full
    [Q, H, W] resize + argmax grid, whose result was only ever consumed at
    those pixels."""
    W = _aa_resize_weights(in_size, out_size)
    scale = in_size / out_size
    support = 2.0 * max(scale, 1.0)
    los = np.zeros((out_size,), np.int32)
    his = np.zeros((out_size,), np.int32)
    for i in range(out_size):
        center = scale * (i + 0.5)
        los[i] = max(int(center - support + 0.5), 0)
        his[i] = min(int(center + support + 0.5), in_size)
    T = int(np.max(his - los))
    tap_w = np.zeros((out_size, T), np.float32)
    for i in range(out_size):
        n = his[i] - los[i]
        tap_w[i, :n] = W[i, los[i] : his[i]]
    # clamp lo so lo+T-1 stays in bounds (zero-weight tail taps must still
    # gather in-bounds rows); the weights were extracted at the unclamped lo,
    # so shift them to match
    lo_c = np.minimum(los, max(in_size - T, 0))
    for i in range(out_size):
        d = los[i] - lo_c[i]
        if d:
            tap_w[i] = np.concatenate([np.zeros(d, np.float32), tap_w[i, :-d]])
    return lo_c.astype(np.int32), tap_w


def resize_bicubic_antialias(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bicubic resize, exact to the reference's F.interpolate(mode='bicubic',
    align_corners=False, antialias=True) (affinity_module.py:527-533,
    interface/xdecoder.py:459) — torch-oracle-pinned in tests/test_torch_parity.

    TPU-native formulation: the separable resample is two dense matmuls with
    host-precomputed [out, in] weight matrices (static shapes, cached), which
    ride the MXU instead of gather pipelines.
    """
    b, h, w, c = x.shape
    Wh = jnp.asarray(_aa_resize_weights(h, out_hw[0]))
    Ww = jnp.asarray(_aa_resize_weights(w, out_hw[1]))
    y = jnp.einsum(
        "Hh,bhwc->bHwc", Wh, x.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    y = jnp.einsum(
        "Ww,bhwc->bhWc", Ww, y, preferred_element_type=jnp.float32
    )
    return y.astype(x.dtype)
