"""Multi-scale deformable attention (Deformable-DETR style) in pure JAX.

The reference vendors a CUDA im2col kernel for this op plus a pure-PyTorch
fallback (reference third_party/X-Decoder/xdecoder/modeling/vision/encoder/
ops/*, ms_deform_attn_func.py:52 ``ms_deform_attn_core_pytorch``) — used only
by the deformable pixel-decoder variant (not on the focall config's path,
SURVEY §2.3). Provided here for component completeness: on TPU the bilinear
sampling is a fused gather + lerp, which XLA maps well without a custom
kernel; autodiff supplies the backward pass the CUDA code hand-writes.

Semantics (matching the reference fallback):
- ``value``: [B, L, H, D] flattened multi-level feature values
  (L = sum of H_l * W_l over levels), H heads, D head dim;
- ``spatial_shapes``: static tuple of (H_l, W_l) per level;
- ``sampling_locations``: [B, Q, H, levels, P, 2] normalized to [0, 1]
  (x, y), grid_sample align_corners=False, zero padding;
- ``attention_weights``: [B, Q, H, levels, P], softmaxed over (levels, P);
- output [B, Q, H * D].
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def bilinear_sample(value: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Sample ``value`` [Hl, Wl, C] at continuous pixel coords (x, y) [N];
    zero padding outside (grid_sample align_corners=False, padding='zeros').
    Returns [N, C]."""
    Hl, Wl = value.shape[:2]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[:, None]
    dy = (y - y0)[:, None]

    def tap(xi, yi):
        inside = (xi >= 0) & (xi < Wl) & (yi >= 0) & (yi < Hl)
        v = value[jnp.clip(yi, 0, Hl - 1), jnp.clip(xi, 0, Wl - 1)]
        return jnp.where(inside[:, None], v, 0.0)

    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    top = v00 * (1 - dx) + v01 * dx
    bot = v10 * (1 - dx) + v11 * dx
    return top * (1 - dy) + bot * dy


@partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn(
    value: jax.Array,                  # [B, L, H, D]
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jax.Array,     # [B, Q, H, levels, P, 2] in [0,1]
    attention_weights: jax.Array,      # [B, Q, H, levels, P]
) -> jax.Array:
    B, L, H, D = value.shape
    _, Q, _, n_levels, P, _ = sampling_locations.shape
    assert n_levels == len(spatial_shapes)

    offsets = [0]
    for (hl, wl) in spatial_shapes:
        offsets.append(offsets[-1] + hl * wl)

    def per_batch(value_b, loc_b, w_b):
        out = jnp.zeros((Q, H, D), jnp.float32)
        for lvl, (hl, wl) in enumerate(spatial_shapes):
            lvl_v = value_b[offsets[lvl]: offsets[lvl + 1]].astype(jnp.float32)
            for h in range(H):
                v = lvl_v.reshape(hl, wl, H, D)[:, :, h]        # [hl, wl, D]
                for p in range(P):
                    x = loc_b[:, h, lvl, p, 0] * wl - 0.5       # [Q]
                    y = loc_b[:, h, lvl, p, 1] * hl - 0.5
                    s = bilinear_sample(v, x, y)                 # [Q, D]
                    out = out.at[:, h].add(s * w_b[:, h, lvl, p][:, None])
        return out

    out = jax.vmap(per_batch)(
        value, sampling_locations.astype(jnp.float32),
        attention_weights.astype(jnp.float32),
    )
    return out.reshape(B, Q, H * D).astype(value.dtype)
