"""Multi-scale deformable-attention pixel decoder (Mask2Former-style).

TPU-native assembly of the reference's MSDeformAttnPixelDecoder
(reference third_party/X-Decoder/xdecoder/modeling/vision/encoder/
transformer_encoder_deform.py:140-377) over our pure-JAX deformable-attention
op (ops/ms_deform_attn.py ≙ the CUDA im2col kernel + torch fallback):
- the 3 lowest-resolution backbone levels (res3..res5) are 1x1-projected
  (+GN), flattened with level embeddings, and run through ``num_enc_layers``
  deformable self-attention encoder layers (per-level reference points,
  learned sampling offsets, softmaxed attention over levels x points);
- the remaining finer level (res2) joins through an FPN lateral + output
  conv, and a final 3x3 conv emits the stride-4 mask features.

The focall config ships the FPN encoder (transformer_encoder_fpn) — this
module is the alternative encoder, selected by ``xdecoder.pixel_decoder =
"deform"``; its output contract matches TransformerEncoderPixelDecoder.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from geopurify_tpu.models.layers import (
    ConvGN,
    position_embedding_sine,
    resize_bilinear,
)
from geopurify_tpu.ops.ms_deform_attn import ms_deform_attn

Dtype = Any


def make_reference_points(
    spatial_shapes: Tuple[Tuple[int, int], ...]
) -> jax.Array:
    """[L, n_levels, 2] normalized (x, y) center coords per flattened position,
    broadcast over target levels (transformer_encoder_deform.py's
    get_reference_points)."""
    pts = []
    for (hl, wl) in spatial_shapes:
        ys = (jnp.arange(hl, dtype=jnp.float32) + 0.5) / hl
        xs = (jnp.arange(wl, dtype=jnp.float32) + 0.5) / wl
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    ref = jnp.concatenate(pts, axis=0)                      # [L, 2]
    return jnp.broadcast_to(ref[:, None, :], (ref.shape[0], len(spatial_shapes), 2))


class MSDeformAttnEncoderLayer(nn.Module):
    d_model: int
    n_heads: int = 8
    n_levels: int = 3
    n_points: int = 4
    d_ffn: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, ref_points, spatial_shapes):
        """src [B, L, C]; pos [B, L, C]; ref_points [L, n_levels, 2]."""
        B, L, C = src.shape
        H, P, NL = self.n_heads, self.n_points, self.n_levels
        D = C // H
        q = (src + pos).astype(self.dtype)

        value = nn.Dense(C, dtype=self.dtype, name="value_proj")(src)
        value = value.reshape(B, L, H, D)
        offsets = nn.Dense(
            H * NL * P * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="sampling_offsets",
        )(q).reshape(B, L, H, NL, P, 2).astype(jnp.float32)
        attn = nn.Dense(
            H * NL * P, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="attention_weights",
        )(q).reshape(B, L, H, NL * P)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn = attn.reshape(B, L, H, NL, P)

        wh = jnp.asarray([(wl, hl) for (hl, wl) in spatial_shapes], jnp.float32)
        loc = ref_points[None, :, None, :, None, :] + offsets / wh[None, None, None, :, None, :]
        out = ms_deform_attn(value, spatial_shapes, loc, attn)  # [B, L, C]
        src = src + nn.Dense(C, dtype=self.dtype, name="output_proj")(out.astype(self.dtype))
        src = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(src).astype(self.dtype)

        h = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(src)
        h = nn.relu(h)
        h = nn.Dense(C, dtype=self.dtype, name="linear2")(h)
        src = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(src + h).astype(self.dtype)
        return src


class MSDeformAttnPixelDecoder(nn.Module):
    """Deformable encoder over res3..res5 + FPN merge of res2.

    Output contract matches TransformerEncoderPixelDecoder:
    (mask_features [B, H4, W4, mask_dim], transformer_features (res5 map),
    multi_scale[num_scales] lowest-res first).
    """

    conv_dim: int = 512
    mask_dim: int = 512
    num_enc_layers: int = 6
    num_heads: int = 8
    n_points: int = 4
    dim_feedforward: int = 1024
    num_scales: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, features: Dict[str, jax.Array]
    ) -> Tuple[jax.Array, jax.Array, List[jax.Array]]:
        trans_names = ["res5", "res4", "res3"]          # low-res first
        C = self.conv_dim
        spatial_shapes = tuple(
            (features[n].shape[1], features[n].shape[2]) for n in trans_names
        )
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (len(trans_names), C)
        )

        srcs, poss = [], []
        for i, name in enumerate(trans_names):
            # plain nn.Conv2d (bias=True) + GN — NOT a detectron2 norm-conv
            # (transformer_encoder_deform.py:215-219); torch-oracle-pinned
            x = ConvGN(C, kernel=(1, 1), use_bias=True, dtype=self.dtype,
                       name=f"input_proj{i}")(features[name])
            b, h, w, _ = x.shape
            # level_embed rides the POSITIONAL stream (added to lvl_pos_embed,
            # transformer_encoder_deform.py:76-77) so offsets/weights see it
            # but value_proj does NOT — torch-oracle-pinned (baking it into
            # src was a 0.47-rel divergence)
            pe = position_embedding_sine(h, w, C // 2, dtype=self.dtype)
            pe = jnp.broadcast_to(pe[None], (b, h, w, C)).reshape(b, h * w, C)
            poss.append(pe + level_embed[i][None, None].astype(self.dtype))
            srcs.append(x.reshape(b, h * w, C))
        src = jnp.concatenate(srcs, axis=1)
        pos = jnp.concatenate(poss, axis=1)
        ref = make_reference_points(spatial_shapes)

        for i in range(self.num_enc_layers):
            src = MSDeformAttnEncoderLayer(
                C, self.num_heads, len(trans_names), self.n_points,
                self.dim_feedforward, self.dtype, name=f"encoder_layer{i}",
            )(src, pos, ref, spatial_shapes)

        # split back into per-level maps (low-res first: res5', res4', res3')
        b = src.shape[0]
        outs: List[jax.Array] = []
        off = 0
        for (hl, wl) in spatial_shapes:
            outs.append(src[:, off : off + hl * wl].reshape(b, hl, wl, C))
            off += hl * wl
        transformer_features = outs[0]
        multi_scale = outs[: self.num_scales]

        # FPN merge of the finest backbone level (res2). Unlike the FPN
        # decoder's nearest upsample (transformer_encoder_fpn.py:136), the
        # deform assembly interpolates BILINEARLY (align_corners=False) and
        # its mask_features conv is 1x1, not 3x3
        # (transformer_encoder_deform.py:352-359, 246-254) —
        # torch-oracle-pinned.
        lateral = ConvGN(C, kernel=(1, 1), dtype=self.dtype, name="adapter_1")(
            features["res2"]
        )
        y = lateral + resize_bilinear(outs[-1], lateral.shape[1:3]).astype(
            lateral.dtype
        )
        y = ConvGN(C, relu=True, dtype=self.dtype, name="layer_1")(y)
        mask_features = nn.Conv(
            self.mask_dim, (1, 1), dtype=self.dtype, name="mask_features",
        )(y)
        return mask_features, transformer_features, multi_scale
