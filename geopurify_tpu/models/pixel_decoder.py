"""FPN pixel decoder with a transformer encoder on the coarsest level.

TPU-native rebuild of the reference's TransformerEncoderPixelDecoder
(reference third_party/X-Decoder/xdecoder/modeling/body/encoder/
transformer_encoder_fpn.py:22-322): res5 -> 1x1 input proj -> 6-layer post-norm
transformer encoder with sine PE -> 3x3 GN+ReLU output conv; then FPN laterals
(1x1 conv + GN) with nearest upsampling and 3x3 GN+ReLU output convs down to
res2; a final 3x3 conv produces the stride-4 mask features. The first three
top-down maps (res5', res4', res3') are the decoder's multi-scale memory.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from geopurify_tpu.models.layers import (
    ConvGN,
    TransformerEncoderLayer,
    position_embedding_sine,
    resize_nearest,
)

Dtype = Any


class TransformerEncoderPixelDecoder(nn.Module):
    conv_dim: int = 512
    mask_dim: int = 512
    num_enc_layers: int = 6
    num_heads: int = 8
    dim_feedforward: int = 2048
    pre_norm: bool = False
    num_scales: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, features: Dict[str, jax.Array]
    ) -> Tuple[jax.Array, jax.Array, List[jax.Array]]:
        """features: {"res2".."res5"} NHWC. Returns (mask_features,
        transformer_features, multi_scale_features[3] low-res first)."""
        names = ["res2", "res3", "res4", "res5"]
        multi_scale: List[jax.Array] = []

        # coarsest level: input proj + transformer encoder
        x5 = features["res5"]
        b, h, w, _ = x5.shape
        t = nn.Conv(self.conv_dim, (1, 1), dtype=self.dtype, name="input_proj")(x5)
        pos = position_embedding_sine(h, w, self.conv_dim // 2, dtype=self.dtype)
        pos = jnp.broadcast_to(pos[None], (b, h, w, self.conv_dim)).reshape(b, h * w, -1)
        t = t.reshape(b, h * w, self.conv_dim)
        for i in range(self.num_enc_layers):
            t = TransformerEncoderLayer(
                self.conv_dim, self.num_heads, self.dim_feedforward,
                pre_norm=self.pre_norm, dtype=self.dtype, name=f"encoder_layer{i}",
            )(t, pos=pos)
        transformer_features = t.reshape(b, h, w, self.conv_dim)
        y = ConvGN(
            self.conv_dim, relu=True, dtype=self.dtype, name="layer_4"
        )(transformer_features)
        multi_scale.append(y)

        # FPN top-down over res4, res3, res2
        for idx, name in enumerate(reversed(names[:-1])):  # res4, res3, res2
            level = len(names) - 2 - idx  # 2, 1, 0
            lateral = ConvGN(
                self.conv_dim, kernel=(1, 1), dtype=self.dtype,
                name=f"adapter_{level + 1}",
            )(features[name])
            y = lateral + resize_nearest(y, lateral.shape[1:3])
            y = ConvGN(
                self.conv_dim, relu=True, dtype=self.dtype, name=f"layer_{level + 1}"
            )(y)
            if len(multi_scale) < self.num_scales:
                multi_scale.append(y)

        mask_features = nn.Conv(
            self.mask_dim, (3, 3), padding="SAME", dtype=self.dtype, name="mask_features"
        )(y)
        return mask_features, transformer_features, multi_scale
