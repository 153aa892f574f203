"""Plain ViT backbone (ViTDet/SAM-style) with a SimpleFPN neck.

TPU-native flax rebuild of the reference's ViT backbone
(reference third_party/X-Decoder/xdecoder/modeling/vision/backbone/vit.py:
26-577, one of the alternative X-Decoder backbones): 16x16 patch embed,
absolute position embedding (bilinear-resized to the input grid), transformer
blocks with WINDOWED attention except at a few global-attention indices, and
decomposed relative position embeddings added to attention logits
(vit.py:301-371); a SimpleFPN neck (deconv up / conv down, vit.py:406-460)
emits res2..res5 from the single stride-16 map.

NHWC; inference-only.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _gelu_exact(x):
    """Exact (erf) GELU — torch nn.GELU default; flax nn.gelu defaults to
    the tanh approximation (~1e-3 abs divergence, torch-oracle-pinned)."""
    return jax.nn.gelu(x, approximate=False)



def _rel_pos_bias(rel_pos: jax.Array, q_size: int, k_size: int) -> jax.Array:
    """[q_size, k_size, C] decomposed relative positions (get_rel_pos,
    vit.py:301-331); assumes q_size == k_size (the backbone's case). When the
    table length differs from 2*size-1 (pretrain-grid tables applied to a
    different input grid) it is linearly resized first, matching torch
    F.interpolate(mode='linear', align_corners=False) — half-pixel centers,
    which jax.image.resize('linear') also uses."""
    need = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != need:
        # antialias=False: torch F.interpolate(linear) does NOT widen the
        # kernel on downscale (pretrain table longer than the runtime grid
        # needs), while jax.image.resize antialiases by default
        rel_pos = jax.image.resize(
            rel_pos.astype(jnp.float32), (need, rel_pos.shape[1]),
            method="linear", antialias=False,
        )
    coords = jnp.arange(q_size)[:, None] - jnp.arange(k_size)[None, :]
    idx = coords + (k_size - 1)
    return rel_pos[idx]


class ViTAttention(nn.Module):
    """MHA with decomposed relative position bias (vit.py:194-250)."""

    dim: int
    num_heads: int
    input_size: Tuple[int, int]  # rel-pos TABLE geometry (pretrain grid or
    #                              window size, vit.py:229-231); runtime grids
    #                              that differ ride get_rel_pos interpolation
    use_rel_pos: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        B, H, W, C = x.shape
        h = self.num_heads
        d = C // h
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x.reshape(B, H * W, C))
        qkv = qkv.reshape(B, H * W, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", q * (d ** -0.5), k,
            preferred_element_type=jnp.float32,
        )
        if self.use_rel_pos:
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, d)
            )
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, d)
            )
            rh = _rel_pos_bias(rel_h, H, H).astype(jnp.float32)   # [H, H, d]
            rw = _rel_pos_bias(rel_w, W, W).astype(jnp.float32)   # [W, W, d]
            # the reference feeds the UNSCALED q into the rel-pos einsums
            # (vit.py:240-245: attn uses q*scale, add_decomposed_rel_pos
            # receives the original q) — torch-oracle-pinned
            qr = q.astype(jnp.float32).reshape(B, h, H, W, d)
            bias_h = jnp.einsum("bhywd,ykd->bhywk", qr, rh)       # [B,h,H,W,H]
            bias_w = jnp.einsum("bhywd,wkd->bhywk", qr, rw)       # [B,h,H,W,W]
            attn = attn.reshape(B, h, H, W, H, W)
            attn = attn + bias_h[..., :, None] + bias_w[..., None, :]
            attn = attn.reshape(B, h, H * W, H * W)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    """Pre-norm block; windowed unless global (vit.py:128-192)."""

    dim: int
    num_heads: int
    window_size: int = 14       # 0 = global attention
    input_size: Tuple[int, int] = (64, 64)
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B,H,W,C]
        B, H, W, C = x.shape
        shortcut = x
        # eps=1e-6: D2ViT builds with norm_layer=partial(LayerNorm, eps=1e-6)
        # (vit.py:497) — torch-oracle-pinned
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        ws = self.window_size
        if ws > 0:
            ph, pw = (-H) % ws, (-W) % ws
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            Hp, Wp = H + ph, W + pw
            nh, nw = Hp // ws, Wp // ws
            x = x.reshape(B, nh, ws, nw, ws, C).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(B * nh * nw, ws, ws, C)
            size = (ws, ws)
        else:
            # global attention: the rel-pos table is sized by the PRETRAIN
            # grid (vit.py:92, input_size=img//patch) and interpolated to the
            # runtime grid inside _rel_pos_bias
            size = self.input_size
        x = ViTAttention(
            self.dim, self.num_heads, size, dtype=self.dtype, name="attn"
        )(x)
        if ws > 0:
            x = x.reshape(B, nh, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(B, Hp, Wp, C)[:, :H, :W]
        x = shortcut + x
        h2 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h2 = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(h2)
        h2 = _gelu_exact(h2)
        h2 = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(h2)
        return x + h2


class SimpleFPN(nn.Module):
    """Deconv/conv neck: one stride-16 map -> res2..res5 (vit.py:406-460)."""

    in_dim: int = 768
    out_dims: Sequence[int] = (128, 256, 512, 1024)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:  # [B, H16, W16, C]
        def gn(y, name):
            return nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=jnp.float32, name=name)(y).astype(self.dtype)

        c4 = max(self.out_dims[0] * 2, self.in_dim // 2)
        y = nn.ConvTranspose(c4, (2, 2), strides=(2, 2), dtype=self.dtype,
                             name="d4_up1")(x)
        y = _gelu_exact(gn(y, "d4_gn1"))
        y = nn.ConvTranspose(c4 // 2, (2, 2), strides=(2, 2), dtype=self.dtype,
                             name="d4_up2")(y)
        y = gn(y, "d4_gn2")
        y = nn.Conv(self.out_dims[0], (1, 1), dtype=self.dtype, name="d4_out")(y)
        res2 = _gelu_exact(gn(y, "d4_gn3"))

        c8 = max(self.out_dims[1], self.in_dim // 2)
        y = nn.ConvTranspose(c8, (2, 2), strides=(2, 2), dtype=self.dtype,
                             name="d8_up")(x)
        y = gn(y, "d8_gn1")
        y = nn.Conv(self.out_dims[1], (1, 1), dtype=self.dtype, name="d8_out")(y)
        res3 = _gelu_exact(gn(y, "d8_gn2"))

        y = nn.Conv(self.out_dims[2], (1, 1), dtype=self.dtype, name="d16_out")(x)
        res4 = _gelu_exact(gn(y, "d16_gn"))

        c32 = max(self.out_dims[3], self.in_dim * 2)
        y = nn.Conv(c32, (2, 2), strides=(2, 2), dtype=self.dtype, name="d32_down")(x)
        y = gn(y, "d32_gn1")
        y = nn.Conv(self.out_dims[3], (1, 1), dtype=self.dtype, name="d32_out")(y)
        res5 = _gelu_exact(gn(y, "d32_gn2"))
        return {"res2": res2, "res3": res3, "res4": res4, "res5": res5}


class ViTBackbone(nn.Module):
    """Patch embed + blocks (+ abs/rel pos) + SimpleFPN (vit.py:26-126, 462-577)."""

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    out_dims: Sequence[int] = (128, 256, 512, 1024)
    use_rel_pos: bool = True
    pretrain_grid: int = 64     # abs pos table side (1024/16)
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:  # [B,H,W,3]
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embed")(x)
        B, H, W, C = x.shape
        pos = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (self.pretrain_grid, self.pretrain_grid, self.embed_dim),
        )
        pos = jax.image.resize(pos, (H, W, C), method="bilinear")
        x = x + pos[None].astype(self.dtype)
        for i in range(self.depth):
            ws = 0 if i in self.global_attn_indexes else self.window_size
            x = ViTBlock(
                self.embed_dim, self.num_heads, ws,
                (self.pretrain_grid, self.pretrain_grid), self.mlp_ratio,
                self.dtype, name=f"block{i}",
            )(x)
        return SimpleFPN(self.embed_dim, tuple(self.out_dims), self.dtype,
                         name="neck")(x)
