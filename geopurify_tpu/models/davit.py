"""DaViT backbone — dual (spatial window + channel group) attention.

TPU-native flax rebuild of the reference's DaViT
(reference third_party/X-Decoder/xdecoder/modeling/vision/backbone/davit.py:
23-560, one of the alternative X-Decoder backbones): 4 stages of dual-block
pairs, each pair = SpatialBlock (depthwise-conv positional residual + pre-norm
window attention + conv + pre-norm MLP) followed by ChannelBlock (same shape
but GROUP CHANNEL attention — attention computed over the channel dim with
token-count scaling, davit.py:155-177). Conv patch embeds (7/4 stem then 2/2)
downsample between stages; per-output LayerNorms emit res2..res5.

NHWC throughout; inference-only (drop-path = identity).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _gelu_exact(x):
    """Exact (erf) GELU — torch nn.GELU default; flax nn.gelu defaults to
    the tanh approximation (~1e-3 abs divergence, torch-oracle-pinned)."""
    return jax.nn.gelu(x, approximate=False)



class DWConv(nn.Module):
    """Depthwise 3x3 conv residual (the CPE, davit.py:76-104)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B,H,W,C]
        return x + nn.Conv(
            self.dim, (3, 3), padding="SAME", feature_group_count=self.dim,
            dtype=self.dtype, name="dw",
        )(x)


class ChannelAttention(nn.Module):
    """Group channel attention: softmax over channels, 1/sqrt(N) scaling
    (davit.py:155-177)."""

    dim: int
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, N, C]
        B, N, C = x.shape
        g = self.groups
        d = C // g
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, g, d).transpose(2, 0, 3, 1, 4)  # [3,B,g,N,d]
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * (N ** -0.5)
        attn = jnp.einsum(
            "bgnd,bgne->bgde", q, k, preferred_element_type=jnp.float32
        )                                                   # [B,g,d,d]
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bgde,bgne->bgnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class WindowAttention(nn.Module):
    """Non-shifted window MHA (davit.py:227-285)."""

    dim: int
    num_heads: int
    window_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B,H,W,C]
        B, H, W, C = x.shape
        ws = self.window_size
        ph = (-H) % ws
        pw = (-W) % ws
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        Hp, Wp = H + ph, W + pw
        nh, nw = Hp // ws, Wp // ws
        win = xp.reshape(B, nh, ws, nw, ws, C).transpose(0, 1, 3, 2, 4, 5)
        win = win.reshape(B * nh * nw, ws * ws, C)

        h = self.num_heads
        d = C // h
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(win)
        qkv = qkv.reshape(-1, ws * ws, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (d ** -0.5), qkv[1], qkv[2]
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(-1, ws * ws, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)

        out = out.reshape(B, nh, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(B, Hp, Wp, C)
        return out[:, :H, :W]


class DualBlock(nn.Module):
    """One (spatial, channel) pair (davit.py:179-211, 287-318)."""

    dim: int
    num_heads: int
    groups: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    def _mlp(self, x, name):
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name=f"{name}_fc1")(x)
        h = _gelu_exact(h)
        return nn.Dense(self.dim, dtype=self.dtype, name=f"{name}_fc2")(h)

    @nn.compact
    def __call__(self, x):  # [B,H,W,C]
        B, H, W, C = x.shape
        # spatial block
        x = DWConv(self.dim, self.dtype, name="s_cpe1")(x)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="s_norm1")(x).astype(self.dtype)
        x = x + WindowAttention(self.dim, self.num_heads, self.window_size,
                                self.dtype, name="s_attn")(h)
        x = DWConv(self.dim, self.dtype, name="s_cpe2")(x)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="s_norm2")(x).astype(self.dtype)
        x = x + self._mlp(h, "s_mlp")
        # channel block
        x = DWConv(self.dim, self.dtype, name="c_cpe1")(x)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="c_norm1")(x).astype(self.dtype)
        flat = h.reshape(B, H * W, C)
        x = x + ChannelAttention(
            self.dim, self.groups, self.dtype, name="c_attn"
        )(flat).reshape(B, H, W, C)
        x = DWConv(self.dim, self.dtype, name="c_cpe2")(x)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="c_norm2")(x).astype(self.dtype)
        x = x + self._mlp(h, "c_mlp")
        return x


class DaViT(nn.Module):
    """4-stage DaViT emitting {"res2".."res5"} (davit.py:320-560).

    Patch-embed geometry and norm placement follow the release configs
    (davitd5_unicl_lang_v1.yaml:59-71): 7/4/3 stem then 3/2/1 inter-stage
    convs, with stage-0 POST-norm and stages 1-3 PRE-norm over the incoming
    channels (ConvEmbed.pre_norm, davit.py:106-150); stage outputs carry NO
    extra LayerNorm (DaViT.forward_features, davit.py:519-536 — the
    ``self.norms`` in the upstream repo is commented out). Both were caught
    by the torch-oracle parity run (geopurify_tpu/parity)."""

    embed_dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (1, 1, 3, 1)      # dual-block pairs per stage
    num_heads: Sequence[int] = (3, 6, 12, 24)
    num_groups: Sequence[int] = (3, 6, 12, 24)
    patch_size: Sequence[int] = (7, 3, 3, 3)
    patch_stride: Sequence[int] = (4, 2, 2, 2)
    patch_padding: Sequence[int] = (3, 1, 1, 1)
    patch_prenorm: Sequence[bool] = (False, True, True, True)
    window_size: int = 7
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:  # [B,H,W,3]
        outs: Dict[str, jax.Array] = {}
        for s in range(4):
            if self.patch_prenorm[s] and s > 0:
                # pre-norm normalizes the INCOMING channels before the conv
                # (ConvEmbed, davit.py:134-137; never applies to the raw
                # image — the reference gates on the flattened-token shape)
                x = nn.LayerNorm(
                    epsilon=1e-5, dtype=jnp.float32, name=f"embed_norm{s}"
                )(x).astype(self.dtype)
            k, st, p = (self.patch_size[s], self.patch_stride[s],
                        self.patch_padding[s])
            x = nn.Conv(self.embed_dims[s], (k, k), strides=(st, st),
                        padding=((p, p), (p, p)), dtype=self.dtype,
                        name=f"patch_embed{s}")(x)
            if not self.patch_prenorm[s]:
                x = nn.LayerNorm(
                    epsilon=1e-5, dtype=jnp.float32, name=f"embed_norm{s}"
                )(x).astype(self.dtype)
            for b in range(self.depths[s]):
                x = DualBlock(
                    self.embed_dims[s], self.num_heads[s], self.num_groups[s],
                    self.window_size, self.mlp_ratio, self.dtype,
                    name=f"stage{s}_block{b}",
                )(x)
            outs[f"res{s + 2}"] = x
        return outs
