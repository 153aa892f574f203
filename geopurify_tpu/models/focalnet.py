"""FocalNet-Large backbone (NHWC, bf16).

TPU-native rebuild of the reference's FocalNet
(reference third_party/X-Decoder/xdecoder/modeling/backbone/focal.py:44-598,
config xdecoder_focall_lang.yaml MODEL.BACKBONE.FOCAL): conv patch embed
(7x7 s4 stem), 4 stages of depths [2,2,18,2] FocalModulation blocks with
focal_level 4 (depthwise kernels 3/5/7/9 + gated global context),
LayerScale + PostLN, conv downsampling (3x3 s2) between stages. Outputs
res2..res5 feature maps at strides 4/8/16/32.

Inference-only: DropPath/Dropout are identity (the teacher is frozen).
"""

from __future__ import annotations

import functools

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from geopurify_tpu.models.layers import Mlp

Dtype = Any


def _gelu(x, fast: bool = False):
    """Exact erf GELU, or the bf16-equivalent A&S-polynomial variant
    (layers.gelu_poly; erf err < 1.5e-7, below bf16 resolution) when
    ``fast`` — the throughput option for the bf16 views path."""
    if fast:
        from geopurify_tpu.models.layers import gelu_poly

        return gelu_poly(x)
    return jax.nn.gelu(x, approximate=False)


def _gelu_exact(x):
    """Exact (erf) GELU — torch nn.GELU default; flax nn.gelu defaults to
    the tanh approximation (~1e-3 abs divergence, torch-oracle-pinned)."""
    return jax.nn.gelu(x, approximate=False)



class PatchEmbed(nn.Module):
    """Conv patch embedding (+LN).

    Overlapped (``use_conv_embed``): stem 7x7/4, else 3x3/2 pad1. The stem pad
    differs between the two reference files — focal.py:310 pads 2,
    focal_dw.py stem pads 3 (``stem_pad``). Non-overlapped: patch_size^2
    non-overlapping conv (stem) / 2x2 s2 (downsample), focal_dw.py:394-402.
    ``pre_norm`` (focal_dw.py:404-420, use_pre_norm) normalizes the INPUT
    channels before the projection instead of the output."""

    embed_dim: int
    is_stem: bool = False
    use_norm: bool = True
    use_conv_embed: bool = True
    patch_size: int = 4
    stem_pad: int = 2
    pre_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B,H,W,C]
        if self.use_conv_embed:
            if self.is_stem:
                p = self.stem_pad
                kernel, stride, pad = (7, 7), (4, 4), ((p, p), (p, p))
            else:
                kernel, stride, pad = (3, 3), (2, 2), ((1, 1), (1, 1))
        else:
            k = self.patch_size if self.is_stem else 2
            kernel, stride, pad = (k, k), (k, k), ((0, 0), (0, 0))
        if self.use_norm and self.pre_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        x = nn.Conv(
            self.embed_dim, kernel, strides=stride, padding=pad,
            dtype=self.dtype, name="proj",
        )(x)
        if self.use_norm and not self.pre_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        return x


class FocalModulation(nn.Module):
    """Hierarchical gated context aggregation (focal.py:44-117)."""

    dim: int
    focal_level: int = 4
    focal_window: int = 3
    focal_factor: int = 2
    scaling_modulator: bool = True
    use_postln_in_modulation: bool = False
    fast_gelu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B,H,W,C]
        C = self.dim
        y = nn.Dense(2 * C + self.focal_level + 1, dtype=self.dtype, name="f")(x)
        q, ctx, gates = jnp.split(y, [C, 2 * C], axis=-1)

        ctx_all = jnp.zeros_like(ctx)
        for level in range(self.focal_level):
            k = self.focal_factor * level + self.focal_window
            ctx = nn.Conv(
                C, (k, k), padding="SAME", feature_group_count=C, use_bias=False,
                dtype=self.dtype, name=f"focal_layers{level}",
            )(ctx)
            ctx = _gelu(ctx, self.fast_gelu)
            ctx_all = ctx_all + ctx * gates[..., level : level + 1]
        ctx_global = _gelu(jnp.mean(ctx, axis=(1, 2), keepdims=True), self.fast_gelu)
        ctx_all = ctx_all + ctx_global * gates[..., self.focal_level :]
        if self.scaling_modulator:
            ctx_all = ctx_all / (self.focal_level + 1)

        modulator = nn.Conv(C, (1, 1), dtype=self.dtype, name="h")(ctx_all)
        out = q * modulator
        if self.use_postln_in_modulation:
            out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(out).astype(self.dtype)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class FocalModulationBlock(nn.Module):
    """PostLN + LayerScale block (focal.py:118-195).

    ``use_dw`` switches to the focal_dw variant (focal_dw.py:118-205, the
    SEEM-release FocalNet): depthwise 3x3 residual convs before the
    modulation (dw1) and before the FFN (dw2), and DIFFERENT norm placement
    under postLN — norm1 applies AFTER the modulation residual add, and the
    FFN is ``x + gamma_2*mlp(x)`` followed by norm2 over the whole residual
    stream (vs focal.py's pre-add norm1 / ``x + gamma_2*norm2(mlp(x))``)."""

    dim: int
    mlp_ratio: float = 4.0
    focal_level: int = 4
    focal_window: int = 3
    use_postln: bool = True
    use_postln_in_modulation: bool = False
    scaling_modulator: bool = True
    use_layerscale: bool = True
    use_dw: bool = False
    layerscale_value: float = 1e-4
    fast_gelu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B,H,W,C]
        gamma_1 = gamma_2 = 1.0
        if self.use_layerscale:
            gamma_1 = self.param(
                "gamma_1", nn.initializers.constant(self.layerscale_value), (self.dim,)
            )
            gamma_2 = self.param(
                "gamma_2", nn.initializers.constant(self.layerscale_value), (self.dim,)
            )
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")
        if self.use_dw:
            x = x + nn.Conv(
                self.dim, (3, 3), padding="SAME", feature_group_count=self.dim,
                dtype=self.dtype, name="dw1",
            )(x)
        shortcut = x
        if not self.use_postln:
            x = norm1(x).astype(self.dtype)
        x = FocalModulation(
            self.dim, self.focal_level, self.focal_window,
            scaling_modulator=self.scaling_modulator,
            use_postln_in_modulation=self.use_postln_in_modulation,
            fast_gelu=self.fast_gelu,
            dtype=self.dtype, name="modulation",
        )(x)
        if self.use_dw:
            x = shortcut + gamma_1 * x
            if self.use_postln:
                x = norm1(x).astype(self.dtype)
            x = x + nn.Conv(
                self.dim, (3, 3), padding="SAME", feature_group_count=self.dim,
                dtype=self.dtype, name="dw2",
            )(x)
        else:
            if self.use_postln:
                x = norm1(x).astype(self.dtype)
            x = shortcut + gamma_1 * x

        act = ((lambda v: _gelu(v, True)) if self.fast_gelu
               else functools.partial(jax.nn.gelu, approximate=False))
        mlp = Mlp(
            int(self.dim * self.mlp_ratio), self.dim,
            act=act, dtype=self.dtype, name="mlp",
        )
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")
        if self.use_postln:
            if self.use_dw:
                x = x + gamma_2 * mlp(x)
                x = norm2(x).astype(self.dtype)
            else:
                x = x + gamma_2 * norm2(mlp(x)).astype(self.dtype)
        else:
            x = x + gamma_2 * mlp(norm2(x).astype(self.dtype))
        return x


class _FocalScanBody(nn.Module):
    """scan body: one FocalModulationBlock under the fixed name "block" so a
    stage's identical blocks compile ONCE with stacked params (leading axis =
    depth) instead of unrolling — FocalNet-L's 18-block stage 3 dominated the
    cold-compile HLO."""

    dim: int
    mlp_ratio: float
    focal_level: int
    focal_window: int
    use_postln: bool
    use_postln_in_modulation: bool
    scaling_modulator: bool
    use_layerscale: bool
    use_dw: bool
    fast_gelu: bool
    dtype: Dtype

    @nn.compact
    def __call__(self, x, _):
        x = FocalModulationBlock(
            self.dim,
            mlp_ratio=self.mlp_ratio,
            focal_level=self.focal_level,
            focal_window=self.focal_window,
            use_postln=self.use_postln,
            use_postln_in_modulation=self.use_postln_in_modulation,
            scaling_modulator=self.scaling_modulator,
            use_layerscale=self.use_layerscale,
            use_dw=self.use_dw,
            fast_gelu=self.fast_gelu,
            dtype=self.dtype,
            name="block",
        )(x)
        # the f32 LayerScale/post-LN promote the residual to f32; the scan
        # carry must keep a stable dtype, and the unrolled version re-cast at
        # the next block's first bf16 Dense anyway — same numerics
        return x.astype(self.dtype), None


class FocalNet(nn.Module):
    """4-stage FocalNet emitting {"res2".."res5"} NHWC maps (focal.py:340-598).

    Stages run their (identical) blocks under ``nn.scan`` — params stack on a
    leading depth axis under ``layers{i}_blocks/block`` (the converter emits
    the same layout)."""

    embed_dim: int = 192
    depths: Sequence[int] = (2, 2, 18, 2)
    focal_levels: Sequence[int] = (4, 4, 4, 4)
    focal_windows: Sequence[int] = (3, 3, 3, 3)
    mlp_ratio: float = 4.0
    use_conv_embed: bool = True
    use_postln: bool = True
    use_postln_in_modulation: bool = False
    scaling_modulator: bool = True
    use_layerscale: bool = True
    # focal_dw variant (vision/backbone/focal_dw.py — the SEEM-release
    # FocalNet): dw residual convs in every block, stem pad 3, optional
    # pre-norm downsample embeds (use_pre_norms[i] applies to the embed that
    # CLOSES stage i, focal_dw.py:266-270)
    use_dw: bool = False
    use_pre_norms: Sequence[bool] = (False, False, False, False)
    fast_gelu: bool = False
    patch_size: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:  # [B,H,W,3]
        x = PatchEmbed(
            self.embed_dim, is_stem=True, use_conv_embed=self.use_conv_embed,
            patch_size=self.patch_size, stem_pad=3 if self.use_dw else 2,
            dtype=self.dtype, name="patch_embed",
        )(x)
        outs: Dict[str, jax.Array] = {}
        num_layers = len(self.depths)
        for i in range(num_layers):
            dim = self.embed_dim * (2 ** i)
            BlockStack = nn.scan(
                _FocalScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.depths[i],
            )
            x, _ = BlockStack(
                dim,
                mlp_ratio=self.mlp_ratio,
                focal_level=self.focal_levels[i],
                focal_window=self.focal_windows[i],
                use_postln=self.use_postln,
                use_postln_in_modulation=self.use_postln_in_modulation,
                scaling_modulator=self.scaling_modulator,
                use_layerscale=self.use_layerscale,
                use_dw=self.use_dw,
                fast_gelu=self.fast_gelu,
                dtype=self.dtype,
                name=f"layers{i}_blocks",
            )(x, None)
            if i in self.out_indices:
                out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"norm{i}")(x)
                outs[f"res{i + 2}"] = out.astype(self.dtype)
            if i < num_layers - 1:
                x = PatchEmbed(
                    2 * dim, is_stem=False, use_conv_embed=self.use_conv_embed,
                    pre_norm=bool(self.use_pre_norms[i]),
                    dtype=self.dtype, name=f"layers{i}_downsample",
                )(x)
        return outs
