"""Sonata-style 3D SSL teacher — PTv3-flavored hierarchical point transformer.

The reference consumes a frozen external `sonata` package (declared as an EMPTY
submodule; reference models/affinity_module.py:251-264, .gitmodules:1-6) whose
backbone is Point-Transformer-V3: serialized (space-filling-curve) patch
attention, conditional position encoding via sparse convs, and grid-pooling
stages with recorded parent/inverse maps consumed by the 2-level "upcast"
(affinity_module.py:1038-1050).

TPU-native re-design:
- serialization = Morton (z-order) codes, sorted once per stage; alternate
  blocks use an axis-permuted code (the "trans" orders);
- patch attention = dense masked MHA over fixed-size patches of the sorted
  sequence — static [num_patches, patch, C] batched matmuls on the MXU;
- xCPE = our 27-neighbor sparse conv (ops/sparse_conv.py) over the stage's
  voxel grid;
- grid pooling halves the voxel grid (coords >> 1) with segment-mean + linear
  projection; every stage has a static point budget (max_points >> stage).

Outputs mirror the reference contract: hierarchical features plus
pooling-inverse maps, and `sonata_features` reproduces the 2-upcast + propagate
+ full-resolution gather recipe. Because the published Sonata weights cannot be
fetched in this environment, training-time use supports (a) this network with
converted/los weights when available and (b) precomputed teacher embeddings
(the SURVEY §7.8 "precompute first" path).
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from geopurify_tpu.ops.segment import segment_mean
from geopurify_tpu.ops.sparse_conv import build_neighbor_table, sparse_conv3
from geopurify_tpu.ops.voxelize import voxelize_points

Dtype = Any


def _gelu_exact(x):
    """Exact (erf) GELU — torch nn.GELU default; flax nn.gelu defaults to
    the tanh approximation (~1e-3 abs divergence, torch-oracle-pinned)."""
    return jax.nn.gelu(x, approximate=False)



# ---------------------------------------------------------------------------
# Serialization
# ---------------------------------------------------------------------------

from geopurify_tpu.ops.morton import hilbert_code, morton_code  # noqa: E402


def serialize(coords: jax.Array, valid: jax.Array, order: int) -> jax.Array:
    """Sort permutation by space-filling-curve code; invalid rows go last.

    ``order`` cycles PTv3/Sonata's four serialization orders
    (Pointcept PointTransformerV3 default ``order=("z", "z-trans",
    "hilbert", "hilbert-trans")``): 0 = z (Morton), 1 = z-trans
    (axes permuted), 2 = hilbert, 3 = hilbert-trans.
    """
    if order >= 2:
        c = jnp.maximum(coords, 0).astype(jnp.int32)
        if order == 3:
            c = c[:, jnp.array([1, 0, 2])]
        code = hilbert_code(c)
    else:
        code = morton_code(coords, order)
    big = jnp.int32(2**30)
    code = jnp.where(valid, code, big)
    return jnp.argsort(code)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

class NormOrAffine(nn.Module):
    """LayerNorm, or a per-channel affine (scale*x + bias) when ``affine_only``.

    The affine mode hosts FOLDED BatchNorm running stats from a released torch
    checkpoint (inference-frozen BN is exactly a per-channel affine); param
    names match flax LayerNorm so converters emit one layout for both.
    """

    affine_only: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        x32 = x.astype(jnp.float32)
        if not self.affine_only:
            mu = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
            x32 = (x32 - mu) * jax.lax.rsqrt(var + self.eps)
        return x32 * scale + bias


class PatchAttention(nn.Module):
    """Dense MHA within fixed-size patches of the serialized sequence."""

    dim: int
    num_heads: int
    patch_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, perm: jax.Array, valid: jax.Array) -> jax.Array:
        N, C = x.shape
        S = min(self.patch_size, N)
        n_patch = -(-N // S)
        Np = n_patch * S
        inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(N, dtype=perm.dtype))

        xs = jnp.pad(x[perm], ((0, Np - N), (0, 0))).reshape(n_patch, S, C)
        vs = jnp.pad(valid[perm], (0, Np - N)).reshape(n_patch, S)

        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(xs)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = C // self.num_heads

        def heads(t):
            return t.reshape(n_patch, S, self.num_heads, d).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        logits = jnp.einsum(
            "phqd,phkd->phqk", qh, kh, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(d))
        logits = jnp.where(vs[:, None, None, :], logits, -jnp.inf)
        attn = jnp.nan_to_num(jax.nn.softmax(logits, axis=-1)).astype(self.dtype)
        out = jnp.einsum("phqk,phkd->phqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(Np, C)[:N]
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        return out[inv]


class PointBlock(nn.Module):
    """xCPE + pre-norm attention + MLP — the PTv3 block shape.

    xCPE mirrors PTv3's ``cpe = [SubMConv3d(k=3, bias) -> Linear -> norm]``
    with a residual around the whole stack; norm1/norm2 and the cpe trailing
    norm are LayerNorm (PTv3 blocks are LN throughout — BN appears only at
    the embedding/pooling sites, handled by the encoder's NormOrAffine).
    """

    dim: int
    num_heads: int
    patch_size: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, perm, valid, neighbor_idx):
        cpe_w = self.param(
            "cpe_kernel", nn.initializers.he_normal(in_axis=(0, 1), out_axis=2),
            (27, self.dim, self.dim),
        )
        cpe_b = self.param("cpe_bias", nn.initializers.zeros, (self.dim,))
        h = sparse_conv3(x, neighbor_idx, cpe_w.astype(self.dtype), valid, bias=cpe_b)
        h = nn.Dense(self.dim, dtype=self.dtype, name="cpe_fc")(h)
        # PTv3 passes the Block's (Layer)norm into cpe; BN only appears in the
        # embedding/pooling sites, so cpe_norm is unconditionally LN
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="cpe_norm")(h)
        x = x + h.astype(self.dtype)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x + PatchAttention(
            self.dim, self.num_heads, self.patch_size, self.dtype, name="attn"
        )(h, perm, valid)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(h)
        h = _gelu_exact(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        x = x + h
        return jnp.where(valid[:, None], x, 0)


class _SonataScanBody(nn.Module):
    """scan body: one PointBlock under the fixed name "block" — a stage's
    identical blocks compile once with depth-stacked params (the serialization
    perm alternates per block and rides the scan's xs axis)."""

    dim: int
    num_heads: int
    patch_size: int
    mlp_ratio: float
    dtype: Dtype

    @nn.compact
    def __call__(self, x, perm, valid, nbr):
        x = PointBlock(
            self.dim, self.num_heads, self.patch_size, self.mlp_ratio,
            self.dtype, name="block",
        )(x, perm, valid, nbr)
        return x.astype(self.dtype), None


class StageLevel(NamedTuple):
    feats: jax.Array        # [Mi, Ci]
    coords: jax.Array       # [Mi, 3]
    valid: jax.Array        # [Mi]
    pooling_inverse: Optional[jax.Array]  # [M_child] child -> this-level index


class SonataEncoder(nn.Module):
    """5-stage hierarchical encoder; returns all levels for the upcast.

    PTv3-faithful structure (public Pointcept PointTransformerV3 layout, the
    backbone of the released facebook/sonata teacher):
    - stem: SubMConv3d(in, C0, k=``stem_kernel``) + norm + GELU
      (≙ ``embedding.stem.{conv,norm}``);
    - stages: PointBlocks over stage-local serialization orders
      (≙ ``enc.enc{s}.block{b}``);
    - downsampling: Linear proj -> grid-pool reduce (``pool_reduce``) ->
      norm -> GELU (≙ ``enc.enc{s}.down.{proj,norm}`` — PTv3's
      SerializedPooling projects BEFORE reducing).
    """

    in_channels: int = 6
    enc_depths: Sequence[int] = (3, 3, 3, 12, 3)
    enc_channels: Sequence[int] = (48, 96, 192, 384, 512)
    enc_num_head: Sequence[int] = (3, 6, 12, 24, 32)
    enc_patch_size: Sequence[int] = (1024, 1024, 1024, 1024, 1024)
    mlp_ratio: float = 4.0
    stem_kernel: int = 5
    pool_reduce: str = "max"              # max (PTv3/Sonata default) | mean
    aux_norm_affine_only: bool = False    # folded-BN mode for converted ckpts
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, feats: jax.Array, coords: jax.Array, valid: jax.Array
    ) -> List[StageLevel]:
        """feats [N, in_channels]; coords [N,3] int32 voxel coords (>=0,
        lexicographically sorted); valid [N]. Returns levels[0..4], fine to
        coarse."""
        C0 = self.enc_channels[0]
        if self.stem_kernel > 1:
            stem_w = self.param(
                "stem_kernel_w",
                nn.initializers.he_normal(in_axis=(0, 1), out_axis=2),
                (self.stem_kernel ** 3, self.in_channels, C0),
            )
            stem_nbr = build_neighbor_table(coords, valid, kernel_size=self.stem_kernel)
            x = sparse_conv3(
                feats.astype(self.dtype), stem_nbr, stem_w.astype(self.dtype), valid
            )
        else:
            x = nn.Dense(C0, dtype=self.dtype, name="embed")(feats.astype(self.dtype))
        x = NormOrAffine(self.aux_norm_affine_only, name="embed_norm")(x)
        x = _gelu_exact(x).astype(self.dtype)

        levels: List[StageLevel] = []
        cur_coords, cur_valid = coords, valid
        pooling_inverse = None
        for s, depth in enumerate(self.enc_depths):
            c = self.enc_channels[s]
            # stage-local serialization orders + neighbor table
            stage_perms = [serialize(cur_coords, cur_valid, order=o)
                           for o in range(4)]
            # neighbor table needs lexicographically sorted coords: our grid
            # pooling and voxelize_points both produce sorted outputs.
            nbr = build_neighbor_table(cur_coords, cur_valid)
            # blocks cycle z / z-trans / hilbert / hilbert-trans, matching
            # PTv3's per-block ``order[i % len(order)]`` shuffle of its
            # 4-order default — attention patch groupings follow the teacher's
            perms = jnp.stack([stage_perms[b % 4] for b in range(depth)])
            BlockStack = nn.scan(
                _SonataScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(0, nn.broadcast, nn.broadcast),
                length=depth,
            )
            x, _ = BlockStack(
                c, self.enc_num_head[s], self.enc_patch_size[s],
                self.mlp_ratio, self.dtype, name=f"stage{s}_blocks",
            )(x.astype(self.dtype), perms, cur_valid, nbr)
            levels.append(StageLevel(x, cur_coords, cur_valid, pooling_inverse))

            if s < len(self.enc_depths) - 1:
                # grid pool: halve the voxel grid. The PARENT budget must be
                # the full child count — unique parent cells only shrink
                # data-dependently (a sparse cloud can keep ~every cell
                # distinct after halving), and an overflowing budget silently
                # drops cells (caught by test_encoder_grid_pool_hierarchy).
                # The VALID count still shrinks; only padding is carried.
                parent_coords_all = cur_coords // 2
                M_next = cur_coords.shape[0]
                dv = voxelize_points(parent_coords_all, cur_valid, max_voxels=M_next)
                inv = dv.point2voxel                      # [Mi] -> parent id (==M_next pad)
                # PTv3 order: project the CHILD features, then reduce
                proj = nn.Dense(
                    self.enc_channels[s + 1], dtype=self.dtype, name=f"pool_proj{s}"
                )(x)
                if self.pool_reduce == "max":
                    neg = jnp.finfo(jnp.float32).min
                    pooled = jax.ops.segment_max(
                        jnp.where(cur_valid[:, None], proj.astype(jnp.float32), neg),
                        inv, num_segments=M_next,
                    )
                    pooled = jnp.where(pooled <= neg / 2, 0.0, pooled).astype(self.dtype)
                else:
                    pooled = segment_mean(
                        proj.astype(jnp.float32), inv, num_segments=M_next
                    ).astype(self.dtype)
                x = NormOrAffine(self.aux_norm_affine_only, name=f"pool_norm{s}")(pooled)
                x = _gelu_exact(x).astype(self.dtype)
                x = jnp.where(dv.voxel_valid[:, None], x, 0)
                cur_coords, cur_valid = dv.voxel_coords, dv.voxel_valid
                pooling_inverse = jnp.minimum(inv, M_next - 1)  # safe gather; pad rows masked
        return levels


def sonata_features(levels: List[StageLevel], upcast_levels: int = 2) -> jax.Array:
    """Reproduce the reference's upcast recipe (affinity_module.py:1038-1050):
    concat the deepest ``upcast_levels`` levels' features down the hierarchy,
    then propagate (replace) through the remaining levels. Returns features at
    level-0 (finest voxel grid) resolution."""
    feat = levels[-1].feats
    for li in range(len(levels) - 1, 0, -1):
        parent = levels[li - 1]
        # levels[li].pooling_inverse maps level li-1 rows (children) -> level li rows
        inv = levels[li].pooling_inverse
        gathered = feat[inv]
        if len(levels) - li <= upcast_levels:
            feat = jnp.concatenate(
                [parent.feats.astype(jnp.float32), gathered.astype(jnp.float32)], axis=-1
            )
        else:
            feat = gathered
    return feat  # [M0, C_final]


class SonataTeacher(nn.Module):
    """End-to-end: grid-sampled scene -> per-point full-resolution features.

    Mirrors get_sonata_features (affinity_module.py:995-1063): voxelize at
    grid_size, encode, upcast, gather back per point via the inverse map.
    """

    in_channels: int = 6
    enc_depths: Sequence[int] = (3, 3, 3, 12, 3)
    enc_channels: Sequence[int] = (48, 96, 192, 384, 512)
    enc_num_head: Sequence[int] = (3, 6, 12, 24, 32)
    enc_patch_size: Sequence[int] = (1024, 1024, 1024, 1024, 1024)
    upcast_levels: int = 2
    stem_kernel: int = 5
    pool_reduce: str = "max"
    aux_norm_affine_only: bool = False
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        ch = list(self.enc_channels)
        d = ch[-1]
        for li in range(len(ch) - 1, 0, -1):
            if len(ch) - li <= self.upcast_levels:
                d = ch[li - 1] + d
        return d

    @nn.compact
    def __call__(
        self,
        point_feats: jax.Array,    # [N, in_channels] (color || normal)
        voxel_coords: jax.Array,   # [M0, 3] int32, sorted (from voxelize_points)
        voxel_valid: jax.Array,    # [M0]
        point2voxel: jax.Array,    # [N] -> M0 (== M0 for padding)
        point_valid: jax.Array,    # [N]
    ) -> jax.Array:
        M0 = voxel_coords.shape[0]
        vox_feats = segment_mean(
            point_feats.astype(jnp.float32),
            jnp.where(point_valid, point2voxel, M0),
            num_segments=M0,
        )
        levels = SonataEncoder(
            self.in_channels, self.enc_depths, self.enc_channels,
            self.enc_num_head, self.enc_patch_size,
            stem_kernel=self.stem_kernel, pool_reduce=self.pool_reduce,
            aux_norm_affine_only=self.aux_norm_affine_only, dtype=self.dtype,
            name="encoder",
        )(vox_feats, voxel_coords, voxel_valid)
        f0 = sonata_features(levels, self.upcast_levels)   # [M0, C]
        f0 = jnp.concatenate([f0, jnp.zeros((1, f0.shape[1]), f0.dtype)], axis=0)
        out = f0[jnp.minimum(point2voxel, M0)]
        return jnp.where(point_valid[:, None], out, 0)
