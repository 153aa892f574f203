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


# ---------------------------------------------------------------------------
# Serialization
# ---------------------------------------------------------------------------

def _part1by2(x: jax.Array) -> jax.Array:
    """Spread the low 10 bits of x so there are 2 zero bits between each."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton_code(coords: jax.Array, order: int = 0) -> jax.Array:
    """30-bit Morton code of non-negative int coords (clamped to 10 bits/axis).

    ``order`` selects the axis permutation: 0 = (x,y,z), 1 = (y,x,z) — the
    z / z-trans serialization pair PTv3 alternates between blocks.
    """
    c = jnp.clip(coords, 0, (1 << 10) - 1).astype(jnp.int32)
    if order == 1:
        c = c[:, jnp.array([1, 0, 2])]
    return (
        _part1by2(c[:, 0])
        | (_part1by2(c[:, 1]) << 1)
        | (_part1by2(c[:, 2]) << 2)
    )


def serialize(coords: jax.Array, valid: jax.Array, order: int) -> jax.Array:
    """Sort permutation by Morton code; invalid rows go last."""
    code = morton_code(coords, order)
    big = jnp.int32(2**30)
    code = jnp.where(valid, code, big)
    return jnp.argsort(code)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

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
    """xCPE sparse-conv + pre-norm attention + MLP (PTv3 block shape)."""

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
        x = x + sparse_conv3(x, neighbor_idx, cpe_w.astype(self.dtype), valid)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x + PatchAttention(
            self.dim, self.num_heads, self.patch_size, self.dtype, name="attn"
        )(h, perm, valid)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        x = x + h
        return jnp.where(valid[:, None], x, 0)


class StageLevel(NamedTuple):
    feats: jax.Array        # [Mi, Ci]
    coords: jax.Array       # [Mi, 3]
    valid: jax.Array        # [Mi]
    pooling_inverse: Optional[jax.Array]  # [M_child] child -> this-level index


class SonataEncoder(nn.Module):
    """5-stage hierarchical encoder; returns all levels for the upcast."""

    in_channels: int = 6
    enc_depths: Sequence[int] = (3, 3, 3, 12, 3)
    enc_channels: Sequence[int] = (48, 96, 192, 384, 512)
    enc_num_head: Sequence[int] = (3, 6, 12, 24, 32)
    enc_patch_size: Sequence[int] = (1024, 1024, 1024, 1024, 1024)
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, feats: jax.Array, coords: jax.Array, valid: jax.Array
    ) -> List[StageLevel]:
        """feats [N, in_channels]; coords [N,3] int32 voxel coords (>=0, sorted
        not required); valid [N]. Returns levels[0..4], fine to coarse."""
        x = nn.Dense(self.enc_channels[0], dtype=self.dtype, name="embed")(
            feats.astype(self.dtype)
        )
        x = nn.LayerNorm(dtype=jnp.float32, name="embed_norm")(x).astype(self.dtype)

        levels: List[StageLevel] = []
        cur_coords, cur_valid = coords, valid
        pooling_inverse = None
        for s, depth in enumerate(self.enc_depths):
            c = self.enc_channels[s]
            # stage-local serialization orders + neighbor table
            perm0 = serialize(cur_coords, cur_valid, order=0)
            perm1 = serialize(cur_coords, cur_valid, order=1)
            # neighbor table needs lexicographically sorted coords: our grid
            # pooling and voxelize_points both produce sorted outputs.
            nbr = build_neighbor_table(cur_coords, cur_valid)
            for b in range(depth):
                perm = perm0 if b % 2 == 0 else perm1
                x = PointBlock(
                    c, self.enc_num_head[s], self.enc_patch_size[s],
                    self.mlp_ratio, self.dtype, name=f"stage{s}_block{b}",
                )(x, perm, cur_valid, nbr)
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
                pooled = segment_mean(
                    x.astype(jnp.float32), inv, num_segments=M_next
                ).astype(self.dtype)
                x = nn.Dense(
                    self.enc_channels[s + 1], dtype=self.dtype, name=f"pool_proj{s}"
                )(pooled)
                x = nn.LayerNorm(dtype=jnp.float32, name=f"pool_norm{s}")(x).astype(self.dtype)
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
            self.enc_num_head, self.enc_patch_size, dtype=self.dtype,
            name="encoder",
        )(vox_feats, voxel_coords, voxel_valid)
        f0 = sonata_features(levels, self.upcast_levels)   # [M0, C]
        f0 = jnp.concatenate([f0, jnp.zeros((1, f0.shape[1]), f0.dtype)], axis=0)
        out = f0[jnp.minimum(point2voxel, M0)]
        return jnp.where(point_valid[:, None], out, 0)
