"""Sparse 3D convolution, TPU-native.

Replacement for MinkowskiEngine's hash-based sparse convolution (reference
models/affinity_module.py:33-85 uses only 3^3 and 1^3 kernels). Design:

1. Voxels arrive lexicographically sorted (the ``voxelize_points`` contract).
2. ``build_neighbor_table`` binary-searches, for each of the K=27 kernel
   offsets, the voxel id of coord+offset — one sorted int32-key ``searchsorted``
   per offset, all on device. Missing neighbors map to a sentinel row M.
3. ``sparse_conv3`` computes ``out[i] = sum_k F[nbr[i,k]] @ W[k]`` as K
   gather+matmul steps accumulated in f32 — dense, regular, MXU-shaped work;
   the zero sentinel row makes missing neighbors contribute nothing, exactly
   MinkowskiEngine's semantics (only existing coordinates participate).

The neighbor table is built once per scene and reused by every conv layer —
the analogue of MinkowskiEngine's cached kernel maps.

Grid-extent contract: per-axis voxel extent must satisfy
(ext_x+2)*(ext_y+2)*(ext_z+2) < 2^31 so the linearized key fits int32
(≈ 1200 voxels per axis, 24 m at 2 cm). Larger scenes must be chunked upstream.
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def kernel_offsets_3d(kernel_size: int = 3) -> np.ndarray:
    """Kernel offset enumeration, x-major (dx slowest, dz fastest): [K, 3] int32."""
    r = range(-(kernel_size // 2), kernel_size // 2 + 1)
    return np.array(list(itertools.product(r, r, r)), dtype=np.int32)


def _linear_keys(coords: jax.Array, spans: jax.Array) -> jax.Array:
    """Linearize int coords with runtime spans; must match lexicographic order."""
    c = coords.astype(jnp.int32)
    return (c[:, 0] * spans[1] + c[:, 1]) * spans[2] + c[:, 2]


@partial(jax.jit, static_argnames=("kernel_size",))
def build_neighbor_table(
    voxel_coords: jax.Array,  # [M, 3] int32, lexicographically sorted, >= 0
    voxel_valid: jax.Array,   # [M] bool
    kernel_size: int = 3,
) -> jax.Array:
    """Neighbor table [M, K] int32; entry == M where the neighbor is absent."""
    M = voxel_coords.shape[0]
    offsets = jnp.asarray(kernel_offsets_3d(kernel_size))  # [K,3]
    K = offsets.shape[0]

    maxc = jnp.max(jnp.where(voxel_valid[:, None], voxel_coords, 0), axis=0)
    spans = maxc + 3  # room for +1 offsets and the shift below
    raw_keys = _linear_keys(voxel_coords + 1, spans)  # +1 shift keeps targets >= 0
    # push padded rows beyond any real key so searchsorted never matches them
    big = jnp.int32(2**31 - 1)
    keys = jnp.where(voxel_valid, raw_keys, big)

    # The linear key is affine, so target keys for offset o are keys + const_o.
    # method="sort" (union-argsort lowering) beats the default binary-search
    # scan ~4x on TPU — the scan's 17 dependent gather rounds dominate (A/B on
    # v5e: 255 ms -> 60 ms at M=65536, bit-identical). Targets come from the
    # RAW keys (a padded row's big+const would overflow); invalid queries are
    # masked out below.
    #
    # Z-CHAIN: only the kernel_size^2 dz==0 offsets are searched. dz is the
    # FASTEST key axis (lex sort), so the (dx, dy, dz+-d) targets are t +- d
    # and their positions CHAIN from the dz=0 insertion point p by strict
    # monotonicity: pos(t+d) = pos(t+d-1) + [keys[pos(t+d-1)] == t+d-1],
    # downward pos(t-d) = pos(t-(d-1)) - [exists], existence = one kp compare
    # each. The union sort shrinks from (K+1)M to (K/kz+1)M elements
    # (28M -> 10M at kernel 3, 126M -> 26M at the Sonata k5 stem). The +1
    # coord shift and spans = maxc+3 keep t +- (kz//2) from ever colliding
    # with a real key of a neighboring (x, y) column (shifted z' spans
    # [1, maxz+1]; the wrap slots z'=0 / z'=maxz+2 are never occupied).
    kz = kernel_size
    n_col = K // kz
    mid_tap = kz // 2
    kconst = (
        offsets[:, 0] * spans[1] + offsets[:, 1]
    ) * spans[2] + offsets[:, 2]                               # [K]
    col_const = kconst[mid_tap::kz]                            # [n_col] dz=0
    targets = raw_keys[None, :] + col_const[:, None]           # [n_col, M]
    p = jnp.searchsorted(
        keys, targets.reshape(-1), method="sort"
    ).reshape(n_col, M).astype(jnp.int32)
    kp = jnp.concatenate([keys, jnp.full((1,), big, keys.dtype)])  # [M+1]
    qv = voxel_valid[None, :]

    cols = [None] * kz                                         # [n_col, M] each
    hit_mid = (kp[p] == targets) & qv
    cols[mid_tap] = jnp.where(hit_mid, p, M)
    q, tq = p, targets
    for d in range(1, kz - mid_tap):
        q = q + (kp[q] == tq).astype(jnp.int32)                # pos(t+d)
        tq = tq + 1
        hit = (kp[jnp.minimum(q, M)] == tq) & qv
        cols[mid_tap + d] = jnp.where(hit, q, M)
    r, tr = p, targets
    for d in range(1, mid_tap + 1):
        tr = tr - 1
        prev = jnp.maximum(r - 1, 0)
        hit = (kp[prev] == tr) & (r >= 1) & qv
        cols[mid_tap - d] = jnp.where(hit, prev, M)
        r = jnp.where(hit, prev, r)
    # interleave back to product order (dz fastest): [n_col, kz, M]
    table = jnp.stack(cols, axis=1).reshape(K, M).astype(jnp.int32)
    return table.T  # [M, K]


@jax.checkpoint
def _conv_taps(f_pad: jax.Array, neighbor_idx: jax.Array, weights: jax.Array):
    """sum_k gather_k(f) @ W[k] via a scan over taps.

    Rematerialized (jax.checkpoint): without it, scan's backward saves every
    per-tap gather — K x [M, Cin] residuals (3.4 GB at 65k voxels x 512 ch),
    which OOMs the training step; recomputing the K gathers in the backward
    costs a few ms.

    The CENTER tap of a full 3^3 stencil ((0,0,0) — product-order index 13)
    is the identity on valid rows (nbr[i, 13] == i; invalid rows gather the
    zero sentinel), so it runs as a direct full-matrix matmul instead of a
    gather — 1/K of the conv's gather traffic for free. Exact because every
    caller masks invalid OUTPUT rows (forward: where(valid); backward: the
    cotangent g is pre-zeroed at invalid rows, so d_weights contributions
    from invalid rows vanish either way)."""
    K = weights.shape[0]
    M = neighbor_idx.shape[0]
    Cout = weights.shape[2]
    # product-order center ((0,0,0)) is K//2 for odd cubic kernels (3^3, 5^3)
    center = K // 2 if K in (27, 125) else None

    def step(acc, k):
        gathered = f_pad[neighbor_idx[:, k]]  # [M, Cin]
        acc = acc + jnp.dot(
            gathered, weights[k], preferred_element_type=jnp.float32
        )
        return acc, None

    if center is None:
        acc0 = jnp.zeros((M, Cout), jnp.float32)
        taps = jnp.arange(K)
    else:
        acc0 = jnp.dot(
            f_pad[:M], weights[center], preferred_element_type=jnp.float32
        )
        taps = jnp.asarray(
            [k for k in range(K) if k != center], dtype=jnp.int32
        )
    out, _ = jax.lax.scan(step, acc0, taps)
    return out


@partial(jax.custom_vjp, nondiff_argnums=())
def _conv_core(features: jax.Array, neighbor_idx: jax.Array,
               weights: jax.Array, valid: jax.Array) -> jax.Array:
    """sum_k F[nbr[i,k]] @ W[k], zeroed beyond valid rows — with a GATHER-based
    custom VJP.

    XLA's automatic transpose of the forward's 27 per-tap gathers is 27
    per-tap SCATTER-ADDS (~12-25 ns per dynamic row index on TPU — the
    dominant cost of the Stage-1 student backward). But the 3^3 stencil is
    SYMMETRIC: ``kernel_offsets_3d`` enumerates offsets in a product order
    where negation maps tap k to tap K-1-k, and the neighbor table satisfies
    nbr[i, k] = j  <=>  nbr[j, K-1-k] = i for valid i, j (invalid rows have
    no neighbors in either direction — build_neighbor_table masks both
    sides). So the cotangent w.r.t. features is THE SAME conv with reversed
    tap order and per-tap-transposed weights — pure gathers, no scatters:

        d_f[j] = sum_k g[i : nbr[i,k]=j] @ W[k]^T
               = sum_k' gather(g, nbr[j, k']) @ W[K-1-k']^T
    """
    M, Cin = features.shape
    f_pad = jnp.concatenate(
        [features, jnp.zeros((1, Cin), features.dtype)], axis=0
    )  # sentinel zero row
    out = _conv_taps(f_pad, neighbor_idx, weights)
    return jnp.where(valid[:, None], out, 0)


def _conv_core_fwd(features, neighbor_idx, weights, valid):
    return (
        _conv_core(features, neighbor_idx, weights, valid),
        (features, neighbor_idx, weights, valid),
    )


def _conv_core_bwd(res, g):
    features, neighbor_idx, weights, valid = res
    M, Cin = features.shape
    K = weights.shape[0]
    g = jnp.where(valid[:, None], g.astype(jnp.float32), 0.0)
    g_pad = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)], axis=0)
    # d_features: the transposed stencil conv (gathers, not scatters)
    w_t = weights[::-1].transpose(0, 2, 1).astype(jnp.float32)  # [K, Cout, Cin]
    d_f = _conv_taps(g_pad, neighbor_idx, w_t)
    d_f = jnp.where(valid[:, None], d_f, 0.0).astype(features.dtype)

    # d_weights[k] = gathered_k^T @ g (re-gather per tap — rematerialization,
    # mirroring the checkpointed forward)
    f_pad = jnp.concatenate(
        [features.astype(jnp.float32), jnp.zeros((1, Cin), jnp.float32)], axis=0
    )

    def step(_, k):
        gathered = f_pad[neighbor_idx[:, k]]                # [M, Cin]
        dw_k = jax.lax.dot_general(
            gathered, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # [Cin, Cout]
        return None, dw_k

    _, d_w = jax.lax.scan(step, None, jnp.arange(K))
    return d_f, None, d_w.astype(weights.dtype), None


_conv_core.defvjp(_conv_core_fwd, _conv_core_bwd)


class ZStackTable(NamedTuple):
    """Aux structure for the z-stacked 3^3 conv (large-M eval fast path).

    Lex-sorted voxels put (x, y, z-1) / (x, y, z+1) at the ADJACENT table
    rows of (x, y, z) whenever they exist, so the three dz taps of a kernel
    column (dx, dy) can share ONE row-gather at the dz=0 tap's index over
    H = [f(z-pred) || f || f(z-succ)] — 27 row-gathers become 9 gathers of
    3C-wide rows. Measured on v5e (scripts/bench_conv2.py): 15% faster at
    M=2^18 (183 vs 215 ms/conv), SLOWER at M=65536 (row-gathers at 2KB rows
    are already bytes-bound there) — gate on M (student.zstack_min_voxels).

    Columns whose dz=0 voxel is ABSENT while a dz=+-1 neighbor exists (a
    hole or run boundary in the neighbor z-column; 0.3-9% of taps on
    surface scenes) are repaired by an exact per-tap compacted residual.
    ``overflow`` means a tap's residual exceeded the static budget — callers
    must fall back to the tap-scan conv (the result here would be inexact).
    """

    nbr: jax.Array        # [M, K] the plain table (fallback + d_weights)
    t_mid: jax.Array      # [M, 9] dz=0 tap index per column (sentinel M)
    has_pred: jax.Array   # [M] row i-1 is i's z-predecessor
    has_succ: jax.Array   # [M] row i+1 is i's z-successor
    res_dst: jax.Array    # [18, B] destination rows (pad M)
    res_src: jax.Array    # [18, B] source rows (pad M -> zero sentinel)
    res_cnt: jax.Array    # [18] live edge count per residual tap
    overflow: jax.Array   # [] bool


# residual tap ids: dz=-1 and dz=+1 of each of the 9 (dx,dy) columns
_Z_RES_TAPS = np.array(
    [k for c in range(9) for k in (3 * c, 3 * c + 2)], dtype=np.int32
)


@partial(jax.jit, static_argnames=("res_budget",))
def build_zstack_table(
    voxel_coords: jax.Array,  # [M, 3] int32, lex-sorted
    voxel_valid: jax.Array,   # [M] bool
    neighbor_idx: jax.Array,  # [M, 27] from build_neighbor_table
    res_budget: int = 16384,
) -> ZStackTable:
    """Derive the z-stack structure from the 27-neighbor table, once per
    scene (shared by every 3^3 conv layer, like the table itself)."""
    M = neighbor_idx.shape[0]
    K = 27
    adj = (
        jnp.all(
            voxel_coords[1:] - voxel_coords[:-1]
            == jnp.asarray([0, 0, 1], voxel_coords.dtype),
            axis=-1,
        )
        & voxel_valid[1:]
        & voxel_valid[:-1]
    )
    has_pred = jnp.concatenate([jnp.zeros((1,), bool), adj])
    has_succ = jnp.concatenate([adj, jnp.zeros((1,), bool)])
    t_mid = neighbor_idx[:, 1::3]                    # [M, 9]

    # residual edges, one fused scatter: for tap slot t (global tap k) the
    # live-while-mid-absent edges compact at their per-tap rank; the edge id
    # i*K+k is scattered (fits int32), dst/src derive by cheap gathers at
    # the compact size. Overflow rows go out of bounds (mode="drop").
    ks = jnp.asarray(_Z_RES_TAPS)                    # [18]
    live = neighbor_idx[:, ks] < M                   # [M, 18]
    mid_dead = t_mid >= M                            # [M, 9]
    mask = (live & jnp.repeat(mid_dead, 2, axis=1)).T   # [18, M]
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    cnt = jnp.sum(mask.astype(jnp.int32), axis=1)    # [18]
    B = res_budget
    rows = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None], (18, M))
    eid = rows * K + ks[:, None].astype(jnp.int32)   # [18, M]
    slot = jnp.where(
        mask & (rank < B),
        jnp.arange(18, dtype=jnp.int32)[:, None] * B + rank,
        18 * B,
    )
    flat = jnp.full((18 * B,), -1, jnp.int32).at[slot.reshape(-1)].set(
        eid.reshape(-1), mode="drop", unique_indices=True
    )
    e_live = (
        jnp.arange(B, dtype=jnp.int32)[None, :] < jnp.minimum(cnt, B)[:, None]
    )                                                # [18, B]
    eid_c = flat.reshape(18, B)
    dst = jnp.where(e_live, eid_c // K, M)
    src = jnp.where(
        e_live, neighbor_idx.reshape(-1)[jnp.maximum(eid_c, 0)], M
    )
    return ZStackTable(
        neighbor_idx, t_mid, has_pred, has_succ,
        dst, src, cnt, jnp.any(cnt > B),
    )


def _conv_zstack(features: jax.Array, zt: ZStackTable,
                 weights: jax.Array, valid: jax.Array) -> jax.Array:
    """The z-stacked 3^3 conv body (see ZStackTable). Exact vs _conv_core
    when ``not zt.overflow`` (test-pinned); callers gate on the flag."""
    M, Cin = features.shape
    Cout = weights.shape[2]
    fd = features
    zero = jnp.zeros((1, Cin), fd.dtype)
    fm = jnp.where(zt.has_pred[:, None], jnp.concatenate([zero, fd[:-1]]), 0)
    fp = jnp.where(zt.has_succ[:, None], jnp.concatenate([fd[1:], zero]), 0)
    H = jnp.concatenate([fm, fd, fp], axis=1)        # [M, 3C]
    H = jnp.concatenate([H, jnp.zeros((1, 3 * Cin), fd.dtype)], axis=0)
    # stacked per-column weights [9, 3C, Cout]
    Wz = weights.reshape(9, 3, Cin, Cout).reshape(9, 3 * Cin, Cout)

    def col(acc, c):
        g = H[zt.t_mid[:, c]]                        # [M, 3C]
        acc = acc + jax.lax.dot_general(
            g, Wz[c], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, None

    # center column ((dx,dy)=(0,0)): t_mid[:, 4] is the identity on valid
    # rows (a voxel is its own (0,0,0) neighbor) and invalid OUTPUT rows are
    # masked below, so it runs as a direct matmul on H[:M] — 1/9 of the
    # conv's wide-row gather traffic for free
    acc0 = jax.lax.dot_general(
        H[:M], Wz[4], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc, _ = jax.lax.scan(
        col, acc0, jnp.asarray([0, 1, 2, 3, 5, 6, 7, 8], jnp.int32)
    )

    f_pad = jnp.concatenate([fd, zero], axis=0)
    k_map = jnp.asarray(_Z_RES_TAPS)

    def resid(t, acc):
        def live(acc):
            g = jax.lax.dot_general(
                f_pad[zt.res_src[t]],
                jax.lax.dynamic_index_in_dim(
                    weights, k_map[t], keepdims=False
                ).astype(fd.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc.at[zt.res_dst[t]].add(
                g, mode="drop", unique_indices=True
            )

        return jax.lax.cond(zt.res_cnt[t] > 0, live, lambda a: a, acc)

    acc = jax.lax.fori_loop(0, 18, resid, acc)
    return jnp.where(valid[:, None], acc, 0)


def sparse_conv3(
    features: jax.Array,      # [M, Cin]
    neighbor_idx,             # [M, K] int32 table (sentinel == M) or ZStackTable
    weights: jax.Array,       # [K, Cin, Cout]
    valid: jax.Array,         # [M] bool
    bias: Optional[jax.Array] = None,  # [Cout]
    accum_dtype=jnp.float32,
) -> jax.Array:
    """out[i] = sum_k F[nbr[i,k]] @ W[k]  (+ bias), zeros beyond valid rows.

    With a ``ZStackTable`` the z-stacked large-M fast path runs (exact;
    a residual-budget overflow falls back to the tap-scan conv under a
    runtime cond). The z-stack path is forward-only (Stage-2 eval) — the
    training step keeps the plain table and its gather-based custom VJP."""
    if isinstance(neighbor_idx, ZStackTable):
        zt = neighbor_idx
        out = jax.lax.cond(
            zt.overflow,
            lambda: _conv_core(features, zt.nbr, weights, valid),
            lambda: _conv_zstack(features, zt, weights, valid),
        ).astype(accum_dtype)
    else:
        out = _conv_core(
            features, neighbor_idx, weights, valid
        ).astype(accum_dtype)
    if bias is not None:
        out = out + bias[None, :].astype(accum_dtype)
        out = jnp.where(valid[:, None], out, 0)
    return out.astype(features.dtype)


def sparse_conv1(
    features: jax.Array,   # [M, Cin]
    weight: jax.Array,     # [Cin, Cout]
    valid: jax.Array,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """1x1x1 sparse conv == plain per-voxel matmul."""
    out = jnp.dot(features, weight, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias[None, :]
    return jnp.where(valid[:, None], out, 0).astype(features.dtype)


def masked_batch_stats(
    x: jax.Array, valid: jax.Array, axis_name: Optional[str] = None
) -> Tuple[jax.Array, jax.Array]:
    """Mean/var over valid rows only; with ``axis_name``, moments are averaged
    across the mesh axis — the TPU-native SyncBN (reference run/train.py:212-213)."""
    v = valid[:, None].astype(jnp.float32)
    count = jnp.sum(v)
    s1 = jnp.sum(x.astype(jnp.float32) * v, axis=0)
    s2 = jnp.sum((x.astype(jnp.float32) ** 2) * v, axis=0)
    if axis_name is not None:
        count = jax.lax.psum(count, axis_name)
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
    count = jnp.maximum(count, 1.0)
    mean = s1 / count
    var = jnp.maximum(s2 / count - mean**2, 0.0)
    return mean, var
