"""Exact brute-force k-nearest-neighbour search on TPU.

Replaces the reference's CPU detours — faiss IndexFlatL2 (96-NN graph build,
reference models/affinity_module.py:1159-1165, 1553-1557) and sklearn KDTree
hole-filling (affinity_module.py:604-625, 687-696; run/validation.py:417-430) —
with a tiled distance-matrix + running-top-k merge that stays on device.

Strategy: queries are processed in static tiles; for each tile the database is
scanned in chunks, computing ||q||^2 + ||d||^2 - 2 q.d on the MXU and merging
into a running (k)-best via lax.top_k. All shapes static; invalid (padded)
database rows are pushed to +inf so they never win.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


def _pad_to(x: jax.Array, n: int, axis: int = 0, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@partial(
    jax.jit,
    static_argnames=("k", "query_tile", "db_chunk", "exclude_identical_index"),
)
def knn_search(
    queries: jax.Array,          # [Q, D] f32
    db: jax.Array,               # [N, D] f32
    db_valid: jax.Array,         # [N] bool
    k: int,
    query_ids: Optional[jax.Array] = None,  # [Q] int32 global ids (for self-exclusion)
    exclude_identical_index: bool = False,
    query_tile: int = 1024,
    db_chunk: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Exact k-NN by squared L2. Returns (dists [Q,k], idx [Q,k] int32).

    With ``exclude_identical_index`` and ``query_ids`` set, a database row whose
    index equals the query's id is skipped — the reference's search(K+1)-and-
    drop-self pattern without the extra column.
    """
    Q, D = queries.shape
    N = db.shape[0]
    n_qt = -(-Q // query_tile)
    # Full-row mode: one top_k per query tile over the whole database beats
    # the chunked running-merge on TPU by ~3x (measured: 64 top_k calls of
    # width N vs 512 of width k+chunk) as long as the [tile, N] distance
    # block fits HBM comfortably. lax.map keeps only one tile live at a time.
    if N * query_tile * 4 <= 512 * 1024 * 1024:
        db_chunk = max(db_chunk, N)
    n_dc = -(-N // db_chunk)
    Np = n_dc * db_chunk

    db_p = _pad_to(db, Np)
    dbv_p = _pad_to(db_valid, Np, value=False)
    db_sq = jnp.sum(db_p.astype(jnp.float32) ** 2, axis=-1)  # [Np]

    q_p = _pad_to(queries, n_qt * query_tile)
    qid_p = (
        _pad_to(query_ids, n_qt * query_tile, value=-1)
        if query_ids is not None
        else jnp.full((n_qt * query_tile,), -1, jnp.int32)
    )

    def one_tile(args):
        q, qid = args  # [T, D], [T]
        q = q.astype(jnp.float32)
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)  # [T,1]

        def chunk_dists(start):
            d_rows = jax.lax.dynamic_slice_in_dim(db_p, start, db_chunk)
            d_sq = jax.lax.dynamic_slice_in_dim(db_sq, start, db_chunk)
            v = jax.lax.dynamic_slice_in_dim(dbv_p, start, db_chunk)
            if D <= 4:
                d2 = jnp.zeros((q.shape[0], db_chunk), jnp.float32)
                for j in range(D):
                    diff = q[:, j : j + 1] - d_rows[None, :, j].astype(jnp.float32)
                    d2 = d2 + diff * diff
            else:
                dots = jax.lax.dot_general(
                    q,
                    d_rows.astype(jnp.float32),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                d2 = q_sq + d_sq[None, :] - 2.0 * dots
            idx = start + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
            bad = ~v[None, :]
            if exclude_identical_index:
                bad = bad | (idx == qid[:, None])
            return jnp.where(bad, _INF, d2), idx

        if n_dc == 1:  # full-row fast path: single top_k, no running merge
            d2, idx = chunk_dists(0)
            neg_top, arg = jax.lax.top_k(-d2, k)
            return -neg_top, jnp.take_along_axis(idx, arg, axis=1)

        def scan_chunk(carry, c):
            best_d, best_i = carry
            d2, idx = chunk_dists(c * db_chunk)
            cat_d = jnp.concatenate([best_d, d2], axis=1)
            cat_i = jnp.concatenate([best_i, idx], axis=1)
            neg_top, arg = jax.lax.top_k(-cat_d, k)
            return (-neg_top, jnp.take_along_axis(cat_i, arg, axis=1)), None

        init = (
            jnp.full((query_tile, k), _INF),
            jnp.full((query_tile, k), -1, jnp.int32),
        )
        (best_d, best_i), _ = jax.lax.scan(
            scan_chunk, init, jnp.arange(n_dc, dtype=jnp.int32)
        )
        return best_d, best_i

    q_tiles = q_p.reshape(n_qt, query_tile, D)
    id_tiles = qid_p.reshape(n_qt, query_tile)
    dists, idx = jax.lax.map(one_tile, (q_tiles, id_tiles))
    dists = dists.reshape(-1, k)[:Q]
    idx = idx.reshape(-1, k)[:Q]
    return dists, jnp.maximum(idx, 0)  # clamp unfilled slots to 0 for safe gathers


@partial(
    jax.jit,
    static_argnames=("k", "radius", "num_candidates", "query_tile"),
)
def knn_self_grid(
    coords: jax.Array,        # [M, 3] integer voxel coords (any numeric dtype)
    valid: jax.Array,         # [M] bool
    k: int,
    radius: int = 12,
    num_candidates: int = 4096,
    query_tile: int = 1024,
) -> Tuple[jax.Array, jax.Array]:
    """Exact self-kNN over integer voxel coords via Morton-tiled bbox pruning.

    Measured on v5e at M=65536/k=96: the full-row ``knn_search`` is entirely
    lax.top_k-bound (1445 of 1535 ms), and top_k cost collapses with row
    width (width 4096 runs 12x faster than 65536). So queries are processed
    in Morton-order tiles (spatially compact boxes); each tile's candidate
    set is every voxel inside the tile's bbox dilated by ``radius``,
    compacted ONCE per tile (cumsum + searchsorted — no per-query work), and
    the k-NN top_k runs at width ``num_candidates`` instead of M.

    Exactness: any point within ``radius`` of a query lies inside the
    dilated bbox, so if the query's k-th neighbor distance satisfies
    d_k <= radius the candidate set provably contained all true neighbors.
    Tiles where any query fails that certificate — or whose candidate count
    overflows ``num_candidates`` — recompute against the FULL row
    (lax.cond), so the result equals ``knn_search`` up to equal-distance
    ties on every input. Sparse scenes degrade toward full-row cost; dense
    surface scenes (the real workload) pass the certificate almost always.

    Returns (dists [M, k] f32 with +inf padding, idx [M, k] int32 clamped),
    self-excluded — a drop-in for ``knn_search(c, c, valid, k,
    exclude_identical_index=True)``.
    """
    from geopurify_tpu.ops.morton import morton_code

    M = coords.shape[0]
    T = query_tile
    C = num_candidates
    n_t = -(-M // T)
    Mp = n_t * T
    cf = coords.astype(jnp.float32)
    c_sq = jnp.sum(cf * cf, axis=-1)
    r2 = jnp.float32(radius) * jnp.float32(radius)

    # Morton-order the QUERIES only (db stays in caller order; indices are
    # caller-order throughout). Invalid rows sort last.
    code = jnp.where(valid, morton_code(jnp.maximum(coords, 0).astype(jnp.int32)),
                     jnp.int32(2**30))
    perm = jnp.argsort(code)
    perm_p = _pad_to(perm, Mp, value=M - 1 if M else 0).astype(jnp.int32)
    qv_p = _pad_to(valid[perm], Mp, value=False)

    def one_tile(args):
        qid, qv = args                         # [T] global ids, [T] valid
        q = cf[qid]                            # [T, 3]
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)

        def full_row():
            dots = jax.lax.dot_general(
                q, cf, dimension_numbers=(((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            d2 = q_sq + c_sq[None, :] - 2.0 * dots
            cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
            bad = (~valid)[None, :] | (cols == qid[:, None])
            d2 = jnp.where(bad, _INF, d2)
            neg, arg = jax.lax.top_k(-d2, k)
            return -neg, arg

        # tile bbox (valid queries only), dilated by radius
        qvc = qv[:, None]
        lo = jnp.min(jnp.where(qvc, q, jnp.float32(jnp.inf)), axis=0) - radius
        hi = jnp.max(jnp.where(qvc, q, -jnp.float32(jnp.inf)), axis=0) + radius
        in_box = jnp.all((cf >= lo[None]) & (cf <= hi[None]), axis=-1) & valid
        cnt = jnp.cumsum(in_box.astype(jnp.int32))
        total = cnt[-1]
        # positions of the 1st..C-th in-box point (searchsorted on the
        # monotone count — one pass for the whole tile, not per query)
        pos = jnp.searchsorted(cnt, jnp.arange(1, C + 1, dtype=jnp.int32))
        cand_idx = jnp.clip(pos, 0, max(M - 1, 0)).astype(jnp.int32)
        cand_ok = jnp.arange(C) < total

        def pruned():
            cd = cf[cand_idx]                  # [C, 3]
            dots = jax.lax.dot_general(
                q, cd, dimension_numbers=(((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            d2 = q_sq + c_sq[cand_idx][None, :] - 2.0 * dots
            bad = (~cand_ok)[None, :] | (cand_idx[None, :] == qid[:, None])
            d2 = jnp.where(bad, _INF, d2)
            neg, loc = jax.lax.top_k(-d2, k)
            return -neg, cand_idx[loc]

        pd, pi = pruned()
        # certificate: every valid query's k-th distance within radius (a
        # tile with < k+1 candidates yields +inf -> fails -> full row)
        certified = jnp.all(jnp.where(qv, pd[:, k - 1] <= r2, True))
        ok = certified & (total <= C)
        return jax.lax.cond(ok, lambda: (pd, pi), full_row)

    q_tiles = perm_p.reshape(n_t, T)
    v_tiles = qv_p.reshape(n_t, T)
    dists_s, idx_s = jax.lax.map(one_tile, (q_tiles, v_tiles))
    dists_s = dists_s.reshape(Mp, k)[: M]
    idx_s = idx_s.reshape(Mp, k)[: M]
    # scatter rows back to caller order
    dists = jnp.zeros((M, k), jnp.float32).at[perm_p[:Mp][: M]].set(dists_s)
    idx = jnp.zeros((M, k), jnp.int32).at[perm_p[:Mp][: M]].set(idx_s)
    return dists, jnp.maximum(idx, 0)


def nearest_fill(
    features: jax.Array,     # [N, C]
    coords: jax.Array,       # [N, D]
    has_value: jax.Array,    # [N] bool — rows with real features
    valid: jax.Array,        # [N] bool — padding mask
    query_tile: int = 1024,
    db_chunk: int = 8192,
) -> jax.Array:
    """Fill rows without features from their nearest (by coords) row that has one.

    Device-side replacement for the per-view / global KDTree fills
    (affinity_module.py:604-625, 687-696). All rows are treated as queries; rows
    that already have a value keep it (select at the end), so shapes stay static.
    """
    db_valid = has_value & valid
    _, idx = knn_search(
        coords, coords, db_valid, k=1, query_tile=query_tile, db_chunk=db_chunk
    )
    donated = features[idx[:, 0]]
    keep = has_value[:, None]
    return jnp.where(keep, features, donated)
