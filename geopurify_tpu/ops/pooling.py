"""Geometry-guided pooling — the Stage-2 inference core.

TPU-native re-design of the reference's faiss-kNN + torch.sparse.mm loop
(reference models/affinity_module.py:1490-1608): build a K=96 neighbor graph
over voxel coordinates, weight edges by sharpened softmax of student-embedding
cosine affinity, then run 1+18 rounds of fixed-degree weighted aggregation
F <- A @ F. Because every row has exactly K neighbors the "sparse" matmul is a
regular gather + weighted-sum — no CSR, no host round-trips, fully jittable.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from geopurify_tpu.ops.knn import knn_search


def build_affinity_graph(
    embeddings: jax.Array,    # [M, E] student embeddings (unnormalized ok)
    voxel_coords: jax.Array,  # [M, 3] (float or int)
    valid: jax.Array,         # [M] bool
    k: int = 96,
    sharpen: float = 20.0,
    query_tile: int = 1024,
    db_chunk: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (neighbor_idx [M,k] int32, weights [M,k] f32 row-stochastic).

    Neighbors by exact spatial kNN excluding self; edge weight
    softmax_k(cos(e_i, e_j) * sharpen) (affinity_module.py:1553-1572).
    Invalid rows get zero weights.
    """
    M = embeddings.shape[0]
    coords_f = voxel_coords.astype(jnp.float32)
    ids = jnp.arange(M, dtype=jnp.int32)
    _, nbr = knn_search(
        coords_f, coords_f, valid, k=k,
        query_ids=ids, exclude_identical_index=True,
        query_tile=query_tile, db_chunk=db_chunk,
    )
    e = embeddings.astype(jnp.float32)
    e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
    aff = jnp.einsum("md,mkd->mk", e, e[nbr])          # cosine, [M,k]
    # neighbors of invalid rows / invalid neighbors: never selected since
    # knn masks them; still, guard the softmax numerically.
    w = jax.nn.softmax(aff * sharpen, axis=-1)
    w = jnp.where(valid[:, None], w, 0.0)
    return nbr, w


def fixed_degree_spmm(
    weights: jax.Array,   # [M, K]
    nbr: jax.Array,       # [M, K] int32
    feats: jax.Array,     # [M, C]
    row_tile: int = 2048,
) -> jax.Array:
    """F'[i] = sum_k w[i,k] * F[nbr[i,k]] — tiled gather + weighted sum.

    Row tiles bound the gathered intermediate to [row_tile, K, C] so HBM
    pressure stays flat regardless of M.
    """
    M, C = feats.shape
    K = nbr.shape[1]
    n_t = -(-M // row_tile)
    Mp = n_t * row_tile
    w_p = jnp.pad(weights, ((0, Mp - M), (0, 0)))
    n_p = jnp.pad(nbr, ((0, Mp - M), (0, 0)))

    def one_tile(args):
        w, nb = args                       # [T,K], [T,K]
        gathered = feats[nb]               # [T,K,C]
        return jnp.einsum(
            "tk,tkc->tc", w, gathered.astype(jnp.float32),
        ).astype(feats.dtype)

    out = jax.lax.map(
        one_tile, (w_p.reshape(n_t, row_tile, K), n_p.reshape(n_t, row_tile, K))
    )
    return out.reshape(Mp, C)[:M]


@partial(jax.jit, static_argnames=("num_iterations", "row_tile", "compute_dtype"))
def iterate_pooling(
    weights: jax.Array,
    nbr: jax.Array,
    feats: jax.Array,
    num_iterations: int = 19,
    row_tile: int = 2048,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Apply F <- A @ F ``num_iterations`` times (1 + 18 in the reference).

    The gathered neighbor features ride HBM in ``compute_dtype`` (bf16 halves
    the 19x gather traffic, the per-row weighted sum still accumulates in f32
    inside fixed_degree_spmm); row-stochastic averaging keeps values in range
    so bf16's 8-bit mantissa costs <1e-2 relative error over 19 rounds —
    well under the downstream cosine-argmax decision margins.
    """
    out_dtype = feats.dtype

    def body(_, f):
        return fixed_degree_spmm(weights, nbr, f, row_tile=row_tile)

    out = jax.lax.fori_loop(0, num_iterations, body, feats.astype(compute_dtype))
    return out.astype(out_dtype)


def geometry_guided_pooling(
    embeddings: jax.Array,    # [M, E]
    feats: jax.Array,         # [M, C] voxel input features (semantic || geometric)
    voxel_coords: jax.Array,  # [M, 3]
    valid: jax.Array,         # [M]
    k: int = 96,
    sharpen: float = 20.0,
    num_iterations: int = 19,
) -> jax.Array:
    """Full Stage-2 smoothing: graph build + iterated aggregation."""
    nbr, w = build_affinity_graph(embeddings, voxel_coords, valid, k=k, sharpen=sharpen)
    return iterate_pooling(w, nbr, feats, num_iterations=num_iterations)
