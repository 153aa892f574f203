"""Segment reductions with static segment counts.

TPU-native replacement for torch_scatter.scatter_mean
(reference models/affinity_module.py:25,1203,1524,1531): XLA's native scatter
via jax.ops.segment_sum, with out-of-range ids dropped — this is how padded
points (mapped to segment id == num_segments) fall out of the reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Sum `data` rows into `num_segments` buckets; ids outside [0, num_segments) drop."""
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=False
    )


def segment_mean(
    data: jax.Array, segment_ids: jax.Array, num_segments: int, eps: float = 1e-12
) -> jax.Array:
    """Mean of `data` rows per segment. Empty segments return 0."""
    totals = segment_sum(data, segment_ids, num_segments)
    ones = jnp.ones((data.shape[0],), dtype=data.dtype)
    counts = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    return totals / jnp.maximum(counts, eps)[:, None]
