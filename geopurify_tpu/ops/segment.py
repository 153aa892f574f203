"""Segment reductions with static segment counts.

TPU-native replacement for torch_scatter.scatter_mean
(reference models/affinity_module.py:25,1203,1524,1531): XLA's native scatter
via jax.ops.segment_sum, with out-of-range ids dropped — this is how padded
points (mapped to segment id == num_segments) fall out of the reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                sorted_hint: str = "auto") -> jax.Array:
    """Sum `data` rows into `num_segments` buckets; ids outside [0, num_segments) drop.

    ``sorted_hint``:
      'auto'  — runtime-gate on a monotonicity check: sorted scatters measure
                ~1.6x faster on v5e (130 vs 204 ms at 262k rows — ROADMAP),
                and point2voxel IS non-decreasing whenever points ride in
                voxel order (the bench scenes; padding ids == num_segments
                sort last). The check is one [N] compare + reduce; the hint
                inside each lax.cond branch is truthful by construction.
      'never' — plain unsorted scatter (skip the check where ids are known
                shuffled, e.g. cross-view fusion).
    """
    if sorted_hint == "auto" and segment_ids.shape[0] > 4096:
        is_sorted = jnp.all(segment_ids[1:] >= segment_ids[:-1])
        return jax.lax.cond(
            is_sorted,
            lambda: jax.ops.segment_sum(
                data, segment_ids, num_segments=num_segments,
                indices_are_sorted=True,
            ),
            lambda: jax.ops.segment_sum(
                data, segment_ids, num_segments=num_segments,
                indices_are_sorted=False,
            ),
        )
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=False
    )


def segment_mean(
    data: jax.Array, segment_ids: jax.Array, num_segments: int, eps: float = 1e-12,
    sorted_hint: str = "auto",
) -> jax.Array:
    """Mean of `data` rows per segment. Empty segments return 0."""
    totals = segment_sum(data, segment_ids, num_segments, sorted_hint=sorted_hint)
    ones = jnp.ones((data.shape[0],), dtype=data.dtype)
    counts = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    return totals / jnp.maximum(counts, eps)[:, None]
