"""SceneBatch — the typed, statically-padded device contract.

Replaces the reference's 20-tuple batch (reference
dataset/data_loader_ablation.py:373-394, scene_based_collate_fn :429-495) with
one dataclass of padded arrays + masks. Everything the two stages consume is
here; all shapes are compile-time constants chosen from the config's padding
buckets so jit caches stay warm across scenes.

Layout notes vs the reference:
- per-view entries are view-major [V, P_view, ...] instead of concatenated with
  batch indices — XLA prefers the regular layout and a boolean mask;
- `view_point_ids` replaces the (batch_idx, mask) bookkeeping: each view lists
  which scene points it sees (index into the scene point arrays);
- `point2voxel` replaces `inds_reconstruct` (point -> scene-voxel id).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class SceneBatch:
    # --- scene-level (whole scene, padded to max_points / max_voxels) ---
    points: jax.Array          # [P, 3] f32 world coords
    point_valid: jax.Array     # [P] bool
    geom_feats: jax.Array      # [P, 6] f32 rgb(0..1) || normal
    labels: jax.Array          # [P] int32 gt semantic label (ignore where pad)
    voxel_coords: jax.Array    # [M, 3] int32 scene voxel coords (sorted)
    voxel_valid: jax.Array     # [M] bool
    point2voxel: jax.Array     # [P] int32, == M for padding points
    # --- view-level (padded to max_views x max_view_points) ---
    images: jax.Array          # [V, H, W, 3] uint8 (or f32) RGB 0..255
    view_valid: jax.Array      # [V] bool
    view_point_ids: jax.Array  # [V, Pv] int32 scene-point index, == P for pad
    view_point_valid: jax.Array  # [V, Pv] bool
    view_rows: jax.Array       # [V, Pv] int32 pixel row in mask_shape space
    view_cols: jax.Array       # [V, Pv] int32 pixel col


def pad_to(arr: np.ndarray, n: int, axis: int = 0, value=0) -> np.ndarray:
    """Host-side pad/truncate along axis to exactly n."""
    cur = arr.shape[axis]
    if cur == n:
        return arr
    if cur > n:
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(0, n)
        return arr[tuple(sl)]
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, n - cur)
    return np.pad(arr, widths, constant_values=value)
