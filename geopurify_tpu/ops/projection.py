"""Point-cloud -> image projection with depth occlusion test.

TPU-native (jit, static-shape) equivalent of the reference's host-side mappers
(reference models/utils/fusion_util.py:36-147): pinhole-project world points
through world->camera, round to pixels, reject out-of-bounds (with a
``cut_bound`` margin) and occluded points (|depth(px) - z| > vis_thres * depth(px)).

Returns the (row, col) pixel index per point plus a visibility mask — the
reference's N×3 ``mapping`` split into typed arrays.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PointImageMapping(NamedTuple):
    rows: jax.Array     # [N] int32 pixel row (y); 0 where invisible
    cols: jax.Array     # [N] int32 pixel col (x); 0 where invisible
    visible: jax.Array  # [N] bool
    depth_cam: jax.Array  # [N] f32 point depth in camera frame


def adjust_intrinsic_for_dim(
    intrinsic: np.ndarray, image_dim: Tuple[int, int]
) -> np.ndarray:
    """Rescale a pinhole intrinsic whose principal point encodes the original
    resolution, to a target (W, H) — the reference's constructor-time rescale
    (fusion_util.py:91-99)."""
    K = np.array(intrinsic, dtype=np.float64).copy()
    scale_x = image_dim[0] / (K[0, 2] * 2)
    scale_y = image_dim[1] / (K[1, 2] * 2)
    K[0, 0] *= scale_x
    K[1, 1] *= scale_y
    K[0, 2] = image_dim[0] / 2
    K[1, 2] = image_dim[1] / 2
    return K


@partial(jax.jit, static_argnames=("image_dim", "cut_bound"))
def compute_point_image_mapping(
    points: jax.Array,            # [N, 3] world coords
    valid: jax.Array,             # [N] bool padding mask
    world_to_camera: jax.Array,   # [4, 4]
    intrinsic: jax.Array,         # [3, 3] or [4, 4]
    depth: Optional[jax.Array],   # [H, W] metres, or None (front-facing test only)
    image_dim: Tuple[int, int],   # (W, H)
    cut_bound: int = 0,
    vis_thres: float = 0.05,
) -> PointImageMapping:
    """Occlusion-tested projection (semantics of fusion_util.py:99-147)."""
    W, H = image_dim
    n = points.shape[0]
    homo = jnp.concatenate([points, jnp.ones((n, 1), points.dtype)], axis=1)  # [N,4]
    p_cam = homo @ world_to_camera.T                                          # [N,4]
    z = p_cam[:, 2]
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = jnp.round(p_cam[:, 0] * fx / safe_z + cx).astype(jnp.int32)  # col
    v = jnp.round(p_cam[:, 1] * fy / safe_z + cy).astype(jnp.int32)  # row

    inside = (
        (u >= cut_bound)
        & (v >= cut_bound)
        & (u < W - cut_bound)
        & (v < H - cut_bound)
        & valid
    )
    if depth is not None:
        uc = jnp.clip(u, 0, W - 1)
        vc = jnp.clip(v, 0, H - 1)
        d_px = depth[vc, uc]
        occl_ok = jnp.abs(d_px - z) <= vis_thres * d_px
        visible = inside & occl_ok & (d_px > 0)
    else:
        visible = inside & (z > 0)

    rows = jnp.where(visible, v, 0)
    cols = jnp.where(visible, u, 0)
    return PointImageMapping(rows, cols, visible, z)
