"""Voxel quantization — hash-dedup of integer voxel coordinates.

Host (numpy) path reproduces the semantics of the reference voxelizer
(reference dataset/voxelization_utils.py:6-103, dataset/voxelizer.py:81-132):
FNV-1a 64-bit hashing of floored coordinates, `np.unique` dedup returning
first-occurrence indices (`inds`) and the point->voxel map (`inds_reverse`).

Device (JAX) path is TPU-native: sort-based unique over linearized voxel keys
with **static shapes** — callers supply `max_voxels` and get back padded voxel
arrays plus a validity count. Voxel ids are assigned in ascending key order so
host and device paths agree on `inds_reverse` up to the hash-vs-linear key
ordering (tests pin the exact correspondence).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


# ---------------------------------------------------------------------------
# Host (numpy) reference path — used by the data pipeline and as test oracle.
# ---------------------------------------------------------------------------

def fnv_hash_vec(arr: np.ndarray) -> np.ndarray:
    """FNV-1a 64-bit hash per row of an integer array (ref voxelization_utils.py:6-18)."""
    assert arr.ndim == 2
    arr = arr.astype(np.uint64, copy=True)
    hashed = np.full(arr.shape[0], _FNV_OFFSET, dtype=np.uint64)
    for j in range(arr.shape[1]):
        hashed *= _FNV_PRIME
        hashed = np.bitwise_xor(hashed, arr[:, j])
    return hashed


def ravel_hash_vec(arr: np.ndarray) -> np.ndarray:
    """Collision-free raveled key per row (ref voxelization_utils.py:21-35)."""
    assert arr.ndim == 2
    arr = arr.copy()
    arr -= arr.min(0)
    arr = arr.astype(np.uint64, copy=False)
    arr_max = arr.max(0).astype(np.uint64) + 1
    keys = np.zeros(arr.shape[0], dtype=np.uint64)
    for j in range(arr.shape[1] - 1):
        keys += arr[:, j]
        keys *= arr_max[j + 1]
    keys += arr[:, -1]
    return keys


def sparse_quantize_np(
    coords: np.ndarray,
    quantization_size: float = 1.0,
    hash_type: str = "fnv",
) -> Tuple[np.ndarray, np.ndarray]:
    """Dedup floored coordinates; returns (inds, inds_reverse).

    ``inds`` selects one representative point per voxel (first occurrence,
    ordered by ascending hash key); ``inds_reverse`` maps every point to its
    voxel id. Matches reference sparse_quantize(..., return_index=True)
    (voxelization_utils.py:38-103).
    """
    discrete = np.floor(coords / quantization_size)
    if hash_type == "fnv" and discrete.min() >= 0:
        # native fast path (same semantics on the non-negative coords the
        # voxelizer produces; tests pin equivalence). Negative coords keep the
        # numpy path: float->uint64 wrap there differs from int64 casting.
        try:
            from geopurify_tpu import native

            if native.available():
                return native.fnv_voxelize(discrete.astype(np.int64))
        except Exception:
            pass
    key = fnv_hash_vec(discrete) if hash_type == "fnv" else ravel_hash_vec(discrete)
    _, inds, inds_reverse = np.unique(key, return_index=True, return_inverse=True)
    return inds, inds_reverse


class VoxelizeResult(NamedTuple):
    voxel_coords: np.ndarray       # [M, 3] float voxel-grid coords (shifted to >= 0)
    feats: np.ndarray              # [M, C] representative features
    labels: Optional[np.ndarray]   # [M] representative labels
    inds_reverse: np.ndarray       # [N] point -> voxel id
    inds: np.ndarray               # [M] voxel -> representative point id


class Voxelizer:
    """Random rigid augmentation + floor-quantize + dedup (ref dataset/voxelizer.py).

    Augmentation: per-axis random rotation (composed in shuffled order), uniform
    scale jitter on 1/voxel_size, then shift so the min coord sits at 0. Normal
    channels feats[:, 3:6] are rotated by the same rotation.
    """

    def __init__(
        self,
        voxel_size: float = 1.0,
        use_augmentation: bool = False,
        scale_augmentation_bound: Optional[Tuple[float, float]] = None,
        rotation_augmentation_bound: Optional[Tuple] = None,
        ignore_label: int = 255,
        rng: Optional[np.random.Generator] = None,
    ):
        self.voxel_size = voxel_size
        self.use_augmentation = use_augmentation
        self.scale_augmentation_bound = scale_augmentation_bound
        self.rotation_augmentation_bound = rotation_augmentation_bound
        self.ignore_label = ignore_label
        self.rng = rng or np.random.default_rng()

    @staticmethod
    def _axis_rot(axis: np.ndarray, theta: float) -> np.ndarray:
        """Rodrigues rotation about a unit axis."""
        axis = axis / np.linalg.norm(axis)
        K = np.cross(np.eye(3), axis)
        return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)

    def get_transformation_matrix(self) -> Tuple[np.ndarray, np.ndarray]:
        vox, rot = np.eye(4), np.eye(4)
        rot3 = np.eye(3)
        if self.use_augmentation and self.rotation_augmentation_bound is not None:
            mats = []
            for axis_ind, bound in enumerate(self.rotation_augmentation_bound):
                theta = self.rng.uniform(*bound) if bound is not None else 0.0
                axis = np.zeros(3)
                axis[axis_ind] = 1.0
                mats.append(self._axis_rot(axis, theta))
            self.rng.shuffle(mats)
            rot3 = mats[0] @ mats[1] @ mats[2]
        rot[:3, :3] = rot3
        scale = 1.0 / self.voxel_size
        if self.use_augmentation and self.scale_augmentation_bound is not None:
            scale *= self.rng.uniform(*self.scale_augmentation_bound)
        np.fill_diagonal(vox[:3, :3], scale)
        return vox, rot

    def voxelize(
        self,
        coords: np.ndarray,
        feats: np.ndarray,
        labels: Optional[np.ndarray] = None,
    ) -> VoxelizeResult:
        assert coords.ndim == 2 and coords.shape[1] == 3
        M_v, M_r = self.get_transformation_matrix()
        rigid = (M_r @ M_v) if self.use_augmentation else M_v
        homo = np.hstack([coords, np.ones((coords.shape[0], 1), dtype=coords.dtype)])
        coords_aug = np.floor(homo @ rigid.T[:, :3])
        coords_aug = np.floor(coords_aug - coords_aug.min(0))

        inds, inds_reverse = sparse_quantize_np(coords_aug)
        vox_coords = coords_aug[inds]
        vox_feats = feats[inds].copy()
        if vox_feats.shape[1] > 6:
            # rotate normal channels by the augmentation rotation (voxelizer.py:122-123)
            vox_feats[:, 3:6] = vox_feats[:, 3:6] @ M_r[:3, :3].T
        vox_labels = labels[inds] if labels is not None else None
        return VoxelizeResult(vox_coords, vox_feats, vox_labels, inds_reverse, inds)


# ---------------------------------------------------------------------------
# Device (JAX) path — static-shape sort-based unique.
# ---------------------------------------------------------------------------

class DeviceVoxels(NamedTuple):
    voxel_coords: jax.Array   # [max_voxels, 3] int32, padded with 0
    point2voxel: jax.Array    # [N] int32 voxel id per point (padding points -> max_voxels-1 slot is avoided; they map to a dead voxel id = num_voxels.. clamped)
    voxel_valid: jax.Array    # [max_voxels] bool
    num_voxels: jax.Array     # [] int32


def voxelize_points(
    coords: jax.Array,
    valid: jax.Array,
    max_voxels: int,
) -> DeviceVoxels:
    """TPU-native sparse quantize over already-floored integer coords.

    Args:
      coords: [N, 3] int32, non-negative (caller shifts min to 0).
      valid:  [N] bool validity mask for padded points.
      max_voxels: static voxel budget M. Voxels beyond M are dropped (their
        points keep voxel id >= M; downstream ops mask on ``point2voxel < num_voxels``).

    Returns DeviceVoxels with voxel ids assigned in ascending lexicographic
    coordinate order — deterministic and shared with the sparse-conv neighbor
    table builder, which requires key-sorted voxels. Lexsort over int32 columns
    avoids any 64-bit key linearization (x64 stays disabled on TPU).
    """
    n = coords.shape[0]
    # primary key last in jnp.lexsort: sort by (valid desc, x, y, z)
    order = jnp.lexsort(
        (coords[:, 2], coords[:, 1], coords[:, 0], (~valid).astype(jnp.int32))
    )
    sorted_coords = coords[order]
    is_valid_sorted = valid[order]
    prev = jnp.concatenate(
        [jnp.full((1, 3), -1, coords.dtype), sorted_coords[:-1]], axis=0
    )
    differs = jnp.any(sorted_coords != prev, axis=1)
    new_voxel = differs & is_valid_sorted
    voxel_id_sorted = jnp.cumsum(new_voxel.astype(jnp.int32)) - 1  # [N]
    num_voxels = jnp.maximum(voxel_id_sorted[-1] + 1, 0)
    num_voxels = jnp.where(is_valid_sorted.any(), num_voxels, 0)

    # scatter voxel ids back to original point order
    point2voxel = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.where(is_valid_sorted, voxel_id_sorted, max_voxels)
    )
    point2voxel = jnp.where(valid, point2voxel, max_voxels)

    # representative (first-in-sorted-order) coords per voxel
    voxel_coords = jnp.zeros((max_voxels, 3), coords.dtype)
    write_id = jnp.where(new_voxel & (voxel_id_sorted < max_voxels), voxel_id_sorted, max_voxels)
    # drop-out-of-budget scatter (mode='drop' ignores index == max_voxels)
    voxel_coords = voxel_coords.at[write_id].set(coords[order], mode="drop")
    voxel_valid = (
        jnp.arange(max_voxels, dtype=jnp.int32) < jnp.minimum(num_voxels, max_voxels)
    )
    return DeviceVoxels(voxel_coords, point2voxel, voxel_valid, num_voxels.astype(jnp.int32))
