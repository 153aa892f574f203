"""Voxelizer: host path matches the reference semantics; device path matches host."""

import jax.numpy as jnp
import numpy as np
import pytest

from geopurify_tpu.ops.voxelize import (
    Voxelizer,
    fnv_hash_vec,
    sparse_quantize_np,
    voxelize_points,
)


def test_fnv_hash_matches_reference_constants():
    # FNV-1a over a single zero row: offset * prime ^ 0, three times
    h = fnv_hash_vec(np.zeros((1, 3), dtype=np.int64))
    expected = np.uint64(14695981039346656037)
    for _ in range(3):
        expected = expected * np.uint64(1099511628211)
        expected ^= np.uint64(0)
    assert h[0] == expected


def test_sparse_quantize_dedup_and_reverse(rng):
    coords = rng.integers(0, 8, size=(500, 3)).astype(np.float64)
    inds, inds_reverse = sparse_quantize_np(coords)
    vox = coords[inds]
    # every point maps back to a voxel with identical floored coords
    assert np.all(np.floor(vox[inds_reverse]) == np.floor(coords))
    # voxels are unique
    keys = {tuple(v) for v in vox}
    assert len(keys) == len(inds)


def test_voxelizer_shifts_and_quantizes(rng):
    coords = rng.uniform(-4, 4, size=(1000, 3))
    feats = rng.uniform(0, 1, size=(1000, 9))
    labels = rng.integers(0, 5, size=1000)
    v = Voxelizer(voxel_size=0.05)
    res = v.voxelize(coords, feats, labels)
    assert res.voxel_coords.min() >= 0
    assert res.inds_reverse.shape == (1000,)
    assert res.voxel_coords.shape[0] == res.feats.shape[0] == res.labels.shape[0]
    np.testing.assert_allclose(
        res.feats[res.inds_reverse][0], feats[res.inds][res.inds_reverse][0]
    )


def test_voxelizer_rotates_normals(rng):
    coords = rng.uniform(0, 1, size=(200, 3))
    feats = np.concatenate(
        [rng.uniform(size=(200, 3)), np.tile([0.0, 0.0, 1.0], (200, 1)), rng.uniform(size=(200, 1))],
        axis=1,
    )
    v = Voxelizer(
        voxel_size=0.05,
        use_augmentation=True,
        rotation_augmentation_bound=((-np.pi, np.pi), None, None),
        rng=np.random.default_rng(3),
    )
    res = v.voxelize(coords, feats, None)
    # normals stay unit length after rotation
    np.testing.assert_allclose(np.linalg.norm(res.feats[:, 3:6], axis=1), 1.0, atol=1e-6)


@pytest.mark.parametrize("n,max_voxels", [(512, 512), (1000, 2048)])
def test_device_voxelize_matches_host(rng, n, max_voxels):
    coords = rng.integers(0, 10, size=(n, 3)).astype(np.int32)
    valid = np.ones(n, bool)
    valid[-17:] = False  # padding tail
    dev = voxelize_points(jnp.asarray(coords), jnp.asarray(valid), max_voxels=max_voxels)

    host_inds, host_rev = sparse_quantize_np(coords[valid].astype(np.float64))
    n_host = len(host_inds)
    assert int(dev.num_voxels) == n_host

    p2v = np.asarray(dev.point2voxel)
    vox = np.asarray(dev.voxel_coords)
    # each valid point's voxel has its floored coords
    sel = p2v[valid]
    assert sel.max() < n_host
    np.testing.assert_array_equal(vox[sel], coords[valid])
    # padded points map out of range
    assert np.all(p2v[~valid] == max_voxels)
    # device groups points identically to host (same-partition check)
    a = sel
    b = host_rev
    for grp in range(n_host):
        members = np.where(b == grp)[0]
        assert len(set(a[members])) == 1


def test_device_voxelize_budget_overflow(rng):
    coords = rng.integers(0, 50, size=(4096, 3)).astype(np.int32)
    valid = np.ones(4096, bool)
    dev = voxelize_points(jnp.asarray(coords), jnp.asarray(valid), max_voxels=64)
    # voxels beyond budget are dropped but ids still count the true total
    assert int(dev.num_voxels) >= 64
    assert int(dev.voxel_valid.sum()) == 64
