"""Host-side data pipeline: PLY IO, cameras, augmentations, SceneDataset."""

import json
import os

import numpy as np
import pytest

from geopurify_tpu.data.ply import (
    load_point_ply,
    read_ply,
    vertex_normals,
    write_ply_points,
)


def test_ply_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (100, 3)).astype(np.uint8)
    nrm = rng.normal(size=(100, 3)).astype(np.float32)
    p = str(tmp_path / "pts.ply")
    write_ply_points(p, xyz, rgb, nrm)
    out = load_point_ply(p)
    np.testing.assert_allclose(out["xyz"], xyz, rtol=1e-6)
    np.testing.assert_allclose(out["rgb"], rgb.astype(np.float32) / 255.0)
    np.testing.assert_allclose(out["normal"], nrm, rtol=1e-6)


def test_vertex_normals_flat_plane():
    # unit square in z=0 plane, two triangles -> all normals +z
    xyz = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    n = vertex_normals(xyz, faces)
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-6)


def test_ascii_ply(tmp_path):
    txt = """ply
format ascii 1.0
element vertex 2
property float x
property float y
property float z
end_header
0.0 1.0 2.0
3.0 4.0 5.0
"""
    p = str(tmp_path / "a.ply")
    with open(p, "w") as f:
        f.write(txt)
    data = read_ply(p)
    np.testing.assert_allclose(data["vertex"]["x"], [0.0, 3.0])


# ---------------------------------------------------------------------------
# cameras
# ---------------------------------------------------------------------------

def _make_scannet_scene_dir(tmp_path, n_frames=5, stride=1, w=64, h=48):
    from PIL import Image

    d = tmp_path / "scene0000_00"
    for sub in ("pose", "color", "depth", "intrinsic"):
        os.makedirs(d / sub, exist_ok=True)
    K = np.array([[50.0, 0, w / 2, 0], [0, 50.0, h / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    np.savetxt(d / "intrinsic" / "intrinsic_color.txt", K)
    for i in range(n_frames):
        pose = np.eye(4)
        pose[:3, 3] = [i * 0.1, 0, -3]
        np.savetxt(d / "pose" / f"{i}.txt", pose)
        Image.new("RGB", (w, h), (100, 120, 140)).save(d / "color" / f"{i}.jpg")
        depth = (np.full((h, w), 3000)).astype(np.uint16)
        Image.fromarray(depth, mode="I;16").save(d / "depth" / f"{i}.png")
    return str(d)


def test_scannet_cameras(tmp_path):
    from geopurify_tpu.data.cameras import load_scene_cameras

    d = _make_scannet_scene_dir(tmp_path, n_frames=6)
    cams = load_scene_cameras(d, frame_stride=2)
    assert len(cams) == 3
    assert cams[0].depth_path is not None
    # invalid pose gets skipped
    np.savetxt(os.path.join(d, "pose", "0.txt"), np.full((4, 4), np.inf))
    cams = load_scene_cameras(d, frame_stride=2)
    assert len(cams) == 2


def test_blender_cameras(tmp_path):
    from geopurify_tpu.data.cameras import load_scene_cameras

    meta = {
        "camera_angle_x": 0.8,
        "frames": [
            {"file_path": "r_0", "transform_matrix": np.eye(4).tolist()},
        ],
    }
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump(meta, f)
    cams = load_scene_cameras(str(tmp_path))
    assert len(cams) == 1


# ---------------------------------------------------------------------------
# augmentations
# ---------------------------------------------------------------------------

def test_augmentations_shapes_and_ranges(rng):
    from geopurify_tpu.data.augment import default_train_augmentations

    aug = default_train_augmentations()
    coords = rng.normal(size=(500, 3)).astype(np.float32) * 2
    feats = np.concatenate(
        [rng.uniform(0, 255, (500, 3)), rng.normal(size=(500, 3))], axis=1
    ).astype(np.float32)
    labels = rng.integers(0, 5, 500).astype(np.int32)
    c2, f2, l2 = aug(coords, feats, labels, rng)
    assert c2.shape == coords.shape and f2.shape == feats.shape
    assert f2[:, :3].min() >= 0 and f2[:, :3].max() <= 255
    np.testing.assert_array_equal(l2, labels)
    # normals stay roughly unit under flips (sign changes only)
    np.testing.assert_allclose(
        np.abs(f2[:, 3:6]), np.abs(feats[:, 3:6]), atol=1e-5
    )


def test_hue_saturation_identity_when_zero(rng):
    from geopurify_tpu.data.augment import HueSaturationTranslation

    t = HueSaturationTranslation(hue_max=0.0, saturation_max=0.0)
    feats = rng.uniform(0, 255, (100, 3)).astype(np.float32)
    _, f2, _ = t(None, feats, None, rng)
    np.testing.assert_allclose(f2, feats, atol=1.0)


# ---------------------------------------------------------------------------
# mapping + SceneDataset end-to-end on a synthetic on-disk scene
# ---------------------------------------------------------------------------

def test_compute_mapping_occlusion():
    from geopurify_tpu.data.loaders import compute_mapping_np

    # two points along +z, camera at origin looking down z
    pts = np.array([[0, 0, 2.0], [0, 0, 4.0]])
    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    depth = np.full((48, 64), 2.0)
    rows, cols, vis = compute_mapping_np(
        pts, np.eye(4), K, depth, (64, 48), cut_bound=0
    )
    assert vis[0] and not vis[1]  # the far point is occluded
    assert rows[0] == 24 and cols[0] == 32


@pytest.fixture
def fake_dataset(tmp_path, rng):
    import torch

    n = 400
    xyz = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    xyz[:, 2] += 0.0
    rgb_m11 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    labels = rng.integers(0, 4, n).astype(np.int64)

    root3d = tmp_path / "3d"
    root2d = tmp_path / "2d"
    os.makedirs(root3d)
    os.makedirs(root2d)
    sid = "scene0000_00"
    torch.save((xyz, rgb_m11, labels), root3d / f"{sid}_vh_clean_2.pth")
    scene2d = _make_scannet_scene_dir(root2d, n_frames=3, w=64, h=48)
    os.rename(scene2d, root2d / sid)
    with open(tmp_path / "train_list.txt", "w") as f:
        f.write(sid + "\n")
    return tmp_path, sid


def test_scene_dataset_batch(fake_dataset):
    import dataclasses

    from geopurify_tpu.config import GeoPurifyConfig
    from geopurify_tpu.data.loaders import SceneDataset

    tmp_path, sid = fake_dataset
    cfg = GeoPurifyConfig()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data,
            data_root=str(tmp_path / "3d"), data_root_2d=str(tmp_path / "2d"),
            train_scene_list=str(tmp_path / "train_list.txt"),
            max_points=512, max_voxels=512, max_views=4, max_view_points=256,
            voxel_size=0.1,
        ),
        fusion=dataclasses.replace(
            cfg.fusion, img_dim=(64, 48), frame_stride=1,
            min_visible_points=1, max_visible_points=10 ** 6, cut_boundary=0,
        ),
    )
    ds = SceneDataset(cfg, split="train", seed=0)
    assert len(ds) == 1
    batch = ds.make_scene_batch(sid)
    assert batch is not None
    P = cfg.data.max_points
    assert batch.points.shape == (P, 3)
    assert batch.images.shape[1:] == (48, 64, 3)
    assert bool(batch.view_valid.any())
    # point2voxel consistent: every valid point maps to a valid voxel
    p2v = np.asarray(batch.point2voxel)
    pv = np.asarray(batch.point_valid)
    vv = np.asarray(batch.voxel_valid)
    assert (p2v[pv] < vv.sum()).all()
    # visible view points reference valid scene points
    vpi = np.asarray(batch.view_point_ids)
    vpv = np.asarray(batch.view_point_valid)
    assert (vpi[vpv] < pv.sum()).all()


def test_scene_dataset_prefetch(fake_dataset):
    import dataclasses

    from geopurify_tpu.config import GeoPurifyConfig
    from geopurify_tpu.data.loaders import SceneDataset

    tmp_path, sid = fake_dataset
    cfg = GeoPurifyConfig()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data,
            data_root=str(tmp_path / "3d"), data_root_2d=str(tmp_path / "2d"),
            train_scene_list=str(tmp_path / "train_list.txt"),
            max_points=512, max_voxels=512, max_views=2, max_view_points=256,
            voxel_size=0.1,
        ),
        fusion=dataclasses.replace(
            cfg.fusion, img_dim=(64, 48), frame_stride=1,
            min_visible_points=1, max_visible_points=10 ** 6, cut_boundary=0,
        ),
    )
    ds = SceneDataset(cfg, split="train", seed=0)
    b1 = ds.next_scene()
    b2 = ds.next_scene()
    assert b1.points.shape == b2.points.shape


def test_selector(tmp_path, rng):
    import torch

    from geopurify_tpu.data.selector import select_training_subset

    paths = {}
    for i in range(10):
        n = 200
        xyz = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        rgb = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        # scenes with more classes should win
        k = 2 + (i % 5)
        labels = rng.integers(0, k, n).astype(np.int64)
        p = str(tmp_path / f"s{i}.pth")
        torch.save((xyz, rgb, labels), p)
        paths[f"s{i}"] = p
    chosen = select_training_subset(paths, num_classes=8, subset_size=4, num_clusters=2)
    assert len(chosen) == 4
    assert all(c in paths for c in chosen)


def _make_matterport_scene_dir(tmp_path, sid="region0", n_frames=3, w=64, h=48):
    from PIL import Image

    d = tmp_path / "2d" / sid
    for sub in ("matterport_camera_poses", "matterport_camera_intrinsics",
                "matterport_color_images", "matterport_depth_images"):
        os.makedirs(d / sub, exist_ok=True)
    for i in range(n_frames):
        pose = np.eye(4)
        pose[:3, 3] = [i * 0.1, 0.0, -3.0]
        np.savetxt(d / "matterport_camera_poses" / f"cam{i}_pose_0_0.txt", pose)
        np.savetxt(
            d / "matterport_camera_intrinsics" / f"cam{i}_intrinsics_0.txt",
            np.array([w, h, 50.0, 50.0, w / 2, h / 2, 0, 0, 0, 0, 0]),
        )
        Image.new("RGB", (w, h), (90, 90, 90)).save(
            d / "matterport_color_images" / f"cam{i}_i0_0.jpg"
        )
        depth = np.full((h, w), 12000, np.uint16)  # 3m at depth_scale 4000
        Image.fromarray(depth).save(d / "matterport_depth_images" / f"cam{i}_d0_0.png")
    return str(d)


def test_matterport_dataset_batch(tmp_path, rng):
    import dataclasses
    import torch

    from geopurify_tpu.config import GeoPurifyConfig
    from geopurify_tpu.data.loaders import SceneDataset

    sid = "region0"
    n = 300
    xyz = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    labels = rng.integers(0, 4, n).astype(np.int64)
    os.makedirs(tmp_path / "3d")
    # matterport 4-tuple convention (SURVEY §2.1 #14)
    torch.save((xyz, colors, normals, labels), tmp_path / "3d" / f"{sid}.pth")
    _make_matterport_scene_dir(tmp_path, sid)
    with open(tmp_path / "list.txt", "w") as f:
        f.write(sid + "\n")

    cfg = GeoPurifyConfig()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, dataset="matterport",
            data_root=str(tmp_path / "3d"), data_root_2d=str(tmp_path / "2d"),
            train_scene_list=str(tmp_path / "list.txt"),
            max_points=512, max_voxels=512, max_views=4, max_view_points=256,
            voxel_size=0.1,
        ),
        fusion=dataclasses.replace(
            cfg.fusion, img_dim=(64, 48), min_visible_points=1,
            max_visible_points=10 ** 6, cut_boundary=0,
        ),
    )
    ds = SceneDataset(cfg, split="train", augment=False, seed=0)
    batch = ds.make_scene_batch(sid)
    assert batch is not None
    assert bool(batch.view_valid.any())
    # normals came through the 4-tuple (nonzero geom channels 3:6)
    g = np.asarray(batch.geom_feats)[np.asarray(batch.point_valid)]
    assert np.abs(g[:, 3:6]).sum() > 0


def test_eval_view_bucket_growth():
    """Eval keeps every usable view: V grows on a power-of-two ladder above
    max_views up to max_views_eval (reference evaluates all views)."""
    from geopurify_tpu.data.loaders import eval_view_bucket

    assert eval_view_bucket(2, 2, 8) == 2
    assert eval_view_bucket(3, 2, 8) == 4
    assert eval_view_bucket(5, 2, 8) == 8
    assert eval_view_bucket(9, 2, 8) == 8      # hard cap -> subsample + warn
    assert eval_view_bucket(64, 64, 256) == 64
    assert eval_view_bucket(65, 64, 256) == 128
    assert eval_view_bucket(300, 64, 256) == 256
