"""Raw-data preprocessing: synthetic-raw -> pth/2D layout -> SceneBatch.

Covers the reference's preprocess scripts rebuilt in data/preprocess.py
(reference dataset/scripts/preprocess/*): ScanNet 3D ply->pth remap, the
.sens reader, Matterport region-face label voting, conf parsing, and a full
round trip through SceneDataset.make_scene_batch.
"""

import os
import struct
import zlib
from io import BytesIO

import numpy as np
import pytest

from geopurify_tpu.data import preprocess as pp


# ---------------------------------------------------------------------------
# synthetic raw-data writers
# ---------------------------------------------------------------------------

def write_vertex_ply(path, xyz, rgb=None, labels=None, faces=None,
                     face_extra=None):
    """Binary-little-endian PLY with arbitrary vertex props + face element."""
    n = len(xyz)
    props = [("x", "f4"), ("y", "f4"), ("z", "f4")]
    if rgb is not None:
        props += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
    if labels is not None:
        props += [("label", "u2")]
    dt = np.dtype([(p, "<" + d) for p, d in props])
    rec = np.empty(n, dt)
    rec["x"], rec["y"], rec["z"] = xyz.T.astype(np.float32)
    if rgb is not None:
        rec["red"], rec["green"], rec["blue"] = rgb.T.astype(np.uint8)
    if labels is not None:
        rec["label"] = labels.astype(np.uint16)
    tn = {"f4": "float", "u1": "uchar", "u2": "ushort", "i4": "int"}
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property {tn[d]} {p}" for p, d in props]
    body_face = b""
    if faces is not None:
        header.append(f"element face {len(faces)}")
        header.append("property list uchar int vertex_indices")
        fdt = [("c", "u1"), ("v", "<i4", (3,))]
        if face_extra:
            for name, arr in face_extra.items():
                header.append(f"property int {name}")
                fdt.append((name, "<i4"))
        frec = np.empty(len(faces), np.dtype(fdt))
        frec["c"] = 3
        frec["v"] = faces.astype(np.int32)
        if face_extra:
            for name, arr in face_extra.items():
                frec[name] = arr.astype(np.int32)
        body_face = frec.tobytes()
    header.append("end_header\n")
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        f.write(rec.tobytes())
        f.write(body_face)


def write_sens(path, poses, colors, depths):
    """Minimal version-4 .sens capture (scannet_sensordata.py layout)."""
    from PIL import Image

    H, W = depths[0].shape
    with open(path, "wb") as f:
        f.write(struct.pack("I", 4))
        name = b"synth"
        f.write(struct.pack("Q", len(name)))
        f.write(name)
        K = np.eye(4, dtype=np.float32)
        K[0, 0] = K[1, 1] = 50.0
        K[0, 2], K[1, 2] = W / 2, H / 2
        f.write(K.tobytes())                      # intrinsic_color
        f.write(np.eye(4, dtype=np.float32).tobytes())
        f.write(K.tobytes())                      # intrinsic_depth
        f.write(np.eye(4, dtype=np.float32).tobytes())
        f.write(struct.pack("i", 2))              # color: jpeg
        f.write(struct.pack("i", 1))              # depth: zlib_ushort
        f.write(struct.pack("I", W))
        f.write(struct.pack("I", H))
        f.write(struct.pack("I", W))
        f.write(struct.pack("I", H))
        f.write(struct.pack("f", 1000.0))
        f.write(struct.pack("Q", len(poses)))
        for pose, color, depth in zip(poses, colors, depths):
            f.write(pose.astype(np.float32).tobytes())
            f.write(struct.pack("QQ", 0, 0))
            buf = BytesIO()
            Image.fromarray(color).save(buf, format="JPEG")
            cb = buf.getvalue()
            db = zlib.compress(depth.astype(np.uint16).tobytes())
            f.write(struct.pack("QQ", len(cb), len(db)))
            f.write(cb)
            f.write(db)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_scannet_3d_remap(tmp_path, rng):
    import torch

    scans = tmp_path / "scans" / "scene0000_00"
    scans.mkdir(parents=True)
    n = 50
    xyz = rng.uniform(0, 2, (n, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (n, 3))
    # nyu40 ids: 1 (wall -> 0), 39 (otherfurniture -> 19), 13 (unmapped -> 255)
    labels = np.asarray(([1] * 20) + ([39] * 20) + ([13] * 10))
    write_vertex_ply(scans / "scene0000_00_vh_clean_2.ply", xyz, rgb)
    write_vertex_ply(scans / "scene0000_00_vh_clean_2.labels.ply", xyz,
                     labels=labels)
    out = tmp_path / "out3d"
    pp.main(["scannet-3d", "--scans", str(tmp_path / "scans"),
             "--out", str(out), "--workers", "1"])
    coords, colors, lab = torch.load(
        out / "scene0000_00_vh_clean_2.pth", weights_only=False
    )
    np.testing.assert_allclose(coords, xyz, atol=1e-6)
    np.testing.assert_allclose(colors, rgb / 127.5 - 1.0, atol=1e-6)
    assert (lab[:20] == 0).all() and (lab[20:40] == 19).all()
    assert (lab[40:] == 255).all()


def test_sens_reader_and_scannet_2d(tmp_path, rng):
    scans = tmp_path / "scans" / "scene0001_00"
    scans.mkdir(parents=True)
    H, W = 24, 32
    poses = [np.eye(4, dtype=np.float32) + i * 0.0 for i in range(3)]
    poses[1][0, 3] = 2.5
    colors = [rng.integers(0, 255, (H, W, 3), dtype=np.uint8) for _ in range(3)]
    depths = [rng.integers(100, 4000, (H, W), dtype=np.uint16) for _ in range(3)]
    write_sens(scans / "scene0001_00.sens", poses, colors, depths)

    sd = pp.SensReader(str(scans / "scene0001_00.sens"))
    assert sd.num_frames == 3
    frames = list(sd.frames())
    np.testing.assert_allclose(frames[1][0], poses[1])
    np.testing.assert_array_equal(sd.decode_depth(frames[2][2]), depths[2])
    assert sd.decode_color(frames[0][1]).shape == (H, W, 3)
    sd.close()

    out = tmp_path / "out2d"
    pp.main(["scannet-2d", "--scans", str(tmp_path / "scans"),
             "--out", str(out), "--frame-skip", "2",
             "--width", "16", "--height", "12", "--workers", "1"])
    base = out / "scene0001_00"
    assert sorted(os.listdir(base / "color")) == ["0.jpg", "2.jpg"]
    assert sorted(os.listdir(base / "depth")) == ["0.png", "2.png"]
    pose = np.loadtxt(base / "pose" / "0.txt")
    np.testing.assert_allclose(pose, np.eye(4))
    intr = np.loadtxt(out / "intrinsics.txt")
    assert intr.shape == (4, 4) and intr[0, 0] != 577.870605  # rescaled

    from PIL import Image

    d = np.asarray(Image.open(base / "depth" / "0.png"))
    assert d.shape == (12, 16) and d.dtype in (np.uint16, np.int32)
    # nearest resize: every depth value must exist in the source image
    assert np.isin(d, depths[0]).all()


def test_matterport_3d_label_voting(tmp_path, rng):
    import torch

    region_dir = tmp_path / "scans" / "sceneA" / "region_segmentations"
    region_dir.mkdir(parents=True)
    # category_mapping.tsv: raw category 1 -> nyu40 1 (wall), 2 -> 22 (ceiling),
    # 3 -> 40 (not allowed)
    tsv = tmp_path / "category_mapping.tsv"
    tsv.write_text(
        "index\tcategory\tnyu40id\n1\twall\t1\n2\tceiling\t22\n3\tmisc\t40\n"
    )
    xyz = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0], [2, 0, 0], [2, 1, 0]],
        np.float32,
    )
    rgb = rng.integers(0, 255, (6, 3))
    faces = np.array([[0, 1, 2], [1, 3, 2], [1, 4, 3], [4, 5, 3]])
    # categories: two wall faces, one ceiling, one disallowed
    cat = np.array([1, 1, 2, 3])
    write_vertex_ply(region_dir / "region0.ply", xyz, rgb, faces=faces,
                     face_extra={"category_id": cat})
    out = tmp_path / "out"
    pp.main(["matterport-3d", "--scans", str(tmp_path / "scans"),
             "--out", str(out), "--category-mapping", str(tsv),
             "--workers", "1"])
    coords, colors, normal, labels = torch.load(
        out / "sceneA_region0.pth", weights_only=False
    )
    assert coords.shape == (6, 3) and normal.shape == (6, 3)
    np.testing.assert_allclose(np.linalg.norm(normal, axis=1), 1.0, atol=1e-5)
    # vertex 0: only wall faces -> class 0 (wall). vertex 2: wall x2 + ceiling
    # -> wall. vertex 5: one disallowed face only -> unlabeled 255
    assert labels[0] == 0 and labels[2] == 0
    assert labels[5] == 255
    # vertex 4: faces 2 (ceiling@nyu22 -> bin 21) and 3 (disallowed -> bin 0)
    # tie at 1 vote each — np.argmax breaks ties toward the LOWEST bin (0 =
    # unlabeled), exactly like the reference's argmax
    # (preprocess_3d_matterport.py:91-94), so the vertex ends unlabeled
    assert labels[4] == 255
    # vertex 3 sees faces 1 (wall), 2 (ceiling), 3 (disallowed): wall/ceiling/
    # unlabeled tie -> argmax -> unlabeled? no: one vote each for bins 0, 1,
    # 21 -> argmax -> bin 0 -> 255 as well; vertex 1 sees wall x3 + ceiling:
    # clear wall majority
    assert labels[1] == 0


def test_matterport_conf_parsing_and_2d(tmp_path, rng):
    scene = tmp_path / "scans" / "S1"
    (scene / "undistorted_camera_parameters").mkdir(parents=True)
    (scene / "undistorted_color_images").mkdir()
    (scene / "undistorted_depth_images").mkdir()
    conf = scene / "undistorted_camera_parameters" / "S1.conf"
    pose = np.eye(4)
    pose[0, 3] = 1.0
    intr = "intrinsics_matrix 100 0 32  0 100 24  0 0 1"
    scans = []
    for cam in range(1):
        for yaw in range(6):
            name = f"pano_i{cam}_{yaw}.jpg"
            vals = " ".join(str(v) for v in pose.reshape(-1))
            scans.append(f"scan depth_x {name} {vals}")
    conf.write_text(intr + "\n" + "\n".join(scans) + "\n")

    from PIL import Image

    for yaw in range(6):
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            scene / "undistorted_color_images" / f"pano_i0_{yaw}.jpg"
        )
        d = rng.integers(0, 8000, (48, 64), dtype=np.uint16)
        Image.fromarray(d, mode="I;16").save(
            scene / "undistorted_depth_images" / f"pano_d0_{yaw}.png"
        )

    names, K, E = pp.parse_matterport_conf(str(conf))
    assert len(names) == 6 and K.shape == (6, 3, 3) and E.shape == (6, 4, 4)
    assert K[0, 0, 0] == 100

    out = tmp_path / "out"
    pp.main(["matterport-2d", "--scans", str(tmp_path / "scans"),
             "--out", str(out), "--width", "32", "--height", "24",
             "--workers", "1"])
    base = out / "S1"
    assert len(os.listdir(base / "color")) == 6
    assert len(os.listdir(base / "depth")) == 6
    p = np.loadtxt(base / "pose" / "pano_i0_0.txt")
    # y/z columns sign-flipped (preprocess_2d_matterport.py:70-72)
    np.testing.assert_allclose(p[:3, 1], -pose[:3, 1])
    np.testing.assert_allclose(p[:3, 2], -pose[:3, 2])
    np.testing.assert_allclose(p[:3, 0], pose[:3, 0])
    Kout = np.loadtxt(base / "intrinsic" / "pano_i0_0.txt")
    # the reference hardcodes the Matterport capture resolution 1280x1024 as
    # the intrinsic source dim (preprocess_2d_matterport.py:99-100):
    # resize_width = floor(24 * 1280/1024) = 30 -> fx *= 30/1280
    assert Kout[0, 0] == pytest.approx(100 * 30 / 1280, rel=1e-6)


def test_preprocessed_scannet_roundtrip_to_scene_batch(tmp_path, rng):
    """synthetic raw -> preprocess 3d+2d -> SceneDataset.make_scene_batch."""
    import dataclasses

    from geopurify_tpu.config import GeoPurifyConfig
    from geopurify_tpu.data.loaders import SceneDataset

    sid = "scene0002_00"
    scans = tmp_path / "scans" / sid
    scans.mkdir(parents=True)
    n = 400
    xyz = rng.uniform(0, 2, (n, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(2.0, 4.0, n)          # in front of the camera
    rgb = rng.integers(0, 255, (n, 3))
    labels = rng.choice([1, 2, 4, 39], n)
    write_vertex_ply(scans / f"{sid}_vh_clean_2.ply", xyz, rgb)
    write_vertex_ply(scans / f"{sid}_vh_clean_2.labels.ply", xyz, labels=labels)

    H, W = 24, 32
    pose = np.eye(4, dtype=np.float32)            # camera at origin, +z fwd
    color = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    depth = np.full((H, W), 3000, np.uint16)      # 3 m
    write_sens(scans / f"{sid}.sens", [pose], [color], [depth])

    out3d = tmp_path / "3d"
    out2d = tmp_path / "2d"
    pp.main(["scannet-3d", "--scans", str(tmp_path / "scans"),
             "--out", str(out3d), "--workers", "1"])
    pp.main(["scannet-2d", "--scans", str(tmp_path / "scans"),
             "--out", str(out2d), "--frame-skip", "1",
             "--width", str(W), "--height", str(H), "--workers", "1"])
    # loader expects intrinsic/intrinsic_color.txt per scene
    intr_dir = out2d / sid / "intrinsic"
    intr_dir.mkdir()
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 50.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    np.savetxt(intr_dir / "intrinsic_color.txt", K)
    (out3d / "train.txt").write_text(sid + "\n")

    cfg = GeoPurifyConfig()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, data_root=str(out3d), data_root_2d=str(out2d),
            train_scene_list="train.txt",
            max_points=512, max_voxels=512, max_views=2, max_view_points=512,
            all_label=("wall", "floor"),
        ),
        fusion=dataclasses.replace(
            cfg.fusion, img_dim=(W, H), frame_stride=1, resolution_scale=1.0,
            min_visible_points=1, cut_boundary=0,
        ),
    )
    ds = SceneDataset(cfg, split="train", augment=False)
    batch = ds.make_scene_batch(sid)
    assert batch is not None
    assert int(np.asarray(batch.point_valid).sum()) == n
    assert int(np.asarray(batch.view_valid).sum()) >= 1
    # some points must project into the synthetic view
    assert int(np.asarray(batch.view_point_valid).sum()) > 0


def test_nuscenes_3d_remap_and_roundtrip(tmp_path, rng):
    import torch

    scans = tmp_path / "nusc" / "scene-0001"
    scans.mkdir(parents=True)
    n = 60
    xyz = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    # raw 32-class ids incl. -1 (-> noise), car (17 -> 3), vegetation (30 -> 15),
    # unmapped animal (1 -> 255)
    raw = np.asarray(([-1] * 10) + ([17] * 20) + ([30] * 20) + ([1] * 10))
    write_vertex_ply(scans / "scene.ply", xyz, labels=np.maximum(raw, 0))
    # write labels as a separate int property: reuse the u2 'label' prop and
    # patch the -1 rows through the remapper semantics directly
    out = tmp_path / "out_nusc3d"
    pp.main(["nuscenes-3d", "--scans", str(tmp_path / "nusc"),
             "--out", str(out), "--workers", "1"])
    coords, zero, lab = torch.load(out / "scene-0001.pth", weights_only=False)
    np.testing.assert_allclose(coords, xyz, atol=1e-6)
    assert zero == 0
    remap = pp.nuscenes_class_remap()
    assert (lab[:10] == remap[0]).all()          # -1 -> 0 (noise) -> 255
    assert (lab[10:30] == 3).all()               # car
    assert (lab[30:50] == 15).all()              # vegetation
    assert (lab[50:] == 255).all()               # unmapped


def test_nuscenes_2d_layout(tmp_path, rng):
    from PIL import Image

    root = tmp_path / "nusc2d" / "scene-0001" / "frames" / "0000000123"
    for cam in pp.NUSCENES_CAM_LOCS:
        d = root / cam
        d.mkdir(parents=True)
        Image.fromarray(
            rng.integers(0, 255, (90, 160, 3), dtype=np.uint8)
        ).save(d / "color_image.jpg")
        np.savetxt(d / "cam2scene.txt", np.eye(4))
        K = np.eye(3); K[0, 0] = 1266.4; K[1, 1] = 1266.4
        K[0, 2], K[1, 2] = 800.0, 450.0
        np.savetxt(d / "K.txt", K)
    out = tmp_path / "out_nusc2d"
    pp.main(["nuscenes-2d", "--scans", str(tmp_path / "nusc2d"),
             "--out", str(out), "--width", "80", "--height", "45",
             "--workers", "1"])
    base = out / "scene-0001"
    for cam in pp.NUSCENES_CAM_LOCS:
        img = np.asarray(Image.open(base / "color" / f"{cam}.jpg"))
        assert img.shape == (45, 80, 3)
        pose = np.load(base / "pose" / f"{cam}.npy")
        np.testing.assert_allclose(pose, np.eye(4))
        K = np.load(base / "K" / f"{cam}.npy")
        # focal rescaled from the 1600x900 native spec
        ref = pp.adjust_intrinsic(
            np.array([[1266.4, 0, 800.0], [0, 1266.4, 450.0], [0, 0, 1.0]]),
            (1600, 900), (80, 45))
        np.testing.assert_allclose(K, ref)


def test_replica_3d_and_2d(tmp_path, rng):
    import torch
    from PIL import Image

    raw = tmp_path / "replica"
    (raw / "room0" / "results").mkdir(parents=True)
    n = 40
    xyz = rng.uniform(0, 5, (n, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (n, 3))
    write_vertex_ply(raw / "room0_mesh.ply", xyz, rgb=rgb)
    out3d = tmp_path / "out_rep3d"
    pp.main(["replica-3d", "--scans", str(raw), "--out", str(out3d),
             "--workers", "1"])
    coords, colors, lab = torch.load(out3d / "room0.pth", weights_only=False)
    np.testing.assert_allclose(coords, xyz, atol=1e-6)
    np.testing.assert_allclose(colors, rgb / 127.5 - 1.0, atol=1e-6)
    assert (lab == 255).all()

    # 2D: 4 frames, sample_freq 2 -> ids 0 and 1
    np.savetxt(raw / "room0" / "traj.txt",
               np.tile(np.eye(4).reshape(1, 16), (4, 1)))
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (68, 120, 3), dtype=np.uint8)
        ).save(raw / "room0" / "results" / f"frame{i:05d}.jpg")
        Image.fromarray(
            rng.integers(0, 5000, (68, 120), dtype=np.uint16).astype(np.int32),
            mode="I",
        ).save(raw / "room0" / "results" / f"depth{i:05d}.png")
    out2d = tmp_path / "out_rep2d"
    pp.main(["replica-2d", "--scans", str(raw), "--out", str(out2d),
             "--sample-freq", "2", "--width", "64", "--height", "36",
             "--workers", "1"])
    base = out2d / "room0"
    for i in (0, 1):
        img = np.asarray(Image.open(base / "color" / f"{i}.jpg"))
        assert img.shape == (36, 64, 3)
        d = np.asarray(Image.open(base / "depth" / f"{i}.png"))
        assert d.shape == (36, 64)
        np.testing.assert_allclose(
            np.loadtxt(base / "pose" / f"{i}.txt"), np.eye(4))
    intr = np.loadtxt(out2d / "intrinsics.txt")
    ref = pp.adjust_intrinsic(
        pp.make_intrinsic(600.0, 600.0, 599.5, 339.5), (1200, 680), (64, 36))
    np.testing.assert_allclose(intr, ref)
