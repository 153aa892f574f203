"""LSeg/APE-style lift backends + fused-feature loader."""

import numpy as np
import jax
import jax.numpy as jnp

from geopurify_tpu.models.lift_variants import lift_view_dense, lift_view_instance


def _common(rng, H=16, W=20, Pv=64, C=8, n_cls=4):
    rows = jnp.asarray(rng.integers(0, H, Pv).astype(np.int32))
    cols = jnp.asarray(rng.integers(0, W, Pv).astype(np.int32))
    pv_valid = jnp.asarray(rng.random(Pv) < 0.8)
    coords = jnp.asarray(rng.normal(size=(Pv, 3)).astype(np.float32))
    text = rng.normal(size=(n_cls, C)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    return rows, cols, pv_valid, coords, jnp.asarray(text)


def test_dense_lift_gathers_pixel_features(rng):
    H, W, C = 16, 20, 8
    rows, cols, pv_valid, coords, text = _common(rng, H, W, C=C)
    pix = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    out = lift_view_dense(pix, rows, cols, pv_valid, coords, text, jnp.float32(10.0))
    f = np.asarray(out.features)
    pv = np.asarray(pv_valid)
    np.testing.assert_allclose(np.linalg.norm(f[pv], axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(f[~pv], 0.0)
    # gathered from the right pixel
    i = int(np.where(pv)[0][0])
    expected = np.asarray(pix)[int(rows[i]), int(cols[i])]
    expected = expected / np.linalg.norm(expected)
    np.testing.assert_allclose(f[i], expected, rtol=1e-5)
    assert out.logits.shape == (64, 4)


def test_instance_lift_masks_and_fill(rng):
    H, W, Q, C = 16, 20, 5, 8
    rows, cols, pv_valid, coords, text = _common(rng, H, W, C=C)
    # one mask dominates everywhere -> all covered points share its embed
    masks = jnp.full((Q, H, W), -10.0).at[2].set(10.0)
    embeds = jnp.asarray(rng.normal(size=(Q, C)).astype(np.float32))
    scores = jnp.ones((Q,))
    out = lift_view_instance(
        masks, embeds, scores, rows, cols, pv_valid, coords, text, jnp.float32(10.0)
    )
    f = np.asarray(out.features)
    pv = np.asarray(pv_valid)
    e2 = np.asarray(embeds)[2]
    e2 = e2 / np.linalg.norm(e2)
    np.testing.assert_allclose(f[pv], np.tile(e2, (pv.sum(), 1)), rtol=1e-4)


def test_backend_registry_errors_and_roundtrip():
    import pytest

    from geopurify_tpu.models import lift_backends as lb

    with pytest.raises(KeyError, match="lift_backends.register_backend"):
        lb.get_backend("lseg")
    fn = lambda img: img  # noqa: E731
    lb.register_backend("lseg", fn)
    try:
        assert lb.get_backend("LSeg") is fn
        assert "lseg" in lb.available()
    finally:
        lb._REGISTRY.clear()


def test_pipeline_dispatches_alternative_backends(rng):
    """evaluate_scene end-to-end through the lseg and ape backend paths
    (≙ the reference's feature_2d_extractor dispatch, affinity_module.py:348)."""
    import dataclasses

    import jax

    from geopurify_tpu.data.synthetic import make_scene_batch
    from geopurify_tpu.models.pipeline import GeoPurifyPipeline
    from tests.test_pipeline import tiny_cfg

    base_cfg = tiny_cfg()
    batch = make_scene_batch(
        seed=1, n_points=300, n_views=2, image_hw=(48, 64),
        max_points=512, max_voxels=512, max_views=2, max_view_points=256,
    )
    n_cls = len(base_cfg.data.all_label)
    C = base_cfg.pooling.feature_dim
    key = jax.random.key(0)
    text = jax.random.normal(key, (n_cls + 1, C))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    H, W = base_cfg.xdecoder.mask_shape

    def toy_dense(image):  # lseg-style: C-dim pixel map at mask_shape
        x = jnp.mean(image, axis=-1, keepdims=True)
        return jnp.tile(x[:H, :W], (1, 1, C)) + jnp.arange(C)[None, None]

    def toy_instance(image):  # ape-style
        masks = jnp.stack([jnp.full((H, W), 5.0), jnp.full((H, W), -5.0)])
        embeds = jnp.stack([jnp.ones((C,)), -jnp.ones((C,))])
        return masks, embeds, jnp.asarray([0.9, 0.5])

    for backend, fn in (("lseg", toy_dense), ("ape", toy_instance)):
        cfg = dataclasses.replace(
            base_cfg,
            xdecoder=dataclasses.replace(base_cfg.xdecoder, lift_backend=backend),
        )
        pipe = GeoPurifyPipeline(
            cfg=cfg, teacher_params={}, text_embeddings=text,
            logit_scale=jnp.float32(20.0), lift_backend_fn=fn,
        )
        student_vars = pipe.student.init(
            key, jnp.zeros((8, cfg.student.input_dim)),
            jnp.full((8, 27), 8, jnp.int32), jnp.ones(8, bool), train=False,
        )
        out = pipe.evaluate_scene(student_vars, batch)
        pred = np.asarray(out["pred"])
        assert pred.shape == (batch.points.shape[0],)
        assert np.isfinite(np.asarray(out["logits"])).all()


def test_fused_feature_training_inputs(tmp_path, rng):
    """--fused-features mode: batch + row-aligned padded features feed
    stage1_loss (the FusedFeatureLoader consumption path)."""
    import dataclasses

    import torch

    from geopurify_tpu.config import GeoPurifyConfig
    from geopurify_tpu.data.feature_loader import FusedFeatureDataset

    # a tiny on-disk scene + fused features
    n, c = 200, 16
    xyz = rng.uniform(0, 2, (n, 3)).astype(np.float32)
    rgb = rng.uniform(-1, 1, (n, 3))
    labels = rng.integers(0, 4, n)
    sid = "scene0042_00"
    root3d = tmp_path / "3d"
    root3d.mkdir()
    torch.save((xyz.astype(np.float64), rgb, labels.astype(np.float64)),
               root3d / f"{sid}.pth")
    (root3d / "train.txt").write_text(sid + "\n")
    featdir = tmp_path / "fused"
    featdir.mkdir()
    feats = rng.normal(size=(n, c)).astype(np.float32)
    torch.save({"feat": torch.tensor(feats)}, featdir / f"{sid}_0.pt")

    cfg = GeoPurifyConfig()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, data_root=str(root3d), data_root_2d=str(tmp_path / "2d"),
            train_scene_list="train.txt", max_points=128, max_voxels=128,
            max_views=1, max_view_points=64, all_label=("a", "b"),
        ),
    )
    ds = FusedFeatureDataset(cfg, str(featdir))
    pair = ds.make_scene_batch_with_features(sid)
    assert pair is not None
    batch, f2d = pair
    assert f2d.shape == (128, c)
    # row alignment: the i-th valid batch point carries the fused feature of
    # the deterministically-kept source point
    from geopurify_tpu.data.loaders import deterministic_keep

    keep = deterministic_keep(sid, n, 128)
    np.testing.assert_allclose(f2d[: len(keep)], feats[keep])


def test_fused_feature_loader(tmp_path, rng):
    import torch

    from geopurify_tpu.data.feature_loader import load_fused_features

    n, c = 100, 16
    mask = rng.random(n) < 0.6
    feat = rng.normal(size=(int(mask.sum()), c)).astype(np.float32)
    p = str(tmp_path / "scene0000_00_0.pt")
    torch.save({"feat": torch.tensor(feat), "mask_full": torch.tensor(mask)}, p)
    full, m = load_fused_features(p, n)
    assert full.shape == (n, c)
    np.testing.assert_array_equal(m, mask)
    np.testing.assert_allclose(full[mask], feat)
    np.testing.assert_allclose(full[~mask], 0.0)


def test_fused_features_training_cli_e2e(tmp_path, rng, monkeypatch):
    """geopurify-train --fused-features end to end: two optimizer steps from
    an on-disk scene + fused-feature file, no 2D data, tiny model."""
    import torch

    from geopurify_tpu.run import train as train_mod

    n, c = 150, 16
    xyz = rng.uniform(0, 2, (n, 3)).astype(np.float32)
    rgb = rng.uniform(-1, 1, (n, 3))
    labels = rng.integers(0, 3, n)
    sid = "scene0077_00"
    root3d = tmp_path / "3d"
    root3d.mkdir()
    torch.save((xyz.astype(np.float64), rgb, labels.astype(np.float64)),
               root3d / f"{sid}.pth")
    (root3d / "train.txt").write_text(sid + "\n")
    featdir = tmp_path / "fused"
    featdir.mkdir()
    torch.save({"feat": torch.tensor(rng.normal(size=(n, c)).astype(np.float32))},
               featdir / f"{sid}_0.pt")

    overrides = [
        f"data.data_root={root3d}",
        f"data.data_root_2d={tmp_path / '2d'}",
        "data.train_scene_list=train.txt",
        "data.max_points=256", "data.max_voxels=256",
        "data.max_views=1", "data.max_view_points=64",
        "data.all_label=['a','b','c']",
        "student.input_dim=22", "student.hidden_dim=16",
        "student.embed_dim=8", "student.num_res_blocks=1",
        "contrastive.num_anchors=16", "contrastive.num_negatives=7",
        "contrastive.num_macro_negatives=5", "contrastive.num_micro_negatives=2",
        "contrastive.spatial_knn_k=8",
        "pooling.feature_dim=16",
        "sonata.enc_depths=[1,1]", "sonata.enc_channels=[8,16]",
        "sonata.enc_num_head=[2,4]", "sonata.enc_patch_size=[32,32]",
        "sonata.dtype=float32",
        "xdecoder.hidden_dim=16", "xdecoder.conv_dim=16", "xdecoder.mask_dim=16",
        "xdecoder.num_queries=5", "xdecoder.nheads=2",
        "xdecoder.dim_feedforward=32", "xdecoder.dec_layers=1",
        "xdecoder.enc_layers=1", "xdecoder.dtype=float32",
        "xdecoder.backbone.embed_dim=8", "xdecoder.backbone.depths=[1,1,1,1]",
        "xdecoder.backbone.focal_levels=[2,2,2,2]",
        "text.width=16", "text.heads=2", "text.layers=1",
        "text.dim_proj=16", "text.vocab_size=128", "text.context_length=8",
        "xdecoder.mask_shape=[32,64]",
        f"train.save_path={tmp_path / 'run'}",
        "train.print_freq=1",
    ]
    train_mod.main([
        "--fused-features", str(featdir),
        "--epochs", "1", "--steps-per-epoch", "2", *overrides,
    ])
    metrics = (tmp_path / "run" / "metrics.jsonl").read_text().strip()
    assert metrics, "no training metrics written"
    import json as _json

    rec = _json.loads(metrics.splitlines()[-1])
    assert np.isfinite(rec["loss"])
    assert rec["step"] >= 1
