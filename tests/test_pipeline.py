"""End-to-end pipeline: Stage-2 evaluate_scene and Stage-1 loss on a synthetic scene."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geopurify_tpu.config import (
    ContrastiveConfig,
    FocalNetConfig,
    GeoPurifyConfig,
    PoolingConfig,
    SonataConfig,
    StudentConfig,
    XDecoderConfig,
)
from geopurify_tpu.data.synthetic import make_scene_batch
from geopurify_tpu.models.pipeline import GeoPurifyPipeline
from geopurify_tpu.models.sonata import SonataTeacher, morton_code, serialize


def tiny_cfg(n_cls=4):
    cfg = GeoPurifyConfig()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, all_label=tuple(f"c{i}" for i in range(n_cls))),
        student=StudentConfig(input_dim=22, hidden_dim=16, embed_dim=8, num_res_blocks=1),
        pooling=PoolingConfig(knn_k=8, sharpen=20.0, num_iterations=3, feature_dim=16),
        contrastive=ContrastiveConfig(
            num_anchors=32, num_negatives=7, num_macro_negatives=5,
            num_micro_negatives=2, spatial_knn_k=8,
        ),
        xdecoder=XDecoderConfig(
            backbone=FocalNetConfig(embed_dim=8, depths=(1, 1, 1, 1), focal_levels=(2, 2, 2, 2)),
            hidden_dim=16, conv_dim=16, mask_dim=16, num_queries=5, nheads=2,
            dim_feedforward=32, dec_layers=2, enc_layers=1,
            mask_shape=(48, 64), dtype="float32",
        ),
        sonata=SonataConfig(
            in_channels=6, enc_depths=(1, 1), enc_channels=(8, 16),
            enc_num_head=(2, 4), enc_patch_size=(64, 64), dtype="float32",
        ),
    )
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    batch = make_scene_batch(
        seed=0, n_points=600, n_views=2, image_hw=(48, 64),
        max_points=1024, max_voxels=1024, max_views=2, max_view_points=512,
    )
    n_cls = len(cfg.data.all_label)
    key = jax.random.key(0)
    from geopurify_tpu.models.xdecoder import XDecoderSegModel

    text = jax.random.normal(key, (n_cls + 1, cfg.xdecoder.hidden_dim))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    model = XDecoderSegModel(cfg.xdecoder)
    tparams = model.init(key, batch.images[:1], text, jnp.float32(20.0))

    sonata = SonataTeacher(
        in_channels=6, enc_depths=(1, 1), enc_channels=(8, 16),
        enc_num_head=(2, 4), enc_patch_size=(64, 64),
    )
    sparams = sonata.init(
        key, batch.geom_feats, batch.voxel_coords, batch.voxel_valid,
        batch.point2voxel, batch.point_valid,
    )
    pipe = GeoPurifyPipeline(
        cfg=cfg, teacher_params=tparams, text_embeddings=text,
        logit_scale=jnp.float32(20.0), sonata_params=sparams,
    )
    student_vars = pipe.student.init(
        key, jnp.zeros((8, cfg.student.input_dim)),
        jnp.full((8, 27), 8, jnp.int32), jnp.ones(8, bool), train=False,
    )
    return cfg, batch, pipe, student_vars


def test_morton_serialization_locality():
    coords = jnp.asarray(np.array([[0, 0, 0], [1, 0, 0], [7, 7, 7], [0, 1, 0]]), jnp.int32)
    codes = np.asarray(morton_code(coords))
    assert codes[0] == 0
    assert codes[2] > codes[1] and codes[2] > codes[3]
    perm = np.asarray(serialize(coords, jnp.ones(4, bool), 0))
    assert perm[0] == 0  # origin first


def test_sonata_teacher_shapes(setup):
    cfg, batch, pipe, _ = setup
    f = pipe.teacher_point_features(batch)
    assert f.shape[0] == batch.points.shape[0]
    assert f.shape[1] == pipe.sonata.out_channels == 8 + 16
    valid = np.asarray(batch.point_valid)
    fn = np.asarray(f)
    np.testing.assert_allclose(fn[~valid], 0)
    assert np.abs(fn[valid]).sum() > 0


def test_lift_scene(setup):
    cfg, batch, pipe, _ = setup
    lifted = pipe.lift_scene(batch)
    P = batch.points.shape[0]
    assert lifted.features.shape == (P, cfg.pooling.feature_dim)
    count = np.asarray(lifted.view_count)
    valid = np.asarray(batch.point_valid)
    assert count[valid].sum() > 0
    # every valid point ends with a feature (global fill)
    norms = np.linalg.norm(np.asarray(lifted.features)[valid], axis=1)
    assert (norms > 1e-6).mean() > 0.99


def test_evaluate_scene(setup):
    cfg, batch, pipe, student_vars = setup
    out = pipe.evaluate_scene(student_vars, batch)
    P = batch.points.shape[0]
    n_cls = len(cfg.data.all_label)
    assert out["logits"].shape == (P, n_cls)
    assert out["pred"].shape == (P,)
    assert np.asarray(out["pred"]).max() < n_cls
    # the per-point feature surface is opt-in (costs a [P, C] gather the
    # predictions never read); predictions are unaffected by the flag
    assert out["scene_features"] is None
    out_f = pipe.evaluate_scene(student_vars, batch, want_features=True)
    assert out_f["scene_features"].shape == (P, cfg.pooling.feature_dim)
    np.testing.assert_array_equal(
        np.asarray(out_f["pred"]), np.asarray(out["pred"])
    )


def test_logit_space_smoothing_argmax_exact(setup):
    """smooth_space='logit' must predict identically to the reference-shaped
    feature-space path: the rounds are linear, so S^19(F @ T) == (S^19 F) @ T,
    and per-row normalization cannot move the argmax (pipeline.py rationale)."""
    cfg, batch, pipe, student_vars = setup
    assert cfg.pooling.smooth_space == "logit"  # default fast path
    out_logit = pipe.evaluate_scene(student_vars, batch)
    cfg_f = dataclasses.replace(
        cfg, pooling=dataclasses.replace(cfg.pooling, smooth_space="feature")
    )
    pipe_f = GeoPurifyPipeline(
        cfg=cfg_f, teacher_params=pipe.teacher_params,
        text_embeddings=pipe.text_embeddings, logit_scale=pipe.logit_scale,
        sonata_params=pipe.sonata_params,
    )
    out_feat = pipe_f.evaluate_scene(student_vars, batch)
    valid = np.asarray(batch.point_valid)
    np.testing.assert_array_equal(
        np.asarray(out_logit["pred"])[valid], np.asarray(out_feat["pred"])[valid]
    )
    # logit-mode logits are the unnormalized projections — same ranking per
    # point; check the top-1 margin sign agrees everywhere
    assert out_logit["logits"].shape == out_feat["logits"].shape


def test_stage1_loss_and_grads(setup):
    cfg, batch, pipe, student_vars = setup
    f2d = pipe.lift_scene(batch).features
    f_teacher = pipe.teacher_point_features(batch)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": student_vars["batch_stats"]}
        loss, _ = pipe.stage1_loss(
            variables, jax.random.key(1), batch, f2d, f_teacher, train=True
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(student_vars["params"])
    assert np.isfinite(float(loss))
    # sensible InfoNCE magnitude: <= log(1+n_neg) + slack at init
    assert 0 < float(loss) < 10.0
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads, 0.0
    )
    assert gnorm > 0


def test_evaluate_scene_zstack_gate_matches(setup):
    """Stage-2 with the z-stack student fast path forced ON (threshold 1)
    must reproduce the default (table) pipeline's predictions exactly —
    the M-gated dispatch in _voxel_embed is perf-only."""
    cfg, batch, pipe, student_vars = setup
    cfg_z = dataclasses.replace(
        cfg, student=dataclasses.replace(cfg.student, zstack_min_voxels=1)
    )
    pipe_z = GeoPurifyPipeline(
        cfg=cfg_z, teacher_params=pipe.teacher_params,
        text_embeddings=pipe.text_embeddings, logit_scale=pipe.logit_scale,
        sonata_params=pipe.sonata_params,
    )
    out_z = pipe_z.evaluate_scene(student_vars, batch)
    out = pipe.evaluate_scene(student_vars, batch)
    valid = np.asarray(batch.point_valid)
    np.testing.assert_array_equal(
        np.asarray(out_z["pred"])[valid], np.asarray(out["pred"])[valid]
    )
    np.testing.assert_allclose(
        np.asarray(out_z["logits"])[valid], np.asarray(out["logits"])[valid],
        rtol=5e-4, atol=5e-4,
    )
