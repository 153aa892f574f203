"""Index-valued lift (lift_view_ids / fuse_views_indexed) equals the dense
lift (lift_view_features / fuse_views) — the structural rewrite exploits that
every per-point feature is a row of the Q-row mask-embedding table (reference
affinity_module.py:560-625: per-query assignment + per-view KDTree fill), so
views ship [Pv] int32 winners instead of [Pv, C] floats."""

import jax.numpy as jnp
import numpy as np
import pytest

from geopurify_tpu.models.lift import (
    fuse_views,
    fuse_views_indexed,
    lift_view_features,
    lift_view_ids,
)


def _make_view(rng, Q, h, w, C, n_cls, Pv, H, W, bias=0.0):
    pm = rng.standard_normal((Q, h, w)).astype(np.float32) + bias
    me = rng.standard_normal((Q, C)).astype(np.float32)
    pl = rng.standard_normal((Q, n_cls + 1)).astype(np.float32)
    rows = rng.integers(0, H, Pv).astype(np.int32)
    cols = rng.integers(0, W, Pv).astype(np.int32)
    pv_valid = rng.random(Pv) < 0.9
    vc = rng.uniform(0, 5, (Pv, 3)).astype(np.float32)
    return pm, me, pl, rows, cols, pv_valid, vc


@pytest.fixture(scope="module")
def text():
    rng = np.random.default_rng(7)
    t = rng.standard_normal((5, 16)).astype(np.float32)
    return jnp.asarray(t / np.linalg.norm(t, axis=-1, keepdims=True))


# Pv=48 with H*W=24*32 exercises the point-evaluated gate; Pv=512 at H*W=8*8
# would exercise the grid path, covered by test_lift_oracle's gate test —
# here both Pv sit on whichever side the static gate picks, the dense and
# indexed lifts share _view_winner so the gate can never split them.
@pytest.mark.parametrize("bias", [0.0, 2.0, -50.0])
@pytest.mark.parametrize("Pv", [48, 512])
def test_view_ids_match_dense(text, Pv, bias):
    rng = np.random.default_rng(3)
    Q, h, w, C, n_cls, H, W = 6, 6, 8, 16, 5, 24, 32
    pm, me, pl, rows, cols, pv_valid, vc = _make_view(
        rng, Q, h, w, C, n_cls, Pv, H, W, bias
    )
    args = (
        jnp.asarray(pm), jnp.asarray(me), jnp.asarray(pl),
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(pv_valid),
        jnp.asarray(vc), text, jnp.float32(20.0), (H, W),
    )
    dense = lift_view_features(*args)
    ids = lift_view_ids(*args)

    assert ids.winner.dtype == jnp.int32
    assert ids.embed_table.shape == (Q + 1, C)
    # sentinel row is exactly zero
    np.testing.assert_array_equal(np.asarray(ids.embed_table[Q]), 0.0)
    np.testing.assert_array_equal(np.asarray(ids.logit_table[Q]), 0.0)

    feats_from_ids = np.asarray(ids.embed_table)[np.asarray(ids.winner)]
    logits_from_ids = np.asarray(ids.logit_table)[np.asarray(ids.winner)]
    np.testing.assert_allclose(
        feats_from_ids, np.asarray(dense.features), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        logits_from_ids, np.asarray(dense.logits), rtol=1e-4, atol=1e-5
    )


def test_view_ids_zero_coverage_all_sentinel(text):
    """bias=-50 -> no point passes the 0.5 sigmoid gate, no donors exist:
    the dense fill leaves zeros, the indexed lift must be all-sentinel."""
    rng = np.random.default_rng(4)
    Q, h, w, C, n_cls, H, W, Pv = 6, 6, 8, 16, 5, 24, 32, 64
    pm, me, pl, rows, cols, pv_valid, vc = _make_view(
        rng, Q, h, w, C, n_cls, Pv, H, W, -50.0
    )
    ids = lift_view_ids(
        jnp.asarray(pm), jnp.asarray(me), jnp.asarray(pl),
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(pv_valid),
        jnp.asarray(vc), text, jnp.float32(20.0), (H, W),
    )
    np.testing.assert_array_equal(np.asarray(ids.winner), Q)


def test_fuse_indexed_matches_dense(text):
    """fuse_views_indexed on (winner, tables) == fuse_views on the gathered
    dense equivalents — bit-for-bit (same merge, pointers differ only in what
    they index)."""
    rng = np.random.default_rng(5)
    V, Pv, Q, C, n_cls, P = 4, 64, 6, 16, 5, 96
    winner = rng.integers(0, Q + 1, (V, Pv)).astype(np.int32)
    emb = rng.standard_normal((V, Q + 1, C)).astype(np.float32)
    lt = rng.standard_normal((V, Q + 1, n_cls)).astype(np.float32)
    emb[:, Q] = 0.0
    lt[:, Q] = 0.0
    ids = rng.integers(0, P, (V, Pv)).astype(np.int32)
    valid = rng.random((V, Pv)) < 0.8
    valid[V - 1] = False          # one fully-invalid (padding) view
    winner[V - 1] = 0             # garbage winner under an invalid mask

    vw, ve, vl = jnp.asarray(winner), jnp.asarray(emb), jnp.asarray(lt)
    vids, vvalid = jnp.asarray(ids), jnp.asarray(valid)
    fused_i, count_i = fuse_views_indexed(
        vw, ve, vl, vids, vvalid, num_points=P, top_k=3
    )

    view_feats = jnp.asarray(
        np.stack([emb[v][winner[v]] for v in range(V)])
    )
    view_logits = jnp.asarray(
        np.stack([lt[v][winner[v]] for v in range(V)])
    )
    fused_d, count_d = fuse_views(
        view_feats, view_logits, vids, vvalid, num_points=P, top_k=3
    )
    np.testing.assert_array_equal(np.asarray(count_i), np.asarray(count_d))
    np.testing.assert_allclose(
        np.asarray(fused_i), np.asarray(fused_d), rtol=1e-6, atol=1e-6
    )


def test_pipeline_lift_scene_matches_dense_reference():
    """End-to-end: the pipeline's indexed lift_scene == the dense reference
    path (per-view lift_view_features -> fuse_views -> fill), on a real tiny
    X-Decoder teacher."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from geopurify_tpu.config import (
        FocalNetConfig,
        GeoPurifyConfig,
        PoolingConfig,
        StudentConfig,
        XDecoderConfig,
    )
    from geopurify_tpu.data.synthetic import make_scene_batch
    from geopurify_tpu.models.lift import fill_unseen_points
    from geopurify_tpu.models.pipeline import GeoPurifyPipeline
    from geopurify_tpu.models.xdecoder import XDecoderSegModel

    cfg = GeoPurifyConfig()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, all_label=tuple(f"c{i}" for i in range(4))
        ),
        student=StudentConfig(input_dim=22, hidden_dim=16, embed_dim=8,
                              num_res_blocks=1),
        pooling=PoolingConfig(knn_k=8, sharpen=20.0, num_iterations=3,
                              feature_dim=16),
        xdecoder=XDecoderConfig(
            backbone=FocalNetConfig(embed_dim=8, depths=(1, 1, 1, 1),
                                    focal_levels=(2, 2, 2, 2)),
            hidden_dim=16, conv_dim=16, mask_dim=16, num_queries=5, nheads=2,
            dim_feedforward=32, dec_layers=2, enc_layers=1,
            mask_shape=(48, 64), dtype="float32",
        ),
    )
    batch = make_scene_batch(
        seed=0, n_points=600, n_views=2, image_hw=(48, 64),
        max_points=1024, max_voxels=1024, max_views=2, max_view_points=512,
    )
    key = jax.random.key(0)
    text = jax.random.normal(key, (5, cfg.xdecoder.hidden_dim))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    model = XDecoderSegModel(cfg.xdecoder)
    tparams = model.init(key, batch.images[:1].astype(jnp.float32), text,
                         jnp.float32(20.0))
    pipe = GeoPurifyPipeline(
        cfg=cfg, teacher_params=tparams, text_embeddings=text,
        logit_scale=jnp.float32(20.0),
    )

    lifted = pipe.lift_scene(batch)                       # indexed path

    # dense reference: the pre-rewrite lift_scene body
    P = batch.points.shape[0]
    V = batch.images.shape[0]
    out = pipe.xdecoder.apply(
        tparams, batch.images.astype(jnp.float32), text, jnp.float32(20.0)
    )
    view_coords = batch.points[batch.view_point_ids % P]
    lifts = [
        lift_view_features(
            out["pred_masks"][b], out["mask_embed"][b], out["pred_logits"][b],
            batch.view_rows[b], batch.view_cols[b],
            batch.view_point_valid[b], view_coords[b],
            text[:-1], jnp.float32(20.0),
            tuple(cfg.xdecoder.mask_shape),
            mask_threshold=cfg.xdecoder.mask_threshold,
        )
        for b in range(V)
    ]
    vp_valid = batch.view_point_valid & batch.view_valid[:, None]
    fused_d, count_d = fuse_views(
        jnp.stack([l.features for l in lifts]),
        jnp.stack([l.logits for l in lifts]),
        batch.view_point_ids, vp_valid,
        num_points=P, top_k=cfg.xdecoder.fusion_top_k,
    )
    fused_d = fill_unseen_points(
        fused_d, batch.points, count_d, batch.point_valid
    )
    np.testing.assert_array_equal(
        np.asarray(lifted.view_count), np.asarray(count_d)
    )
    np.testing.assert_allclose(
        np.asarray(lifted.features), np.asarray(fused_d),
        rtol=1e-4, atol=1e-5,
    )
