"""SEEM interactive head — shapes, group isolation, prompt masking."""

import jax
import jax.numpy as jnp
import numpy as np

from geopurify_tpu.models.seem import SEEMHead, sample_mask_points


def _inputs(rng, B=1, C=16, n_cls=4):
    ms = [jnp.asarray(rng.normal(size=(B, 2, 3, C)).astype(np.float32)),
          jnp.asarray(rng.normal(size=(B, 4, 6, C)).astype(np.float32)),
          jnp.asarray(rng.normal(size=(B, 8, 12, C)).astype(np.float32))]
    mf = jnp.asarray(rng.normal(size=(B, 16, 24, C)).astype(np.float32))
    text = rng.normal(size=(n_cls, C)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    return ms, mf, jnp.asarray(text)


def _head(C=16, S=8, G=4):
    return SEEMHead(hidden_dim=C, dim_proj=C, num_queries=5, nheads=2,
                    dim_feedforward=32, dec_layers=2, mask_dim=C,
                    max_spatial_tokens=S, num_spatial_memories=3,
                    max_grounding_tokens=G)


def test_seem_shapes_and_interactive_outputs(rng):
    C, S, G = 16, 8, 4
    ms, mf, text = _inputs(rng, C=C)
    head = _head(C, S, G)
    pts = jnp.asarray(rng.uniform(0, 1, (1, S, 2)).astype(np.float32))
    pv = jnp.asarray(np.array([[True] * 5 + [False] * 3]))
    pn = jnp.asarray(np.array([[1] * 4 + [-1] * 4]))
    gt = jnp.asarray(rng.normal(size=(1, G, C)).astype(np.float32))
    gv = jnp.asarray(np.array([[True, True, False, False]]))
    prev = jnp.asarray(rng.normal(size=(1, 1, 16, 24)).astype(np.float32))
    vars_ = head.init(jax.random.key(0), ms, mf, text, jnp.float32(10.0),
                      pts, pv, pn, gt, gv, prev)
    out = head.apply(vars_, ms, mf, text, jnp.float32(10.0), pts, pv, pn,
                     gt, gv, prev)
    assert out["pred_logits"].shape == (1, 5, 4)
    assert out["pred_masks"].shape == (1, 5, 16, 24)
    # grounding/spatial groups are FULL query-set duplicates (v0 DUPLICATION)
    assert out["pred_gmasks"].shape == (1, 5, 16, 24)
    assert out["pred_smasks"].shape == (1, 5, 16, 24)
    assert out["pred_smaskembs"].shape == (1, 5, 16)
    assert out["pred_pspatials"].shape == (1, 1, 16)
    assert out["prev_mask"].shape == (1, 1, 16, 24)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_seem_object_queries_isolated_from_prompts(rng):
    """Semantic predictions must be IDENTICAL with and without interactive
    prompts — object queries attend only each other (the attention_data
    group-isolation semantics)."""
    C, S = 16, 8
    ms, mf, text = _inputs(rng, C=C)
    head = _head(C, S)
    pts = jnp.asarray(rng.uniform(0, 1, (1, S, 2)).astype(np.float32))
    pv = jnp.ones((1, S), bool)
    pn = jnp.ones((1, S), jnp.int32)
    vars_ = head.init(jax.random.key(0), ms, mf, text, jnp.float32(10.0),
                      pts, pv, pn)
    with_prompts = head.apply(vars_, ms, mf, text, jnp.float32(10.0),
                              pts, pv, pn)
    without = head.apply(vars_, ms, mf, text, jnp.float32(10.0))
    np.testing.assert_allclose(
        np.asarray(with_prompts["pred_logits"]),
        np.asarray(without["pred_logits"]), atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(with_prompts["pred_masks"]),
        np.asarray(without["pred_masks"]), atol=2e-3,
    )


def test_seem_invalid_prompt_slots_inert(rng):
    """Perturbing coordinates of INVALID prompt slots must not change the
    interactive mask."""
    C, S = 16, 8
    ms, mf, text = _inputs(rng, C=C)
    head = _head(C, S)
    pts = rng.uniform(0, 1, (1, S, 2)).astype(np.float32)
    pv = np.zeros((1, S), bool)
    pv[0, :3] = True
    pn = np.ones((1, S), np.int32)
    vars_ = head.init(jax.random.key(0), ms, mf, text, jnp.float32(10.0),
                      jnp.asarray(pts), jnp.asarray(pv), jnp.asarray(pn))
    out1 = head.apply(vars_, ms, mf, text, jnp.float32(10.0),
                      jnp.asarray(pts), jnp.asarray(pv), jnp.asarray(pn))
    pts2 = pts.copy()
    pts2[0, 3:] = rng.uniform(0, 1, (S - 3, 2))     # mutate ONLY invalid slots
    out2 = head.apply(vars_, ms, mf, text, jnp.float32(10.0),
                      jnp.asarray(pts2), jnp.asarray(pv), jnp.asarray(pn))
    np.testing.assert_allclose(
        np.asarray(out1["prev_mask"]), np.asarray(out2["prev_mask"]),
        atol=1e-5,
    )


def test_sample_mask_points():
    rng = np.random.default_rng(0)
    mask = np.zeros((10, 20), bool)
    mask[2, 5] = True
    mask[7, 15] = True
    pts, valid = sample_mask_points(mask, budget=4, rng=rng)
    assert valid.sum() == 2
    got = set(map(tuple, np.round(pts[valid] * [10, 20]).astype(int)))
    assert got == {(2, 5), (7, 15)}
    # over-budget: subsampled to the budget
    mask[:] = True
    pts, valid = sample_mask_points(mask, budget=4, rng=rng)
    assert valid.all() and pts.shape == (4, 2)
    # empty prompt
    pts, valid = sample_mask_points(np.zeros((4, 4), bool), 4, rng)
    assert not valid.any()


def _head_v1(C=16, S=8, K=2):
    from geopurify_tpu.models.seem import SEEMHeadV1

    return SEEMHeadV1(hidden_dim=C, dim_proj=C, num_queries=5, nheads=2,
                      dim_feedforward=32, dec_layers=2, mask_dim=C,
                      max_spatial_tokens=S, num_spatial_memories=3,
                      sample_size=K)


def test_seem_v1_shapes_and_memory(rng):
    """Faithful v1 head: sampled spatial-query duplicates, per-mask means,
    and the previous round's mask as per-layer channel-matched memory —
    memory changes the interactive output but NOT the object queries."""
    C, S, K = 16, 8, 2
    ms, mf, text = _inputs(rng, C=C)
    head = _head_v1(C, S, K)
    pts = jnp.asarray(rng.uniform(0, 1, (1, S, 2)).astype(np.float32))
    pv = jnp.asarray(np.array([[True] * 6 + [False] * 2]))
    pn = jnp.asarray(np.array([[1] * 4 + [-1] * 4], np.int32))
    mids = jnp.zeros((1, S), jnp.int32)
    qidx = jnp.asarray(rng.integers(0, 5, K), jnp.int32)   # num_masks=1 -> NS=K
    vars_ = head.init(jax.random.key(0), ms, mf, text, jnp.float32(10.0),
                      pts, pv, pn, mids, qidx)
    out = head.apply(vars_, ms, mf, text, jnp.float32(10.0),
                     pts, pv, pn, mids, qidx)
    assert out["pred_logits"].shape == (1, 5, 4)
    assert out["pred_smasks"].shape == (1, K, 16, 24)
    assert out["pred_pspatials"].shape == (1, 1, C)
    assert out["prev_mask"].shape == (1, 1, 16, 24)

    # round 2 with the round-1 mask as memory: interactive output shifts,
    # object queries stay bit-identical (self-attn group isolation)
    midx = jnp.zeros((2, 3), jnp.int32)                    # [dec_layers, M]
    out2 = head.apply(vars_, ms, mf, text, jnp.float32(10.0),
                      pts, pv, pn, mids, qidx,
                      prev_mask=out["prev_mask"], memory_indices=midx)
    assert not np.allclose(np.asarray(out2["prev_mask"]),
                           np.asarray(out["prev_mask"]))
    np.testing.assert_array_equal(np.asarray(out2["pred_logits"]),
                                  np.asarray(out["pred_logits"]))
    np.testing.assert_array_equal(np.asarray(out2["pred_masks"]),
                                  np.asarray(out["pred_masks"]))


def test_prepare_next_spatial_mask_click_placement():
    """Next click lands at the deepest point of the dominant error region
    (FN -> positive), dilated 3x3 (seem_model_v1.py:963-1013)."""
    from geopurify_tpu.models.seem import prepare_next_spatial_mask

    H = W = 20
    gt = np.zeros((H, W), bool)
    gt[4:16, 4:16] = True
    pred = np.zeros((H, W), bool)       # all FN
    pos = np.zeros((H, W), bool)
    neg = np.zeros((H, W), bool)
    pos2, neg2, iou = prepare_next_spatial_mask(pred, gt, pos, neg)
    assert iou == 0.0 and not neg2.any()
    ys, xs = np.nonzero(pos2)
    # the click centers at the FN region's deepest point (9or10, 9or10)
    assert 8 <= ys.mean() <= 11 and 8 <= xs.mean() <= 11
    assert 4 <= pos2.sum() <= 9          # 3x3 dilation

    # false-positive-dominant case -> negative click
    pred2 = np.ones((H, W), bool)
    gt2 = np.zeros((H, W), bool)
    gt2[0:2, 0:2] = True
    p3, n3, _ = prepare_next_spatial_mask(pred2, gt2, pos, neg)
    assert n3.any() and not p3.any()

    # early stop at high IoU: masks unchanged
    p4, n4, iou4 = prepare_next_spatial_mask(gt, gt, pos, neg)
    assert iou4 > 0.99 and not p4.any() and not n4.any()


def test_interactive_refine_improves_iou(rng):
    """The v1 click-refinement loop on a tiny random-weight model: IoU is
    tracked per round and the loop terminates; points resample each round."""
    import jax

    from geopurify_tpu.models.seem import interactive_refine

    C, S, K = 16, 8, 2
    ms, mf, text = _inputs(rng, C=C)
    head = _head_v1(C, S, K)
    pts0 = jnp.zeros((1, S, 2))
    mids = jnp.zeros((1, S), jnp.int32)
    qidx0 = jnp.zeros((K,), jnp.int32)
    vars_ = head.init(jax.random.key(0), ms, mf, text, jnp.float32(10.0),
                      pts0, jnp.zeros((1, S), bool),
                      jnp.ones((1, S), jnp.int32), mids, qidx0)
    host = np.random.default_rng(3)

    def apply_fn(pts, valid, tags, prev):
        qidx = jnp.asarray(host.integers(0, 5, K), jnp.int32)
        kw = {}
        if prev is not None:
            kw = dict(prev_mask=prev,
                      memory_indices=jnp.zeros((2, 3), jnp.int32))
        return head.apply(
            vars_, ms, mf, text, jnp.float32(10.0),
            jnp.asarray(pts)[None], jnp.asarray(valid)[None],
            jnp.asarray(tags)[None], mids, qidx, **kw,
        )

    gt = np.zeros((16, 24), bool)
    gt[4:12, 6:18] = True
    init = np.zeros((16, 24), bool)
    init[8, 12] = True
    logits, ious = interactive_refine(apply_fn, gt, init, budget=S, iters=3)
    assert logits.shape == (16, 24)
    assert 1 <= len(ious) <= 3 and all(np.isfinite(ious))


def test_infer_interactive_cli_synthetic(tmp_path):
    """geopurify-interactive end-to-end on the synthetic image with the
    faithful v1 head (host-drawn query/memory indices per round)."""
    from geopurify_tpu.run import infer_interactive as ii

    dst = ii.main([
        "--synthetic", "--clicks", "40,60", "--rounds", "2", "--budget", "8",
        "--out", str(tmp_path / "demo.png"),
        "xdecoder.hidden_dim=16", "xdecoder.conv_dim=16", "xdecoder.mask_dim=16",
        "xdecoder.num_queries=5", "xdecoder.nheads=2",
        "xdecoder.dim_feedforward=32", "xdecoder.dec_layers=2",
        "xdecoder.enc_layers=1", "xdecoder.dtype=float32",
        "xdecoder.backbone.embed_dim=8", "xdecoder.backbone.depths=[1,1,1,1]",
        "xdecoder.backbone.focal_levels=[2,2,2,2]",
        "data.all_label=['a','b','c']",
    ])
    import os
    assert os.path.exists(dst)


def test_interactive_eval_noc_cli(tmp_path):
    """`geopurify-interactive --eval-noc N` runs the full NoC protocol
    end-to-end (≙ interactive_evaluation.py:39-77 over the v1
    evaluate_interactive loop): SimpleClick-placed first click ->
    error-driven refinement -> NoC@t / mIoU@iter metrics as one JSON
    line (random weights saturate NoC at max_clicks — the protocol
    machinery is what's pinned)."""
    import json
    import subprocess
    import sys

    env_args = [
        sys.executable, "-m", "geopurify_tpu.run.infer_interactive",
        "--synthetic", "--eval-noc", "2", "--rounds", "3", "--budget", "32",
        "xdecoder.hidden_dim=16", "xdecoder.conv_dim=16",
        "xdecoder.mask_dim=16", "xdecoder.num_queries=5", "xdecoder.nheads=2",
        "xdecoder.dim_feedforward=32", "xdecoder.dec_layers=1",
        "xdecoder.enc_layers=1", "xdecoder.dtype=float32",
        "xdecoder.backbone.embed_dim=8", "xdecoder.backbone.depths=[1,1,1,1]",
        "xdecoder.backbone.focal_levels=[2,2,2,2]",
    ]
    import os

    env = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}
    res = subprocess.run(env_args, capture_output=True, text=True, env=env,
                         timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    rec = json.loads(res.stdout.strip().splitlines()[-1])
    for t in (0.5, 0.8, 0.85, 0.9):
        assert 1.0 <= rec[f"noc@{t}"] <= 3.0
    assert 0.0 <= rec["miou@iter1"] <= 1.0
