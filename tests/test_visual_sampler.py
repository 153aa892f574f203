"""Visual-sampler family (VERDICT r4 next #4): torch-oracle parity +
production-mode semantics.

Parity: every case in parity.oracle.visual_sampler_oracle — ShapeSampler
train (mixed + per-shape forced), ShapeSampler eval (growing prompt
stacks), SimpleClickSampler (Point/Circle/Scribble/Polygon/Box) — is
replayed through data/visual_sampler.py in Draws.torch_compat mode after
identical re-seeding; masks pin BIT-EXACTLY (the rng streams coincide
call-for-call). ≙ xdecoder/datasets/visual_sampler/*."""

import numpy as np
import pytest

from geopurify_tpu.data import visual_sampler as vs


def _scene(n=3, h=40, w=56, seed=3):
    rng = np.random.default_rng(seed)
    masks = np.zeros((n, h, w), bool)
    boxes = np.zeros((n, 4), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        cy = float(rng.integers(12, h - 12))
        cx = float(rng.integers(14, w - 14))
        ry, rx = float(rng.integers(7, 10)), float(rng.integers(9, 12))
        m = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) <= 1.0
        masks[i] = m
        ys, xs = np.nonzero(m)
        boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    return masks, boxes


def test_parity_visual_sampler():
    """Bit-exact replay of the reference sampler family (torch-cpu,
    seeded) through the numpy rebuild."""
    from geopurify_tpu.parity import compare

    rows = compare.parity_visual_sampler()
    assert len(rows) == 14
    bad = {k: v for k, v in rows.items() if v != (0.0, 0.0)}
    assert not bad, f"sampler cases diverge from the reference: {bad}"


def test_shape_sampler_train_semantics():
    masks, boxes = _scene()
    cfg = vs.StrokeSamplerConfig(max_candidate=2)
    out = vs.ShapeSampler(cfg, is_train=True)(
        masks, boxes, vs.Draws(np.random.default_rng(0)))
    assert out["rand_shape"].shape == (2,) + masks.shape[1:]
    assert out["rand_shape"].dtype == bool
    assert len(out["types"]) == 2
    for t, shape, gt in zip(out["types"], out["rand_shape"], out["gt_masks"]):
        assert t in ("point", "polygon", "scribble", "circle", "none")
        if t in ("point", "scribble", "circle"):
            # stroke/point prompts are intersected with the instance mask
            assert not (shape & ~gt).any()
        if t != "none":
            assert shape.any()


def test_shape_sampler_deterministic_given_generator():
    masks, boxes = _scene()
    cfg = vs.StrokeSamplerConfig(max_candidate=3)
    a = vs.ShapeSampler(cfg, is_train=True)(
        masks, boxes, vs.Draws(np.random.default_rng(7)))
    b = vs.ShapeSampler(cfg, is_train=True)(
        masks, boxes, vs.Draws(np.random.default_rng(7)))
    assert np.array_equal(a["rand_shape"], b["rand_shape"])
    assert a["types"] == b["types"]
    c = vs.ShapeSampler(cfg, is_train=True)(
        masks, boxes, vs.Draws(np.random.default_rng(8)))
    assert (a["types"] != c["types"]
            or not np.array_equal(a["rand_shape"], c["rand_shape"]))


def test_shape_sampler_empty_instances():
    out = vs.ShapeSampler(vs.StrokeSamplerConfig(), is_train=True)(
        np.zeros((0, 16, 16), bool), np.zeros((0, 4), np.float32))
    assert out["types"] == ["none"]
    assert out["rand_shape"].shape == (1, 16, 16)
    assert not out["rand_shape"].any()


def test_point_eval_polarity_stack():
    """Eval point prompts grow one click per iteration; the first click is
    always positive; negatives carry -1 (point.py:35-71)."""
    masks, _ = _scene(n=1)
    cfg = vs.StrokeSamplerConfig(eval_max_iter=6)
    p = vs.PointSampler(cfg, is_train=False)
    stack = p.draw(masks[0], None, vs.Draws(np.random.default_rng(0)))
    n_iter = stack.shape[0]
    assert n_iter == 3 + 4  # neg_num=3, pos_num=4 at max_iter=6
    counts = [int((stack[i] != 0).sum()) for i in range(n_iter)]
    assert counts == list(range(1, n_iter + 1))
    first = stack[0]
    assert first[first != 0].min() == 1.0     # first click positive
    assert ((stack[-1] == 1) & ~masks[0]).sum() == 0   # +1 inside gt
    assert ((stack[-1] == -1) & masks[0]).sum() == 0   # -1 outside gt


def test_simpleclick_point_click_in_mask():
    masks, boxes = _scene()
    cfg = vs.StrokeSamplerConfig(dilation=3)
    s = vs.SimpleClickSampler(cfg, is_train=False, mode="Point")
    out = s(masks, boxes, draws=vs.Draws(np.random.default_rng(0)))
    assert out["rand_shape"].shape == (len(masks), 1) + masks.shape[1:]
    for i in range(len(masks)):
        clicked = out["rand_shape"][i, 0]
        assert clicked.any()
        # the click centers on the deepest gt pixel -> inside the mask
        assert (clicked & masks[i]).any()


def test_simpleclick_iterative_prev_mask_grows():
    masks, boxes = _scene()
    cfg = vs.StrokeSamplerConfig(dilation=3)
    s = vs.SimpleClickSampler(cfg, is_train=False, mode="Point")
    d = vs.Draws(np.random.default_rng(0))
    out1 = s(masks, boxes, draws=d)
    prev = out1["rand_shape"][:, 0]
    out2 = s(masks, boxes, prev_masks=prev, draws=d)
    nxt = out2["rand_shape"][:, 0]
    # prompts accumulate: prev ⊆ next, and the new click lands outside prev
    assert (prev & ~nxt).sum() == 0
    assert (nxt & ~prev).sum() > 0


def test_distance_transform_center():
    """The conv-approx distance transform peaks at the deepest interior
    pixel of a region (the SimpleClick click-placement contract)."""
    m = np.zeros((1, 21, 21), bool)
    m[0, 4:17, 6:15] = True
    clicks = vs._center_clicks(m)
    y, x = divmod(int(clicks[0]), 21)
    assert 8 <= y <= 12 and 8 <= x <= 12     # middle of the rectangle


def test_build_shape_sampler_dispatch():
    cfg_rand = vs.StrokeSamplerConfig(eval_mode="random")
    cfg_best = vs.StrokeSamplerConfig(eval_mode="best")
    assert isinstance(vs.build_shape_sampler(cfg_rand, is_train=False),
                      vs.ShapeSampler)
    assert isinstance(vs.build_shape_sampler(cfg_best, is_train=False),
                      vs.SimpleClickSampler)
    # training always uses the random shape sampler (≙ __init__.py:5-11
    # routing via EVAL.MODE only at eval time)
    assert isinstance(vs.build_shape_sampler(cfg_best, is_train=True),
                      vs.ShapeSampler)


def test_bezier_closed_curve():
    pts = np.array([[0.2, 0.2], [0.8, 0.3], [0.5, 0.9]])
    x, y, _ = vs.get_bezier_curve(pts, rad=0.2, edgy=0.05)
    assert len(x) == len(y) == 300           # 3 segments x 100 points
    # closed: last curve point returns to the (ccw-sorted) start
    assert abs(x[-1] - x[0]) < 1e-9 and abs(y[-1] - y[0]) < 1e-9
