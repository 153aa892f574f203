"""2D pretraining loop pieces + 2D inference demo semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geopurify_tpu.run.train2d import make_schedule, synthetic_batch
from geopurify_tpu.run.infer2d import semseg_from_outputs


def test_synthetic_batch_shapes(rng):
    imgs, cls, masks, valid = synthetic_batch(rng, batch=2, hw=(32, 48), n_cls=5)
    assert imgs.shape == (2, 32, 48, 3)
    assert masks.shape[2:] == (8, 12)           # stride-4 grid
    assert cls.shape == masks.shape[:2] == valid.shape
    v = np.asarray(valid)
    assert v.any(1).all()                       # every image has >= 1 target
    m = np.asarray(masks)
    assert (m[v].sum(axis=(1, 2)) > 0).all()    # valid targets are non-empty
    assert np.asarray(cls)[v].max() < 5


def test_warmup_step_schedule():
    import pytest

    sched = make_schedule(1e-4, warmup_steps=10, decay_steps=(100, 200), gamma=0.1)
    assert float(sched(0)) == 0.0
    assert float(sched(5)) == pytest.approx(5e-5, rel=1e-5)
    assert float(sched(50)) == pytest.approx(1e-4, rel=1e-5)
    assert float(sched(150)) == pytest.approx(1e-5, rel=1e-5)
    assert float(sched(250)) == pytest.approx(1e-6, rel=1e-5)


def test_semseg_from_outputs_argmax():
    """A dominant mask+class pair must win its covered pixels."""
    Q, n_cls, h, w = 3, 4, 8, 8
    logits = jnp.full((Q, n_cls), -5.0)
    logits = logits.at[0, 2].set(5.0)           # query 0 -> class 2
    logits = logits.at[1, 1].set(5.0)           # query 1 -> class 1
    masks = jnp.full((Q, h, w), -10.0)
    masks = masks.at[0, :4].set(10.0)           # top half
    masks = masks.at[1, 4:].set(10.0)           # bottom half
    seg = np.asarray(semseg_from_outputs(logits, masks, (16, 16)))
    assert seg.shape == (16, 16)
    assert (seg[:6] == 2).all()
    assert (seg[10:] == 1).all()


def test_semseg2d_evaluator_oracle(rng):
    """Confusion-matrix evaluator vs a hand-computed oracle, with ignore."""
    from geopurify_tpu.utils.eval2d import SemSeg2DEvaluator

    n = 3
    ev = SemSeg2DEvaluator(n, class_names=["a", "b", "c"], ignore_label=255)
    gt = np.array([[0, 0, 1], [1, 2, 255]])
    pred = np.array([[0, 1, 1], [1, 1, 0]])
    ev.process(pred, gt)
    ev.process(pred, gt)   # accumulation: same stats, doubled counts
    res = ev.evaluate()
    # valid cells (gt != 255): gt [0,0,1,1,2], pred [0,1,1,1,1]
    # a: tp=1 gt=2 pred=1 -> iou 1/2; b: tp=2 gt=2 pred=4 -> 2/4
    # c: tp=0 gt=1 pred=0 -> 0
    assert res["IoU-a"] == pytest.approx(50.0)
    assert res["IoU-b"] == pytest.approx(50.0)
    assert res["IoU-c"] == 0.0
    assert res["mIoU"] == pytest.approx(100 / 3)
    assert res["pACC"] == pytest.approx(100 * 3 / 5)
    ev.reset()
    assert ev.conf.sum() == 0
