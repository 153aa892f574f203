"""Hungarian matcher + set criterion (X-Decoder pretraining loss stack)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geopurify_tpu.models.criterion import (
    dice_loss,
    hungarian_match,
    set_criterion,
    sigmoid_ce_loss,
)


def test_hungarian_match_identity():
    # diagonal-cheap cost -> identity assignment
    cost = jnp.asarray(np.eye(4) * -10 + 1)[None]
    a = np.asarray(hungarian_match(cost))[0]
    np.testing.assert_array_equal(a, np.arange(4))


def test_hungarian_rectangular():
    # 5 queries, 2 targets: exactly 2 queries matched
    rng = np.random.default_rng(0)
    cost = jnp.asarray(rng.random((1, 5, 2)))
    a = np.asarray(hungarian_match(cost))[0]
    assert (a >= 0).sum() == 2
    matched = a[a >= 0]
    assert sorted(matched.tolist()) == [0, 1]


def test_dice_perfect_and_worst():
    perfect = dice_loss(jnp.full((1, 16), 20.0), jnp.ones((1, 16)), jnp.ones(1))
    assert float(perfect) < 0.01
    worst = dice_loss(jnp.full((1, 16), 20.0), jnp.zeros((1, 16)), jnp.ones(1))
    assert float(worst) > 0.9


def test_sigmoid_ce_matches_manual(rng):
    x = jnp.asarray(rng.normal(size=(3, 10)).astype(np.float32))
    t = jnp.asarray((rng.random((3, 10)) < 0.5).astype(np.float32))
    got = sigmoid_ce_loss(x, t, jnp.ones(3))
    p = jax.nn.sigmoid(x)
    ref = -(t * jnp.log(p + 1e-9) + (1 - t) * jnp.log(1 - p + 1e-9)).mean()
    assert float(got) == pytest.approx(float(ref), rel=1e-3)


def test_set_criterion_end_to_end(rng):
    B, Q, n_cls, T, H, W = 2, 6, 4, 3, 16, 20
    key = jax.random.key(0)
    # ground truth: axis-aligned box masks with classes
    gt_masks = np.zeros((B, T, H, W), np.float32)
    gt_cls = rng.integers(0, n_cls, (B, T)).astype(np.int32)
    gt_valid = np.zeros((B, T), bool)
    for b in range(B):
        for t in range(2):  # 2 valid targets of 3
            r0, c0 = rng.integers(0, H // 2), rng.integers(0, W // 2)
            gt_masks[b, t, r0:r0 + 6, c0:c0 + 8] = 1
            gt_valid[b, t] = True

    # predictions that nail the GT -> tiny loss
    good_logits = np.full((B, Q, n_cls + 1), -5.0, np.float32)
    good_masks = np.full((B, Q, H, W), -12.0, np.float32)
    for b in range(B):
        for t in range(2):
            good_logits[b, t, gt_cls[b, t]] = 8.0
            good_masks[b, t] = np.where(gt_masks[b, t] > 0, 12.0, -12.0)
        good_logits[b, 2:, n_cls] = 8.0  # rest predict no-object

    out_good = set_criterion(
        jnp.asarray(good_logits), jnp.asarray(good_masks),
        jnp.asarray(gt_cls), jnp.asarray(gt_masks), jnp.asarray(gt_valid),
        key, num_points=256,
    )
    # random predictions -> much larger loss
    bad_logits = jnp.asarray(rng.normal(size=(B, Q, n_cls + 1)).astype(np.float32))
    bad_masks = jnp.asarray(rng.normal(size=(B, Q, H, W)).astype(np.float32))
    out_bad = set_criterion(
        bad_logits, bad_masks,
        jnp.asarray(gt_cls), jnp.asarray(gt_masks), jnp.asarray(gt_valid),
        key, num_points=256,
    )
    assert float(out_good["loss"]) < 0.3
    assert float(out_bad["loss"]) > float(out_good["loss"]) * 3


def test_set_criterion_grads(rng):
    B, Q, n_cls, T, H, W = 1, 4, 3, 2, 8, 8
    key = jax.random.key(1)
    gt_masks = jnp.asarray((rng.random((B, T, H, W)) < 0.3).astype(np.float32))
    gt_cls = jnp.asarray(rng.integers(0, n_cls, (B, T)).astype(np.int32))
    gt_valid = jnp.ones((B, T), bool)

    def loss_fn(logits, masks):
        return set_criterion(
            logits, masks, gt_cls, gt_masks, gt_valid, key, num_points=64
        )["loss"]

    logits = jnp.asarray(rng.normal(size=(B, Q, n_cls + 1)).astype(np.float32))
    masks = jnp.asarray(rng.normal(size=(B, Q, H, W)).astype(np.float32))
    gl, gm = jax.grad(loss_fn, argnums=(0, 1))(logits, masks)
    assert np.isfinite(np.asarray(gl)).all() and np.abs(np.asarray(gl)).sum() > 0
    assert np.isfinite(np.asarray(gm)).all() and np.abs(np.asarray(gm)).sum() > 0
