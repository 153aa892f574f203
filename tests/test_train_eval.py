"""Training step (multi-device DP), metrics, optimizer, checkpoint round-trip."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from geopurify_tpu.config import TrainConfig
from geopurify_tpu.utils.metrics import AverageMeter, SegMeter, intersection_and_union
from geopurify_tpu.run.optim import label_params, make_optimizer, make_schedule


def test_intersection_and_union_oracle(rng):
    n, k = 500, 5
    pred = rng.integers(0, k, n)
    target = rng.integers(0, k + 2, n)  # includes ignore ids k, k+1
    valid = np.ones(n, bool)
    valid[-50:] = False
    i, u, t = intersection_and_union(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(valid), k, (k, k + 1)
    )
    i, u, t = np.asarray(i), np.asarray(u), np.asarray(t)
    keep = valid & (target < k)
    for c in range(k):
        inter = ((pred == c) & (target == c) & keep).sum()
        assert i[c] == inter
        assert t[c] == ((target == c) & keep).sum()
        assert u[c] == ((pred == c) & keep).sum() + t[c] - inter


def test_seg_meter_groups():
    m = SegMeter(num_classes=4, base_category=[0, 1], novel_category=[2, 3])
    m.update(np.array([5, 0, 2, 1]), np.array([10, 1, 4, 1]), np.array([5, 1, 2, 2]))
    s = m.summary()
    assert s["base"]["mIoU"] == pytest.approx((0.5 + 0.0) / 2)
    assert s["novel"]["mIoU"] == pytest.approx((0.5 + 1.0) / 2)
    assert s["all"]["allAcc"] == pytest.approx(8 / 10)


def test_seg_meter_foreground_group():
    """f-mIoU/f-mAcc hand-computed pin: foreground excludes wall/floor/ceiling
    by exact name (reference README.md:115-117 defines the published
    ScanNet200 f-metrics this way)."""
    from geopurify_tpu.config import DataConfig

    dc = DataConfig(
        all_label=("wall", "floor", "shower wall", "chair", "ceiling"),
        test_classes=5,
    )
    fg = dc.foreground_category()
    assert fg == (2, 3)  # compound 'shower wall' stays foreground

    m = SegMeter(num_classes=5, foreground_category=fg)
    inter = np.array([9, 8, 2, 3, 7], float)
    union = np.array([10, 9, 4, 6, 8], float)
    target = np.array([9, 9, 2, 4, 7], float)
    m.update(inter, union, target)
    s = m.summary()
    assert s["foreground"]["mIoU"] == pytest.approx((2 / 4 + 3 / 6) / 2)
    assert s["foreground"]["mAcc"] == pytest.approx((2 / 2 + 3 / 4) / 2)
    assert s["foreground"]["allAcc"] == pytest.approx((2 + 3) / (2 + 4))
    # the all group is untouched by the foreground selection
    assert s["all"]["allAcc"] == pytest.approx(inter.sum() / target.sum())


def test_eval_histogram_psum_across_devices():
    """Cross-shard I/U/T reduction (≙ dist.all_reduce, run/validation.py:441-450):
    psum over the 8-device CPU mesh sums per-device histograms; the host-level
    allreduce is a no-op for a single process but must keep the meter intact."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from geopurify_tpu.parallel.mesh import make_mesh
    from geopurify_tpu.utils.metrics import (
        allreduce_meter_across_hosts,
        psum_histograms,
    )

    assert jax.device_count() == 8
    mesh = make_mesh(dp=8)
    per_dev = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)

    def reduce_fn(h):
        return psum_histograms(h[0], "data")[None]

    summed = jax.jit(
        shard_map(reduce_fn, mesh=mesh, in_specs=P("data"), out_specs=P("data"))
    )(per_dev)
    want = np.asarray(per_dev).sum(0)
    for d in range(8):
        np.testing.assert_allclose(np.asarray(summed)[d], want)

    m = SegMeter(num_classes=4)
    m.update(want, want * 2, want * 3)
    m2 = allreduce_meter_across_hosts(m)  # single process: identity
    np.testing.assert_allclose(m2.intersection, want)
    np.testing.assert_allclose(m2.union, want * 2)


def test_schedule_warmup_cosine():
    cfg = TrainConfig(lr_3d=1e-4, warmup_epochs=2, epochs=10)
    sched = make_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) < 1e-5
    assert float(sched(20)) == pytest.approx(1e-4, rel=1e-3)
    assert float(sched(99)) < 1e-5


def test_three_tier_optimizer_lrs():
    params = {
        "input_conv": {"kernel": jnp.ones((4, 4))},
        "res0": {"conv1": {"kernel": jnp.ones((4, 4))}},
        "output_conv": {"kernel": jnp.ones((4, 4))},
    }
    labels = label_params(params)
    assert labels["input_conv"]["kernel"] == "input"
    assert labels["res0"]["conv1"]["kernel"] == "middle"
    assert labels["output_conv"]["kernel"] == "output"

    cfg = TrainConfig(lr_3d=1e-3, warmup_epochs=0, epochs=1, weight_decay=0.0)
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # equal grads -> update magnitudes scale with group multiplier
    u_in = float(jnp.abs(updates["input_conv"]["kernel"]).mean())
    u_mid = float(jnp.abs(updates["res0"]["conv1"]["kernel"]).mean())
    u_out = float(jnp.abs(updates["output_conv"]["kernel"]).mean())
    assert u_in < u_mid < u_out
    assert u_out / u_in == pytest.approx(50.0, rel=0.05)


def test_average_meter():
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0, n=3)
    assert m.avg == pytest.approx(3.5)


def test_multi_device_train_step_runs():
    """DP train step over the 8-device CPU mesh with a tiny pipeline."""
    assert jax.device_count() == 8
    from tests.test_pipeline import tiny_cfg
    from geopurify_tpu.data.synthetic import make_scene_batch
    from geopurify_tpu.models.pipeline import GeoPurifyPipeline
    from geopurify_tpu.models.xdecoder import XDecoderSegModel
    from geopurify_tpu.parallel.mesh import make_mesh
    from geopurify_tpu.run.train import TrainState, make_train_step, stack_scenes

    cfg = tiny_cfg()
    key = jax.random.key(0)
    n_cls = len(cfg.data.all_label)
    text = jax.random.normal(key, (n_cls + 1, cfg.xdecoder.hidden_dim))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    batches = [
        make_scene_batch(seed=i, n_points=300, n_views=1, image_hw=(48, 64),
                         max_points=512, max_voxels=512, max_views=1,
                         max_view_points=256)
        for i in range(2)
    ]
    model = XDecoderSegModel(cfg.xdecoder)
    tparams = model.init(key, batches[0].images[:1], text, jnp.float32(20.0))
    pipe = GeoPurifyPipeline(cfg=cfg, teacher_params=tparams,
                             text_embeddings=text, logit_scale=jnp.float32(20.0))

    student_vars = pipe.student.init(
        key, jnp.zeros((8, cfg.student.input_dim)),
        jnp.full((8, 27), 8, jnp.int32), jnp.ones(8, bool), train=False,
    )
    tx, _ = make_optimizer(cfg.train, student_vars["params"], steps_per_epoch=10)
    state = TrainState(
        params=student_vars["params"], batch_stats=student_vars["batch_stats"],
        opt_state=tx.init(student_vars["params"]), step=jnp.zeros((), jnp.int32),
    )
    mesh = make_mesh(dp=8)
    step_fn = make_train_step(pipe, tx, mesh, "data")

    # one scene per device (repeat the two fixtures)
    scenes = [batches[i % 2] for i in range(8)]
    f2ds = [pipe.lift_scene(s).features for s in batches]
    fts = [jax.random.normal(jax.random.key(i), (512, 16)) for i in range(2)]
    stacked = stack_scenes(scenes)
    f2d = jnp.stack([f2ds[i % 2] for i in range(8)])
    ft = jnp.stack([fts[i % 2] for i in range(8)])

    state2, loss = step_fn(state, stacked, f2d, ft, jax.random.key(1))
    assert np.isfinite(float(loss))
    assert int(state2.step) == 1
    # params actually moved
    delta = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, state2.params, state.params),
        0.0,
    )
    assert delta > 0


def test_checkpoint_roundtrip(tmp_path):
    from geopurify_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    state = {
        "params": {"w": jnp.arange(4.0)},
        "step": jnp.int32(7),
    }
    save_checkpoint(str(tmp_path / "ck"), state, step=7)
    template = {"params": {"w": jnp.zeros(4)}, "step": jnp.int32(0)}
    restored, step = restore_checkpoint(str(tmp_path / "ck"), template)
    assert step == 7
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), np.arange(4.0))


def test_grad_accumulation():
    """optax.MultiSteps wrapping: params move only every k-th step."""
    cfg = TrainConfig(lr_3d=1e-2, warmup_epochs=0, epochs=1,
                      weight_decay=0.0, grad_accum_steps=2)
    params = {"res0": {"conv1": {"kernel": jnp.ones((4, 4))}}}
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    up1, state = tx.update(grads, state, params)
    assert float(jnp.abs(up1["res0"]["conv1"]["kernel"]).sum()) == 0.0  # accumulating
    up2, state = tx.update(grads, state, params)
    assert float(jnp.abs(up2["res0"]["conv1"]["kernel"]).sum()) > 0.0   # applied


def test_view_parallel_lift_matches_sequential():
    """Within-scene view parallelism: views sharded over the 8-device CPU mesh
    + psum consensus + hypercube top-k tournament must reproduce the
    sequential lift_scene (up to fp reduction order / equal-score ties)."""
    from tests.test_pipeline import tiny_cfg
    from geopurify_tpu.data.synthetic import make_scene_batch
    from geopurify_tpu.models.pipeline import GeoPurifyPipeline
    from geopurify_tpu.models.xdecoder import XDecoderSegModel
    from geopurify_tpu.parallel.mesh import make_mesh
    from geopurify_tpu.parallel.view_parallel import sharded_lift_scene

    cfg = tiny_cfg()
    batch = make_scene_batch(
        seed=3, n_points=400, n_views=8, image_hw=(48, 64),
        max_points=512, max_voxels=512, max_views=8, max_view_points=256,
    )
    key = jax.random.key(0)
    n_cls = len(cfg.data.all_label)
    text = jax.random.normal(key, (n_cls + 1, cfg.xdecoder.hidden_dim))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    model = XDecoderSegModel(cfg.xdecoder)
    tparams = model.init(key, batch.images[:1], text, jnp.float32(20.0))
    pipe = GeoPurifyPipeline(cfg=cfg, teacher_params=tparams,
                             text_embeddings=text, logit_scale=jnp.float32(20.0))

    seq = pipe.lift_scene(batch)
    mesh = make_mesh(dp=8)
    fused, count = sharded_lift_scene(pipe, batch, mesh, "data")
    np.testing.assert_allclose(
        np.asarray(count), np.asarray(seq.view_count), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(seq.features), atol=2e-3
    )


def test_checkpoint_save_retry_failure_injection(tmp_path):
    """Transient save failures are retried (≙ reference trainer's 3-attempt
    loop, trainer/utils_trainer.py:125-140); persistent failures re-raise."""
    from geopurify_tpu.utils.checkpoint import save_checkpoint_with_retry

    calls = {"n": 0}

    def flaky(path, state, step, keep=3):
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("injected transient write failure")

    used = save_checkpoint_with_retry(
        str(tmp_path / "ck"), {"x": 1}, step=0, sleep_s=0.0, _save=flaky
    )
    assert used == 3 and calls["n"] == 3

    def always_fails(path, state, step, keep=3):
        raise OSError("disk on fire")

    with pytest.raises(OSError, match="disk on fire"):
        save_checkpoint_with_retry(
            str(tmp_path / "ck"), {"x": 1}, step=0, sleep_s=0.0,
            _save=always_fails,
        )
