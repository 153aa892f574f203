"""Stage-1 training entry — geometric distillation of the student.

TPU-native re-design of the reference trainer (reference run/train.py:65-399):
- data parallelism over the `data` mesh axis via shard_map: one scene per
  device per step, grads pmean'd (≙ DDP allreduce, run/train.py:206-208), BN
  moments psum'd in-layer (≙ the two SyncBN conversions :212-213);
- AdamW with 3-tier LRs + warmup-cosine (run/optim.py);
- orbax checkpoint/resume of student params, batch stats, optimizer state,
  step and RNG (≙ run/train.py:215-263, 371-391);
- teacher features (X-Decoder lift + Sonata) are computed outside the
  differentiated step — they are frozen inputs, exactly the reference's
  torch.no_grad blocks (affinity_module.py:1139-1167).

Usage:
  python -m geopurify_tpu.run.train --preset scannet --data-root ... [k=v ...]
  python -m geopurify_tpu.run.train --synthetic --epochs 2   # smoke mode
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import logging
import os
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from geopurify_tpu.config import GeoPurifyConfig, load_config
from geopurify_tpu.data.batch import SceneBatch
from geopurify_tpu.models.pipeline import GeoPurifyPipeline
from geopurify_tpu.parallel.mesh import make_mesh
from geopurify_tpu.run.optim import make_optimizer
from geopurify_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint_with_retry as save_checkpoint,  # 3-attempt retry (ref utils_trainer.py:125-140)
)

log = logging.getLogger("geopurify.train")


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def make_train_step(pipeline: GeoPurifyPipeline, tx, mesh: Mesh, data_axis: str):
    """Returns a jitted shard_map step: scenes sharded over `data`, state replicated."""
    if pipeline.cfg.parallel.sync_batchnorm and mesh.shape[data_axis] > 1:
        # SyncBN: the student used INSIDE the sharded step psums its batch
        # moments over `data` (≙ the reference's double SyncBN conversion,
        # run/train.py:212-213). A separate module instance is needed — the
        # pipeline's own student also runs outside any mesh context (eval).
        import copy

        from geopurify_tpu.models.student import AffinityPredictor

        s = pipeline.cfg.student
        pipeline = copy.copy(pipeline)
        pipeline.student = AffinityPredictor(
            input_dim=s.input_dim, hidden_dim=s.hidden_dim,
            embed_dim=s.embed_dim, num_res_blocks=s.num_res_blocks,
            bn_momentum=s.bn_momentum, axis_name=data_axis,
        )

    def device_step(state: TrainState, scene: SceneBatch, f2d, f_teacher, rng):
        # leading per-device dim of 1 -> squeeze
        scene = jax.tree_util.tree_map(lambda x: x[0], scene)
        f2d = f2d[0]
        f_teacher = f_teacher[0]
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            loss, updates = pipeline.stage1_loss(
                variables, rng, scene, f2d, f_teacher, train=True
            )
            return loss, updates.get("batch_stats", state.batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = jax.lax.pmean(grads, data_axis)
        loss = jax.lax.pmean(loss, data_axis)
        new_stats = jax.lax.pmean(new_stats, data_axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_stats, opt_state, state.step + 1), loss

    mapped = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis), P(data_axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def stack_scenes(scenes) -> Any:
    """Stack a list of SceneBatch pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *scenes)


# ---------------------------------------------------------------------------
# Entry
# ---------------------------------------------------------------------------

def build_pipeline(
    cfg: GeoPurifyConfig, rng_key, init_teachers: bool = True,
    require_teachers: bool = False, return_lang: bool = False,
):
    """Construct the pipeline with frozen teachers and text embeddings.

    Teacher params come from the converted released checkpoints when
    ``cfg.xdecoder.ckpt`` / ``cfg.sonata.ckpt`` are set (≙ the reference's
    ``from_pretrained(xdecoder_focall_last.pt)`` + ``sonata.load``,
    affinity_module.py:228-264); otherwise they are ZERO-initialized shape
    stand-ins — fine for shape/smoke tests, garbage on real data. Pass
    ``require_teachers=True`` (real-data entry points do) to warn loudly in
    that case.
    """
    from geopurify_tpu.models.lang import (
        HashTokenizer,
        LanguageEncoder,
        build_tokenizer,
        embed_class_names,
    )
    from geopurify_tpu.models.sonata import SonataTeacher
    from geopurify_tpu.models.xdecoder import XDecoderSegModel

    n_cls = len(cfg.data.all_label)
    tk = build_tokenizer(cfg.text.tokenizer_vocab, cfg.text.context_length)
    lang = LanguageEncoder(
        vocab_size=cfg.text.vocab_size, width=cfg.text.width,
        layers=cfg.text.layers, heads=cfg.text.heads,
        context_length=cfg.text.context_length, dim_proj=cfg.text.dim_proj,
    )
    conv = None
    if cfg.xdecoder.ckpt:
        from geopurify_tpu.utils.checkpoint import load_torch_state_dict
        from geopurify_tpu.utils.convert_xdecoder import convert_xdecoder_checkpoint

        log.info("converting X-Decoder teacher checkpoint %s", cfg.xdecoder.ckpt)
        conv = convert_xdecoder_checkpoint(load_torch_state_dict(cfg.xdecoder.ckpt))
        lang_vars = conv["lang"]
    elif require_teachers:
        log.warning(
            "REAL-DATA RUN WITH UNINITIALIZED 2D TEACHER: xdecoder.ckpt is not "
            "set, so the frozen X-Decoder teacher is all zeros and every lifted "
            "feature (and any mIoU built on it) is meaningless. Set "
            "xdecoder.ckpt=/path/to/xdecoder_focall_last.pt."
        )
    if conv is None:
        ids, _ = tk(["init"])
        lang_vars = lang.init(rng_key, jnp.asarray(ids))
    # class names ride the scene prompt ("a wall in a scene", ..., "background")
    # before template averaging — reference affinity_module.py:242-245
    text = jnp.asarray(
        embed_class_names(
            lambda v, i: lang.apply(v, i), lang_vars, tk,
            list(cfg.data.all_label), use_templates=cfg.text.prompt_eng,
            template=cfg.text.prompt_template,
        )
    )
    if conv is not None:
        logit_scale = jnp.float32(conv["logit_scale"])  # already exp'd
    else:
        logit_scale = jnp.exp(lang.apply(lang_vars, method=lambda m: m.logit_scale))

    def zeros_from_shapes(tree):
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), tree
        )

    # Frozen teachers: converted released checkpoints when configured, else
    # shape-only zero stand-ins (no init-time compile).
    model = XDecoderSegModel(cfg.xdecoder)
    H, W = cfg.xdecoder.mask_shape
    dummy = jnp.zeros((1, H, W, 3))
    if conv is not None:
        tparams = conv["xdecoder"]
    else:
        tparams = zeros_from_shapes(
            jax.eval_shape(model.init, rng_key, dummy, text, logit_scale)
        )

    sc = cfg.sonata
    sonata = SonataTeacher(
        in_channels=sc.in_channels, enc_depths=tuple(sc.enc_depths),
        enc_channels=tuple(sc.enc_channels), enc_num_head=tuple(sc.enc_num_head),
        enc_patch_size=tuple(sc.enc_patch_size), upcast_levels=sc.upcast_levels,
        stem_kernel=sc.stem_kernel, pool_reduce=sc.pool_reduce,
        aux_norm_affine_only=(sc.norm == "bn_folded"),
    )
    if sc.ckpt:
        from geopurify_tpu.utils.checkpoint import load_torch_state_dict
        from geopurify_tpu.utils.convert_sonata import convert_sonata_checkpoint

        log.info("converting Sonata teacher checkpoint %s", sc.ckpt)
        sparams = convert_sonata_checkpoint(load_torch_state_dict(sc.ckpt), sc)
    else:
        if require_teachers:
            log.warning(
                "REAL-DATA RUN WITH UNINITIALIZED 3D TEACHER: sonata.ckpt is "
                "not set — Stage-1 distillation targets are random. Set "
                "sonata.ckpt=/path/to/sonata.pth (facebook/sonata release), "
                "or train from a teacher cache (run/precompute.py) built with "
                "a converted teacher."
            )
        # sonata param shapes are size-independent of the dummy scene
        n_d = 64
        dcoords = jnp.stack(
            [jnp.arange(n_d, dtype=jnp.int32)] * 3, axis=1
        ) % 8
        order = jnp.lexsort((dcoords[:, 2], dcoords[:, 1], dcoords[:, 0]))
        sparams = zeros_from_shapes(
            jax.eval_shape(
                sonata.init,
                rng_key,
                jnp.zeros((n_d, sc.in_channels)),
                dcoords[order],
                jnp.ones((n_d,), bool),
                jnp.arange(n_d, dtype=jnp.int32),
                jnp.ones((n_d,), bool),
            )
        )
    lift_backend_fn = None
    if cfg.xdecoder.lift_backend != "xdecoder":
        from geopurify_tpu.models.lift_backends import get_backend

        lift_backend_fn = get_backend(cfg.xdecoder.lift_backend)
    pipeline = GeoPurifyPipeline(
        cfg=cfg, teacher_params=tparams, text_embeddings=text,
        logit_scale=logit_scale, sonata_params=sparams,
        lift_backend_fn=lift_backend_fn,
    )
    if return_lang:
        # hand the already-built (and, with xdecoder.ckpt, already-converted)
        # language tower to text-conditioned callers — re-converting the
        # checkpoint just for conv['lang'] doubles startup time and host
        # memory (run/infer2d.py refseg/captioning/retrieval)
        return pipeline, sonata, (tk, lang, lang_vars)
    return pipeline, sonata


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="scannet")
    parser.add_argument("--config", default=None)
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize() from env")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--teacher-cache", default=None,
                        help="dir of precomputed teacher features (run/precompute.py)")
    parser.add_argument("--fused-features", default=None,
                        help="dir of precomputed fused 2D feature .pt files "
                             "(OpenScene layout) used as the frozen 2D input "
                             "instead of running the X-Decoder lift "
                             "(≙ reference dataset/feature_loader.py)")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--steps-per-epoch", type=int, default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s %(filename)s:%(lineno)d] %(message)s",
    )
    if args.distributed:
        # multi-host rendezvous (TPU pods auto-discover the coordinator from
        # the environment); per-host data sharding + psum'd grads follow
        jax.distributed.initialize()
        log.info("distributed: process %d/%d", jax.process_index(), jax.process_count())
    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = load_config(args.preset, overrides=args.overrides, yaml_path=args.config)
    if args.epochs:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, epochs=args.epochs))

    key = jax.random.key(cfg.train.manual_seed)
    mesh = make_mesh(dp=cfg.parallel.dp, tp=cfg.parallel.tp)
    n_dp = mesh.shape[cfg.parallel.data_axis]
    log.info("mesh: %s (dp=%d)", mesh, n_dp)

    pipeline, sonata = build_pipeline(
        cfg, key,
        require_teachers=not args.synthetic and not args.teacher_cache,
    )

    # data
    fused_ds = None
    if args.synthetic:
        from geopurify_tpu.data.synthetic import make_scene_batch

        scenes = [
            make_scene_batch(seed=i, n_points=1500, n_views=2)
            for i in range(max(2, n_dp))
        ]
    else:
        from geopurify_tpu.data.loaders import SceneDataset

        # teacher-cache / fused-features modes replay frozen features
        # precomputed offline; geometric augmentation must then stay off (the
        # cached features are tied to the unaugmented geometry)
        frozen_inputs = bool(args.teacher_cache or args.fused_features)
        ds = SceneDataset(
            cfg, split="train", augment=False if frozen_inputs else None
        )
        fused_ds = None
        if args.fused_features:
            from geopurify_tpu.data.feature_loader import FusedFeatureDataset

            fused_ds = FusedFeatureDataset(cfg, args.fused_features)
            fused_ds.base = ds
        scenes = None  # streamed below

    # student init
    s = cfg.student
    dummy_feats = jnp.zeros((8, s.input_dim))
    dummy_nbr = jnp.full((8, 27), 8, jnp.int32)
    student_vars = pipeline.student.init(
        key, dummy_feats, dummy_nbr, jnp.ones(8, bool), train=False
    )
    steps_per_epoch = args.steps_per_epoch or (
        len(scenes) if scenes is not None else len(ds)
    ) * cfg.data.loop // max(n_dp, 1)
    tx, schedule = make_optimizer(cfg.train, student_vars["params"], steps_per_epoch)
    state = TrainState(
        params=student_vars["params"],
        batch_stats=student_vars["batch_stats"],
        opt_state=tx.init(student_vars["params"]),
        step=jnp.zeros((), jnp.int32),
    )

    ckpt_dir = os.path.join(cfg.train.save_path, "ckpt")
    if cfg.train.resume:
        # RNG key rides the checkpoint (≙ the reference trainer's per-rank RNG
        # state save, trainer/utils_trainer.py:76-194)
        restored, step = restore_checkpoint(
            cfg.train.resume, {**state._asdict(), "rng": jax.random.key_data(key)}
        )
        if restored is not None:
            key = jax.random.wrap_key_data(restored.pop("rng"))
            state = TrainState(**restored)
            log.info("resumed from step %d", step)

    train_step = make_train_step(pipeline, tx, mesh, cfg.parallel.data_axis)
    metrics_path = os.path.join(cfg.train.save_path, "metrics.jsonl")
    os.makedirs(cfg.train.save_path, exist_ok=True)

    from geopurify_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    t0 = time.time()
    step_count = int(state.step)
    for epoch in range(cfg.train.epochs):
        for it in range(steps_per_epoch):
            # assemble one scene per data-parallel device
            batch_scenes = []
            f2ds, fts = [], []
            for d in range(n_dp):
                f2d = ft = None
                if scenes is not None:
                    sc_batch = scenes[(it * n_dp + d) % len(scenes)]
                    sid = None
                elif args.teacher_cache or fused_ds is not None:
                    sid = ds._next_sid()
                    if fused_ds is not None:
                        pair = fused_ds.make_scene_batch_with_features(sid)
                        if pair is None:
                            continue
                        sc_batch, f2d_np = pair
                        f2d = jnp.asarray(f2d_np)
                    else:
                        sc_batch = ds.make_scene_batch(sid)
                        if sc_batch is None:
                            continue
                else:
                    sc_batch = ds.next_scene()
                    sid = None
                if args.teacher_cache and sid is not None:
                    npz_path = os.path.join(args.teacher_cache, f"{sid}.npz")
                    if os.path.exists(npz_path):
                        data = np.load(npz_path)
                        if f2d is None:
                            f2d = jnp.asarray(data["f2d"])
                        ft = jnp.asarray(data["f_teacher"])
                if f2d is None:
                    with timer.stage("lift_2d"):
                        f2d = pipeline.lift_scene(sc_batch).features
                if ft is None:
                    with timer.stage("teacher_3d"):
                        ft = pipeline.teacher_point_features(sc_batch)
                batch_scenes.append(sc_batch)
                f2ds.append(f2d)
                fts.append(ft)
            if len(batch_scenes) < n_dp:
                continue  # an unusable scene left the device batch short
            stacked = stack_scenes(batch_scenes)
            key, sub = jax.random.split(key)
            with timer.stage("train_step", block_on=None):
                state, loss = train_step(
                    state, stacked, jnp.stack(f2ds), jnp.stack(fts), sub
                )
            step_count += 1
            if step_count % cfg.train.print_freq == 0:
                # MultiSteps advances the inner schedule once per k raw steps
                lr = float(schedule(step_count // max(cfg.train.grad_accum_steps, 1)))
                rec = {
                    "step": step_count, "epoch": epoch, "loss": float(loss),
                    "lr": lr, "elapsed_s": time.time() - t0,
                    "scenes_per_sec": step_count * n_dp / max(time.time() - t0, 1e-9),
                    "stages": timer.summary(),
                }
                log.info("%s", rec)
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
        if (epoch + 1) % cfg.train.save_freq == 0:
            save_checkpoint(ckpt_dir, {**state._asdict(), "rng": jax.random.key_data(key)}, step_count)
            log.info("checkpointed at step %d", step_count)
    save_checkpoint(ckpt_dir, {**state._asdict(), "rng": jax.random.key_data(key)}, step_count)
    log.info("done: %d steps in %.1fs", step_count, time.time() - t0)


if __name__ == "__main__":
    main()
