"""Stage-2 validation entry — open-vocabulary segmentation eval.

TPU-native re-design of the reference's eval harness
(reference run/validation.py:96-557): per-scene evaluate_scene, histogram
metrics with multi-ignore-index, running Base/Novel/All mIoU/mAcc/allAcc, and
scene-list sharding. The reference's split_idx/split_total shell loop
(run/val.sh:33-47) becomes --shard-idx/--shard-total; under multi-host runs
each host additionally takes its process_index slice and histograms are summed
at the end (≙ dist.all_reduce, run/validation.py:441-450).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from geopurify_tpu.config import GeoPurifyConfig, load_config
from geopurify_tpu.utils.metrics import (
    SegMeter,
    allreduce_meter_across_hosts,
    intersection_and_union,
)

log = logging.getLogger("geopurify.validate")


def shard_scene_list(scene_ids: List[str], shard_idx: int, shard_total: int) -> List[str]:
    """Contiguous slice sharding (run/validation.py:269-286)."""
    n = len(scene_ids)
    per = -(-n // shard_total)
    return scene_ids[shard_idx * per : (shard_idx + 1) * per]


def evaluate_scenes(pipeline, student_vars, scene_iter, cfg: GeoPurifyConfig,
                    log_every: int = 1, save_preds: Optional[str] = None):
    meter = SegMeter(
        num_classes=cfg.data.test_classes,
        base_category=cfg.data.base_category,
        novel_category=cfg.data.novel_category,
        foreground_category=cfg.data.foreground_category(),
    )
    times = []
    for i, batch in enumerate(scene_iter):
        t0 = time.time()
        out = pipeline.evaluate_scene(student_vars, batch)
        inter, union, target = intersection_and_union(
            out["pred"], batch.labels, batch.point_valid,
            cfg.data.test_classes, tuple(cfg.data.test_ignore_label),
        )
        jax.block_until_ready(inter)
        times.append(time.time() - t0)
        meter.update(inter, union, target)
        overflow = int(out.get("band_overflow", 0))
        if overflow:
            log.warning(
                "scene %d: banded pooling residual overflowed by %d edges — "
                "exact gather fallback ran (consider raising pooling.band)",
                i, overflow,
            )
        if save_preds:
            from geopurify_tpu.utils.visualization import save_semantic_ply

            valid = np.asarray(batch.point_valid)
            pts = np.asarray(batch.points)
            save_semantic_ply(
                os.path.join(save_preds, f"scene{i:04d}_pred.ply"),
                pts, np.asarray(out["pred"]),
                num_classes=cfg.data.test_classes, valid=valid,
            )
            gt = np.asarray(batch.labels)
            ignore = (gt >= cfg.data.test_classes) | np.isin(
                gt, np.asarray(cfg.data.test_ignore_label, dtype=gt.dtype)
            )
            save_semantic_ply(
                os.path.join(save_preds, f"scene{i:04d}_gt.ply"),
                pts, np.where(ignore, -1, gt),   # ignore regions render black
                num_classes=cfg.data.test_classes, valid=valid,
            )
        if (i + 1) % log_every == 0:
            full = meter.summary()
            s = full["all"]
            fg = full.get("foreground")
            log.info(
                "scene %d: mIoU=%.4f mAcc=%.4f allAcc=%.4f%s (%.2fs/scene)",
                i + 1, s["mIoU"], s["mAcc"], s["allAcc"],
                f" f-mIoU={fg['mIoU']:.4f} f-mAcc={fg['mAcc']:.4f}" if fg else "",
                np.mean(times),
            )
    return meter, times


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="scannet")
    parser.add_argument("--config", default=None)
    parser.add_argument("--student-ckpt", default=None)
    parser.add_argument("--shard-idx", type=int, default=0)
    parser.add_argument("--shard-total", type=int, default=1)
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize() from env")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--max-scenes", type=int, default=None)
    parser.add_argument("--save-preds", default=None,
                        help="dir for per-scene pred/gt PLY dumps")
    parser.add_argument("--lift-backend", default=None,
                        choices=["xdecoder", "lseg", "ape"],
                        help="2D lift backend (≙ feature_2d_extractor; "
                             "lseg/ape need a registered JAX port, see "
                             "models/lift_backends.py)")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s %(filename)s:%(lineno)d] %(message)s")
    if args.distributed:
        jax.distributed.initialize()
        log.info("distributed: process %d/%d", jax.process_index(), jax.process_count())
    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = load_config(args.preset, overrides=args.overrides, yaml_path=args.config)
    if args.lift_backend:
        cfg = dataclasses.replace(
            cfg, xdecoder=dataclasses.replace(cfg.xdecoder,
                                              lift_backend=args.lift_backend)
        )
    key = jax.random.key(cfg.train.manual_seed)

    from geopurify_tpu.run.train import build_pipeline

    pipeline, _ = build_pipeline(cfg, key, require_teachers=not args.synthetic)

    s = cfg.student
    student_vars = pipeline.student.init(
        key, jnp.zeros((8, s.input_dim)), jnp.full((8, 27), 8, jnp.int32),
        jnp.ones(8, bool), train=False,
    )
    if args.student_ckpt:
        from geopurify_tpu.utils.checkpoint import (
            convert_student_checkpoint,
            load_torch_state_dict,
            restore_checkpoint,
        )

        if args.student_ckpt.endswith((".pth", ".pt")):
            student_vars = convert_student_checkpoint(
                load_torch_state_dict(args.student_ckpt)
            )
        else:
            restored, _ = restore_checkpoint(
                args.student_ckpt,
                {"params": student_vars["params"],
                 "batch_stats": student_vars["batch_stats"],
                 "opt_state": None, "step": 0},
            )
            if restored:
                student_vars = {
                    "params": restored["params"],
                    "batch_stats": restored["batch_stats"],
                }

    if args.synthetic:
        from geopurify_tpu.data.synthetic import make_scene_batch

        n = args.max_scenes or 2
        scene_iter = (make_scene_batch(seed=i, n_points=1500, n_views=2) for i in range(n))
    else:
        from geopurify_tpu.data.loaders import SceneDataset

        ds = SceneDataset(cfg, split="val")
        ids = shard_scene_list(ds.scene_ids, args.shard_idx, args.shard_total)
        # further shard over hosts
        ids = ids[jax.process_index() :: jax.process_count()]
        if args.max_scenes:
            ids = ids[: args.max_scenes]
        scene_iter = (
            b for b in (ds.make_scene_batch(sid) for sid in ids) if b is not None
        )

    if args.save_preds:
        os.makedirs(args.save_preds, exist_ok=True)
    meter, times = evaluate_scenes(
        pipeline, student_vars, scene_iter, cfg, save_preds=args.save_preds
    )
    # one combined summary across hosts (≙ dist.all_reduce of I/U/T,
    # run/validation.py:441-450); no-op for single-process runs
    meter = allreduce_meter_across_hosts(meter)
    summary = meter.summary()
    result = {
        "summary": summary,
        "scenes_per_sec": 1.0 / float(np.mean(times)) if times else 0.0,
        "per_class_iou": meter.per_class_iou().tolist(),
    }
    print(json.dumps(result))
    # append-mode result log (≙ the reference's eval_result.log appender,
    # models/utils/metric.py:88-104) — anchored under cfg.train.save_path so
    # shards launched from different cwds land in one run directory
    os.makedirs(cfg.train.save_path, exist_ok=True)
    with open(os.path.join(cfg.train.save_path, "eval_results.jsonl"), "a") as f:
        f.write(json.dumps({"preset": args.preset, "shard": [args.shard_idx,
                args.shard_total], **result}) + "\n")
    return result


if __name__ == "__main__":
    main()
