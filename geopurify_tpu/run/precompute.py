"""Offline teacher-feature precompute.

The reference re-runs both frozen teachers (X-Decoder lift + Sonata) inside
every training step, every epoch (reference models/affinity_module.py:
1139-1167 under torch.no_grad) — for a 20-scene subset looped 16x/epoch that
is >99% redundant compute. Here teacher outputs are precomputed once per
scene and cached as ``.npz`` (SURVEY §7.8 "prefer precompute first, it's
frozen"); run/train consumes the cache when present.

Usage:
  python -m geopurify_tpu.run.precompute --preset scannet \
      data.data_root=... data.data_root_2d=... --out runs/teacher_cache
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np

log = logging.getLogger("geopurify.precompute")


def precompute_scene(pipeline, batch, sonata_live: bool = True):
    import jax

    f2d = pipeline.lift_scene(batch).features
    out = {"f2d": np.asarray(f2d, np.float32)}
    if sonata_live and pipeline.sonata_params is not None:
        ft = pipeline.teacher_point_features(batch)
        out["f_teacher"] = np.asarray(ft, np.float32)
    out["point_valid"] = np.asarray(batch.point_valid)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="scannet")
    parser.add_argument("--config", default=None)
    parser.add_argument("--out", default="runs/teacher_cache")
    parser.add_argument("--split", default="train")
    parser.add_argument("--max-scenes", type=int, default=None)
    parser.add_argument("--no-sonata", action="store_true")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s %(filename)s:%(lineno)d] %(message)s")

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    from geopurify_tpu.config import load_config
    from geopurify_tpu.data.loaders import SceneDataset
    from geopurify_tpu.run.train import build_pipeline

    cfg = load_config(args.preset, overrides=args.overrides, yaml_path=args.config)
    key = jax.random.key(cfg.train.manual_seed)
    pipeline, _ = build_pipeline(cfg, key, require_teachers=True)

    # augmentation must be OFF for cached features (they are geometry-tied)
    ds = SceneDataset(cfg, split=args.split, augment=False)
    os.makedirs(args.out, exist_ok=True)
    ids = ds.scene_ids[: args.max_scenes] if args.max_scenes else ds.scene_ids
    for i, sid in enumerate(ids):
        dst = os.path.join(args.out, f"{sid}.npz")
        if os.path.exists(dst):
            log.info("[%d/%d] %s cached, skipping", i + 1, len(ids), sid)
            continue
        batch = ds.make_scene_batch(sid)
        if batch is None:
            log.warning("[%d/%d] %s unusable, skipping", i + 1, len(ids), sid)
            continue
        t0 = time.time()
        out = precompute_scene(pipeline, batch, sonata_live=not args.no_sonata)
        np.savez_compressed(dst, **out)
        log.info("[%d/%d] %s -> %s (%.1fs)", i + 1, len(ids), sid, dst, time.time() - t0)


if __name__ == "__main__":
    main()
