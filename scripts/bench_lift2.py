#!/usr/bin/env python
"""Cumulative-prefix profile of lift_view_features: each prefix is ONE jit
call (identical layouts to the fused graph), so consecutive differences give
true marginal stage costs — the piecewise bench_view.py numbers each carry
~28 ms of tunnel dispatch and hide where the fused 114 ms/view really goes.

Usage: python scripts/bench_lift2.py [--pv 65536] [--covered 0.1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def t_sync(fn, *a, trials=5):
    import jax.numpy as jnp

    out = fn(*a)
    leaf = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(leaf))
    ts = []
    for _ in range(trials):
        t0 = time.time()
        out = fn(*a)
        leaf = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(leaf))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pv", type=int, default=65536)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--covered", type=float, default=0.1,
                    help="fraction of points the mask assembly covers")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from geopurify_tpu.config import load_config
    from geopurify_tpu.models.layers import resize_bicubic_antialias
    from geopurify_tpu.ops.knn import nearest_fill

    cfg = load_config("scannet")
    H, W = tuple(cfg.xdecoder.mask_shape)
    n_cls = len(cfg.data.all_label)
    Pv = args.pv
    Q, C = 101, 512
    h, w = (H + 31) // 32 * 8, (W + 31) // 32 * 8  # stride-4 on the /32-padded grid

    rng = np.random.default_rng(0)
    pm = jnp.asarray(rng.standard_normal((Q, h, w), np.float32))
    me = jnp.asarray(rng.standard_normal((Q, C), np.float32))
    pl = jnp.asarray(rng.standard_normal((Q, n_cls + 1), np.float32))
    rows = jnp.asarray(rng.integers(0, H, Pv, np.int32))
    cols = jnp.asarray(rng.integers(0, W, Pv, np.int32))
    pv_valid = jnp.ones((Pv,), bool)
    vc = jnp.asarray(rng.uniform(0, 5, (Pv, 3)).astype(np.float32))
    text = jnp.asarray(rng.standard_normal((n_cls, C), np.float32))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    ls = jnp.float32(20.0)
    # bias the mask logits so that ~args.covered of points pass the 0.5 gate
    pm = pm + jnp.float32(np.quantile(rng.standard_normal(100000), 1 - args.covered))

    def prefix(stage):
        @jax.jit
        def fn(pred_masks, mask_embed, pred_logits):
            masks = resize_bicubic_antialias(
                pred_masks.transpose(1, 2, 0)[None], (H, W)
            )[0].transpose(2, 0, 1)
            if stage == "resize":
                return masks
            probs = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
            scores = jnp.max(probs[..., :-1], axis=-1)
            sig = jax.nn.sigmoid(masks)
            prob_masks = scores[:, None, None] * sig
            mask_ids = jnp.argmax(prob_masks, axis=0)
            if stage == "argmax":
                return mask_ids.astype(jnp.float32)
            r = jnp.clip(rows, 0, H - 1)
            c = jnp.clip(cols, 0, W - 1)
            winner = mask_ids[r, c]
            covered = (sig[winner, r, c] >= 0.5) & pv_valid
            feats = jnp.where(
                covered[:, None], mask_embed.astype(jnp.float32)[winner], 0.0
            )
            if stage == "gather":
                return feats
            feats = nearest_fill(feats, vc, covered, pv_valid)
            feats = jnp.where(pv_valid[:, None], feats, 0.0)
            if stage == "fill":
                return feats
            norm = jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
            feats = feats / norm
            logits = ls * feats @ text.T
            return feats, logits

        return fn

    prev = 0.0
    for stage in ("resize", "argmax", "gather", "fill", "full"):
        t = t_sync(prefix(stage), pm, me, pl, trials=args.trials) * 1000
        print(f"prefix {stage:8s}: {t:7.1f} ms  (marginal {t - prev:+7.1f})")
        prev = t


if __name__ == "__main__":
    main()
