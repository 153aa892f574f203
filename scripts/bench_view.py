#!/usr/bin/env python
"""Decompose the per-view stage (X-Decoder forward + mask lift + per-view
fill) at a chosen Pv — at preset scale (Pv=65536) the view stage is
~150 ms/view vs ~36 ms at the driver spec (Pv=16384), and the forward is the
same size, so the lift glue must account for the difference.

Timing rule (CLAUDE.md): force float(jnp.sum(out)) per trial.

Usage: python scripts/bench_view.py [--pv 65536] [--views 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _leaf(out):
    if isinstance(out, dict):
        return out["pred_masks"]
    out = out[0] if isinstance(out, tuple) else out
    return out.features if hasattr(out, "features") else out


def t_sync(fn, *a, trials=3):
    import jax.numpy as jnp

    float(jnp.sum(_leaf(fn(*a))))
    ts = []
    for _ in range(trials):
        t0 = time.time()
        float(jnp.sum(_leaf(fn(*a))))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pv", type=int, default=65536)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import dataclasses

    import bench as bench_mod
    from geopurify_tpu.config import load_config
    from geopurify_tpu.models.lift import lift_view_features
    from geopurify_tpu.models.pipeline import GeoPurifyPipeline
    from geopurify_tpu.models.xdecoder import XDecoderSegModel
    from geopurify_tpu.ops.knn import nearest_fill_grid

    cfg = load_config("scannet")
    hw = tuple(cfg.xdecoder.mask_shape)
    n_cls = len(cfg.data.all_label)
    V, Pv = args.views, args.pv
    P, M = 16 * Pv, 4 * Pv
    batch = bench_mod.build_scene(0, P, M, V, Pv, hw)

    key = jax.random.key(0)
    model = XDecoderSegModel(cfg.xdecoder)
    text = jax.random.normal(key, (n_cls + 1, cfg.xdecoder.hidden_dim), jnp.float32)
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    dummy = jnp.zeros((1, hw[0], hw[1], 3), jnp.float32)
    shapes = jax.eval_shape(model.init, key, dummy, text, jnp.float32(20.0))
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(jax.random.key(1), len(leaves))
    tparams = jax.tree_util.tree_unflatten(
        treedef,
        [jax.random.normal(k, s.shape, s.dtype) * 0.02
         if jnp.issubdtype(s.dtype, jnp.floating) else jnp.zeros(s.shape, s.dtype)
         for k, s in zip(keys, leaves)],
    )
    pipe = GeoPurifyPipeline(cfg=cfg, teacher_params=tparams,
                             text_embeddings=text, logit_scale=jnp.float32(20.0))

    B = max(1, min(cfg.xdecoder.view_batch, V))
    print(f"view_batch={B} Pv={Pv} hw={hw}")

    # 1. full micro-batched view step (forward + B-unrolled lifts)
    t = t_sync(pipe._view_step, pipe.teacher_params, pipe.text_embeddings,
               pipe.logit_scale, batch, jnp.int32(0), trials=args.trials)
    print(f"_view_step (B={B} forwards + lifts): {t*1000:.1f} ms"
          f" -> {t*1000/B:.1f} ms/view")

    # 2. forward alone (B images)
    imgs = batch.images[:B].astype(jnp.float32)
    fwd = jax.jit(lambda p, im, tx, ls: model.apply(p, im, tx, ls))
    t = t_sync(fwd, pipe.teacher_params, imgs, text, jnp.float32(20.0),
               trials=args.trials)
    print(f"forward alone (B={B}): {t*1000:.1f} ms -> {t*1000/B:.1f} ms/view")

    # 3. single-view lift alone on random teacher-shaped outputs
    out = fwd(pipe.teacher_params, imgs, text, jnp.float32(20.0))
    pm, me, pl = out["pred_masks"][0], out["mask_embed"][0], out["pred_logits"][0]
    rows, cols = batch.view_rows[0], batch.view_cols[0]
    pv_valid = batch.view_point_valid[0]
    vc = batch.points[batch.view_point_ids[0] % P]
    lift = jax.jit(lambda *a: lift_view_features(
        *a, tuple(cfg.xdecoder.mask_shape),
        mask_threshold=cfg.xdecoder.mask_threshold))
    t = t_sync(lift, pm, me, pl, rows, cols, pv_valid, vc, text[:-1],
               jnp.float32(20.0), trials=args.trials)
    print(f"lift_view_features (1 view): {t*1000:.1f} ms")

    # 3b. lift pieces: mask resize+assembly vs point gathers vs norm+logits
    from geopurify_tpu.models.layers import resize_bicubic_antialias

    H, W = hw

    def assembly(pm, pl):
        masks = resize_bicubic_antialias(
            pm.transpose(1, 2, 0)[None], (H, W))[0].transpose(2, 0, 1)
        probs = jax.nn.softmax(pl.astype(jnp.float32), axis=-1)
        scores = jnp.max(probs[..., :-1], axis=-1)
        sig = jax.nn.sigmoid(masks)
        prob_masks = scores[:, None, None] * sig
        return jnp.argmax(prob_masks, axis=0), sig

    jassembly = jax.jit(assembly)
    t = t_sync(jassembly, pm, pl, trials=args.trials)
    print(f"mask resize+argmax assembly: {t*1000:.1f} ms")

    mask_ids, sig = jassembly(pm, pl)

    def pointize(mask_ids, sig, me):
        r = jnp.clip(rows, 0, H - 1)
        c = jnp.clip(cols, 0, W - 1)
        winner = mask_ids[r, c]
        covered = (sig[winner, r, c] >= 0.5) & pv_valid
        feats = jnp.where(covered[:, None], me.astype(jnp.float32)[winner], 0.0)
        return feats, covered

    jpointize = jax.jit(pointize)
    t = t_sync(jpointize, mask_ids, sig, me, trials=args.trials)
    print(f"point gathers (winner/covered/feats): {t*1000:.1f} ms")

    feats0, covered0 = jpointize(mask_ids, sig, me)

    def normlog(feats):
        norm = jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        f = feats / norm
        return f, jnp.float32(20.0) * f @ text[:-1].astype(jnp.float32).T

    t = t_sync(jax.jit(normlog), feats0, trials=args.trials)
    print(f"normalize + logits: {t*1000:.1f} ms")

    # 4. the fill alone at this Pv (covered fraction from the real lift)
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((Pv, 512), np.float32))
    for frac in (0.3, 0.6):
        covered = jnp.asarray(np.random.default_rng(1).uniform(size=Pv) > frac)
        fill = jax.jit(lambda f, c, h, v: nearest_fill_grid(
            f, c, h, v, num_candidates=4096 if Pv > 16384 else 2048))
        t = t_sync(fill, feats, vc.astype(jnp.float32), covered, pv_valid,
                   trials=args.trials)
        print(f"nearest_fill_grid Pv={Pv} unseen={frac}: {t*1000:.1f} ms")


if __name__ == "__main__":
    main()
