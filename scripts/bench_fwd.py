#!/usr/bin/env python
"""Stage decomposition of the X-Decoder forward at bench shapes: backbone
(FocalNet-L) vs pixel decoder (FPN + 6-layer encoder) vs query decoder head
(9 rounds). The forward is ~20 ms/view at B=8 — the dominant per-view cost in
the view-heavy regimes (V=64: ~1.3 s of a ~4.5 s scene).

Usage: python scripts/bench_fwd.py [--batch 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def t_sync(fn, *a, trials=5):
    import jax
    import jax.numpy as jnp

    def sync(out):
        # one leaf is enough: the whole executable completes before any
        # output materializes (one D2H per trial, CLAUDE.md timing rule)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))

    sync(fn(*a))
    ts = []
    for _ in range(trials):
        t0 = time.time()
        sync(fn(*a))
        ts.append(time.time() - t0)
    return min(ts) * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from geopurify_tpu.config import load_config
    from geopurify_tpu.models.xdecoder import (
        XDecoderSegModel, _make_backbone, _make_head, _make_pixel_decoder,
        _model_dtype, _normalize_and_pad,
    )

    cfg = load_config("scannet")
    c = cfg.xdecoder
    H, W = tuple(c.mask_shape)
    B = args.batch
    n_cls = 19
    key = jax.random.key(0)

    model = XDecoderSegModel(c)
    text = jax.random.normal(key, (n_cls + 1, c.hidden_dim), jnp.float32)
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    imgs = jax.random.uniform(key, (B, H, W, 3), jnp.float32) * 255.0
    shapes = jax.eval_shape(model.init, key, imgs[:1], text, jnp.float32(20.0))
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(jax.random.key(1), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [jax.random.normal(k, s.shape, s.dtype) * 0.02
         if jnp.issubdtype(s.dtype, jnp.floating) else jnp.zeros(s.shape, s.dtype)
         for k, s in zip(keys, leaves)],
    )

    full = jax.jit(lambda p, im: model.apply(p, im, text, jnp.float32(20.0)))
    print(f"B={B} full forward: {t_sync(full, params, imgs, trials=args.trials):.1f} ms")

    dtype = _model_dtype(c)
    bb = _make_backbone(c, name="backbone")
    pd = _make_pixel_decoder(c, name="pixel_decoder")
    hd = _make_head(c, name="predictor")
    p = params["params"]

    @jax.jit
    def run_bb(p, im):
        x = _normalize_and_pad(c, im)
        return bb.apply({"params": p["backbone"]}, x.astype(dtype))

    feats = run_bb(p, imgs)
    print(f"backbone:     {t_sync(run_bb, p, imgs, trials=args.trials):.1f} ms")

    @jax.jit
    def run_pd(p, feats):
        return pd.apply({"params": p["pixel_decoder"]}, feats)

    mask_features, _, multi_scale = run_pd(p, feats)
    print(f"pixel decoder:{t_sync(run_pd, p, feats, trials=args.trials):.1f} ms")

    @jax.jit
    def run_hd(p, multi_scale, mask_features):
        return hd.apply(
            {"params": p["predictor"]}, multi_scale, mask_features,
            text, jnp.float32(20.0),
        )

    print(f"head (9 rds): {t_sync(run_hd, p, multi_scale, mask_features, trials=args.trials):.1f} ms")


if __name__ == "__main__":
    main()
