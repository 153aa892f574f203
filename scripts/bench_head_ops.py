#!/usr/bin/env python
"""Pixel-decoder + query-head per-op decomposition at the view-batch shape
(round-6 queue #1): after fast_gelu the B=64 forward splits backbone 539 /
pixdec 166 / head 190 ms — the latter two have never been decomposed.
Times, with the chain-difference method (see bench_focal_ops.py):

  head rounds      full head at dec_layers 1 vs 9 -> ms/round
  mask_einsum      m_emb @ mask_features  [B,201,512] x [B,121,162,512]
  attn_resize      bicubic+antialias mask resize to the 3 scales
                   (the reference's xdecoder.py:457 per-round attn mask)
  attn_layers      cross+self attention + FFN at [B,206,512] over the
                   336-token stride-32 memory
  enc_layer        one pixel-decoder transformer-encoder layer
  fpn_conv         one 3x3 conv at the stride-4 FPN scale (C=512)

Usage: python scripts/bench_head_ops.py [--batch 64]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def t_sync(fn, *a, trials=7):
    import jax
    import jax.numpy as jnp

    def sync(out):
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))

    sync(fn(*a))
    ts = []
    for _ in range(trials):
        t0 = time.time()
        sync(fn(*a))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--r1", type=int, default=3)
    ap.add_argument("--r2", type=int, default=9)
    ap.add_argument("--trials", type=int, default=7)
    ap.add_argument("--ops-only", action="store_true",
                    help="skip the full pixdec/head timings")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from geopurify_tpu.config import load_config
    from geopurify_tpu.models.layers import resize_bicubic_antialias
    from geopurify_tpu.models.xdecoder import (
        _make_backbone, _make_head, _make_pixel_decoder, _model_dtype,
        _normalize_and_pad,
    )

    B = args.batch
    cfg = load_config("scannet")
    c = cfg.xdecoder
    key = jax.random.key(0)
    dtype = _model_dtype(c)
    n_cls = 19
    text = jax.random.normal(key, (n_cls + 1, c.hidden_dim), jnp.float32)

    def measure(fn, *a):
        def chain(r):
            def body(x, *rest):
                for _ in range(r):
                    x = fn(x, *rest)
                return x
            return jax.jit(body)
        t1 = t_sync(chain(args.r1), *a, trials=args.trials)
        t2 = t_sync(chain(args.r2), *a, trials=args.trials)
        return max((t2 - t1) / (args.r2 - args.r1), 1e-9)

    # ---- real backbone features -> pixdec inputs ----
    bb = _make_backbone(c, name="backbone")
    img = jax.random.uniform(key, (B, 484, 648, 3)) * 255.0
    bvars = jax.eval_shape(bb.init, key, img[:1])
    leaves, treedef = jax.tree_util.tree_flatten(bvars)
    ks = jax.random.split(jax.random.key(1), len(leaves))
    bparams = jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, s.shape, s.dtype) * 0.02
                  for k, s in zip(ks, leaves)])
    x = _normalize_and_pad(c, img).astype(dtype)
    feats = jax.jit(lambda p, x: bb.apply(p, x))(bparams, x)
    print({k: v.shape for k, v in feats.items()}, flush=True)

    # ---- pixel decoder: full + one encoder layer + one FPN conv ----
    pd = _make_pixel_decoder(c, name="pixel_decoder")
    pvars = jax.eval_shape(pd.init, key, feats)
    leaves, treedef = jax.tree_util.tree_flatten(pvars)
    ks = jax.random.split(jax.random.key(2), len(leaves))
    pparams = jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, s.shape, s.dtype) * 0.02
                  for k, s in zip(ks, leaves)])
    if not args.ops_only:
        t_pd = t_sync(jax.jit(lambda p, f: pd.apply(p, f)), pparams, feats,
                      trials=args.trials)
        print(f"pixel decoder (full): {t_pd * 1e3:.1f} ms", flush=True)

    mask_features, _, multi_scale = jax.jit(
        lambda p, f: pd.apply(p, f))(pparams, feats)
    Hm, Wm = mask_features.shape[1:3]

    # standalone FPN 3x3 conv at stride-4 (C=512)
    wc = jax.random.normal(key, (3, 3, c.conv_dim, c.conv_dim), dtype) * 0.02
    y4 = jax.random.normal(key, (B, Hm, Wm, c.conv_dim), dtype)

    def fpn_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    if args.ops_only:
        t = 1.0
    else:
        t = measure(fpn_conv, y4, wc)
    fl = 2 * B * Hm * Wm * c.conv_dim * c.conv_dim * 9
    print(f"fpn 3x3 conv s4:      {t * 1e3:.2f} ms  {fl / t / 1e12:.1f} TF/s",
          flush=True)

    # encoder self-attn+FFN at the stride-32 token count
    Ht, Wt = feats["res5"].shape[1:3]
    Ntok = Ht * Wt
    tok = jax.random.normal(key, (B, Ntok, c.conv_dim), dtype)
    wq = jax.random.normal(key, (c.conv_dim, 3 * c.conv_dim), dtype) * 0.02
    wo = jax.random.normal(key, (c.conv_dim, c.conv_dim), dtype) * 0.02
    w1 = jax.random.normal(key, (c.conv_dim, c.dim_feedforward), dtype) * 0.02
    w2 = jax.random.normal(key, (c.dim_feedforward, c.conv_dim), dtype) * 0.02

    def enc_layer(tok, wq, wo, w1, w2):
        qkv = tok @ wq
        q, k, v = jnp.split(qkv, 3, -1)
        h = c.nheads
        d = c.conv_dim // h

        def heads(t):
            return t.reshape(B, Ntok, h, d).transpose(0, 2, 1, 3)

        a = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", heads(q), heads(k),
                       preferred_element_type=jnp.float32)
            / np.sqrt(d), axis=-1).astype(dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, heads(v))
        o = o.transpose(0, 2, 1, 3).reshape(B, Ntok, c.conv_dim) @ wo
        tok = tok + o
        return tok + jax.nn.relu(tok @ w1) @ w2

    t = measure(enc_layer, tok, wq, wo, w1, w2)
    print(f"enc layer (x{c.enc_layers}):     {t * 1e3:.2f} ms", flush=True)

    # ---- head: per-round cost via dec_layers 1 vs 9 ----
    import dataclasses

    times = {}
    for L in (() if args.ops_only else (1, c.dec_layers)):
        ch = dataclasses.replace(c, dec_layers=L)
        hd = _make_head(ch, name="predictor")
        hvars = jax.eval_shape(hd.init, key, list(multi_scale), mask_features,
                               text, jnp.float32(20.0))
        leaves, treedef = jax.tree_util.tree_flatten(hvars)
        ks = jax.random.split(jax.random.key(3), len(leaves))
        hp = jax.tree_util.tree_unflatten(
            treedef, [jax.random.normal(k, s.shape, s.dtype) * 0.02
                      for k, s in zip(ks, leaves)])
        times[L] = t_sync(
            jax.jit(lambda p, ms, mf: hd.apply(p, list(ms), mf, text,
                                               jnp.float32(20.0))),
            hp, tuple(multi_scale), mask_features, trials=args.trials)
        print(f"head dec_layers={L}: {times[L] * 1e3:.1f} ms", flush=True)
    if times:
        per_round = (times[c.dec_layers] - times[1]) / (c.dec_layers - 1)
        print(f"-> per round: {per_round * 1e3:.2f} ms "
              f"(+ base {times[1] * 1e3:.1f})", flush=True)

    # ---- standalone per-round ops ----
    Q = c.num_queries
    m_emb = jax.random.normal(key, (B, Q, c.mask_dim), jnp.float32)
    mf = jax.random.normal(key, (B, Hm, Wm, c.mask_dim), jnp.float32)

    def mask_einsum(m_emb, mf):
        # chain-safe: fold the [B,Q,H,W] product back to the input shape
        out = jnp.einsum("bqc,bhwc->bqhw", m_emb, mf)
        return m_emb + 1e-6 * out.reshape(B, Q, -1)[:, :, : c.mask_dim]

    t = measure(mask_einsum, m_emb, mf)
    fl = 2 * B * Q * Hm * Wm * c.mask_dim
    print(f"mask einsum:          {t * 1e3:.2f} ms  {fl / t / 1e12:.1f} TF/s",
          flush=True)

    masks = jax.random.normal(key, (B, Q, Hm, Wm), jnp.float32)
    for (th, tw) in ((Ht, Wt), (Ht * 2, Wt * 2), (Ht * 4, Wt * 4)):
        def rs(m, th=th, tw=tw):
            out = resize_bicubic_antialias(
                m.transpose(0, 2, 3, 1), (th, tw))
            return m + 1e-6 * out.mean()          # chain-safe coupling

        t = measure(rs, masks)
        print(f"attn resize ->{th}x{tw}: {t * 1e3:.2f} ms", flush=True)

    # cross+self attention + FFN at [B, Q+5, C] over 336-token memory
    Tq = Q + 5
    qt = jax.random.normal(key, (B, Tq, c.hidden_dim), dtype)
    mem = jax.random.normal(key, (B, Ntok, c.hidden_dim), dtype)

    def attn_block(qt, mem, wq, wo, w1, w2):
        h, d = c.nheads, c.hidden_dim // c.nheads

        def heads(t, n):
            return t.reshape(B, n, h, d).transpose(0, 2, 1, 3)

        q = heads(qt @ wq[:, : c.hidden_dim], Tq)
        k = heads(mem @ wq[:, c.hidden_dim: 2 * c.hidden_dim], Ntok)
        v = heads(mem @ wq[:, 2 * c.hidden_dim:], Ntok)
        a = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(d),
            axis=-1).astype(dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        qt = qt + o.transpose(0, 2, 1, 3).reshape(B, Tq, c.hidden_dim) @ wo
        q2 = heads(qt @ wq[:, : c.hidden_dim], Tq)
        k2 = heads(qt @ wq[:, c.hidden_dim: 2 * c.hidden_dim], Tq)
        v2 = heads(qt @ wq[:, 2 * c.hidden_dim:], Tq)
        a2 = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q2, k2,
                       preferred_element_type=jnp.float32) / np.sqrt(d),
            axis=-1).astype(dtype)
        o2 = jnp.einsum("bhqk,bhkd->bhqd", a2, v2)
        qt = qt + o2.transpose(0, 2, 1, 3).reshape(B, Tq, c.hidden_dim) @ wo
        return qt + jax.nn.relu(qt @ w1) @ w2

    t = measure(attn_block, qt, mem, wq, wo, w1, w2)
    print(f"cross+self+ffn round: {t * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
