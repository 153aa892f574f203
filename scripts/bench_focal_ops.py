#!/usr/bin/env python
"""Per-op roofline decomposition of the FocalNet-L backbone (VERDICT r4
next #1): the views stage is ~60% of V=64 wall clock at 10.6% of bf16 peak
and the prior decomposition stopped at "76% is the backbone". This script
times each constituent op at every stage's exact shape and prints achieved
FLOP/s + bandwidth vs the v5e roofline, plus A/B variants of the depthwise
focal convs (the classic TPU underperformer).

Per-block ops at stage shape [B, H, W, C] (models/focalnet.py:75-183,
≙ reference focal.py:44-195):
  f        Dense C -> 2C+L+1 (modulation projection)
  focal_k  depthwise conv k in {3,5,7,9} (focal_factor 2, window 3, L=4)
  gates    4x (gelu + gated accumulate) + global mean + scale
  h_proj   1x1 conv C->C, q*modulator, proj Dense C->C
  mlp      Dense C->4C, gelu, Dense 4C->C
  norms    2x LayerNorm (f32)

Usage: python scripts/bench_focal_ops.py [--batch 8] [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PEAK_BF16 = 197e12          # v5e MXU peak (bf16)
PEAK_HBM = 819e9            # v5e HBM bandwidth


def t_sync(fn, *a, trials=7):
    import jax
    import jax.numpy as jnp

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))

    sync(fn(*a))
    ts = []
    for _ in range(trials):
        t0 = time.time()
        sync(fn(*a))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--trials", type=int, default=7)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--r1", type=int, default=10)
    ap.add_argument("--r2", type=int, default=50,
                    help="two chain lengths; t_op = (T(r2)-T(r1))/(r2-r1) "
                         "cancels the ~25 ms per-executable tunnel overhead "
                         "(the naive T/R carried a ~1.3 ms/op bias)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    bytes_el = 2 if dt == jnp.bfloat16 else 4
    B = args.batch
    R1, R2 = args.r1, args.r2
    key = jax.random.key(0)

    # FocalNet-L stage shapes at the bench 484x648 input (stride 4 stem)
    stages = [
        (121, 162, 192, 2),
        (61, 81, 384, 2),
        (31, 41, 768, 18),
        (16, 21, 1536, 2),
    ]
    L = 4                     # focal levels; kernels 3,5,7,9

    def measure(fn, x, *params):
        """Chain-difference timing: dependent applications at two chain
        lengths in separate executables; the difference cancels both the
        per-executable tunnel overhead AND any boundary effects."""
        def chain(r):
            def body(x):
                for _ in range(r):
                    x = fn(x, *params)
                return x
            return jax.jit(body)
        t1 = t_sync(chain(R1), x, trials=args.trials)
        t2 = t_sync(chain(R2), x, trials=args.trials)
        return max((t2 - t1) / (R2 - R1), 1e-9)

    def gelu(x):
        return jax.nn.gelu(x, approximate=False)

    rows = []

    def add_row(tag, secs, flops, bytes_moved):
        rows.append((tag, secs * 1e3, flops / secs / 1e12,
                     100 * flops / secs / PEAK_BF16,
                     bytes_moved / secs / 1e9,
                     100 * bytes_moved / secs / PEAK_HBM))

    for si, (H, W, C, depth) in enumerate(stages):
        n = B * H * W
        x = jax.random.normal(key, (B, H, W, C), dt)
        print(f"\n== stage {si}: [{B},{H},{W},{C}] x{depth} blocks ==",
              flush=True)

        # --- f dense: C -> 2C+L+1 ---
        wf = jax.random.normal(key, (C, 2 * C + L + 1), dt) * 0.02

        def f_dense(x, w):
            y = x @ w
            return y[..., :C]          # keep shape for the repeat chain

        t = measure(f_dense, x, wf)
        add_row(f"s{si} f_dense", t, 2 * n * C * (2 * C + L + 1),
                n * C * bytes_el * 2 + n * (C + L + 1) * bytes_el)

        # --- depthwise focal convs, lax grouped-conv lowering ---
        for lvl in range(L):
            k = 2 * lvl + 3
            wk = jax.random.normal(key, (k, k, 1, C), dt) * 0.1

            def dw_conv(x, w, k=k):
                return jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=C,
                )

            t = measure(dw_conv, x, wk)
            add_row(f"s{si} dw{k} grouped", t, 2 * n * C * k * k,
                    2 * n * C * bytes_el)

        # --- depthwise k as shift-sum (k*k shifted elementwise FMAs) ---
        for lvl in (0, L - 1):
            k = 2 * lvl + 3
            wk = jax.random.normal(key, (k, k, C), dt) * 0.1

            def dw_shift(x, w, k=k):
                p = k // 2
                xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
                acc = jnp.zeros_like(x, jnp.float32)
                for di in range(k):
                    for dj in range(k):
                        acc = acc + (
                            xp[:, di:di + x.shape[1], dj:dj + x.shape[2], :]
                            * w[di, dj]).astype(jnp.float32)
                return acc.astype(x.dtype)

            t = measure(dw_shift, x, wk)
            add_row(f"s{si} dw{k} shiftsum", t, 2 * n * C * k * k,
                    2 * n * C * bytes_el)

        # --- gate/gelu elementwise chain (L gated adds + global) ---
        gates = jax.random.normal(key, (B, H, W, L + 1), dt)

        def gate_chain(ctx, gates):
            acc = jnp.zeros_like(ctx)
            for lvl in range(L):
                c = gelu(ctx)
                acc = acc + c * gates[..., lvl:lvl + 1]
            g = gelu(jnp.mean(ctx, axis=(1, 2), keepdims=True))
            acc = acc + g * gates[..., L:]
            return acc / (L + 1)

        t = measure(gate_chain, x, gates)
        add_row(f"s{si} gate_chain", t, n * C * (4 * L + 4),
                2 * n * C * bytes_el * 2)   # ctx read+acc rw (fused est.)

        # --- h 1x1 + q*mod + proj ---
        wh = jax.random.normal(key, (C, C), dt) * 0.02
        wp = jax.random.normal(key, (C, C), dt) * 0.02

        def h_proj(x, wh, wp):
            mod = x @ wh
            return (x * mod) @ wp

        t = measure(h_proj, x, wh, wp)
        add_row(f"s{si} h+proj", t, 2 * n * C * C * 2,
                3 * n * C * bytes_el)

        # --- mlp 4x ---
        w1 = jax.random.normal(key, (C, 4 * C), dt) * 0.02
        w2 = jax.random.normal(key, (4 * C, C), dt) * 0.02

        def mlp(x, w1, w2):
            return gelu(x @ w1) @ w2

        t = measure(mlp, x, w1, w2)
        add_row(f"s{si} mlp", t, 2 * n * C * 4 * C * 2,
                (2 * n * C + n * 4 * C) * bytes_el)

        # --- layernorm (f32) ---
        def ln(x):
            x32 = x.astype(jnp.float32)
            mu = x32.mean(-1, keepdims=True)
            v = ((x32 - mu) ** 2).mean(-1, keepdims=True)
            return ((x32 - mu) * jax.lax.rsqrt(v + 1e-5)).astype(x.dtype)

        # --- one REAL flax block at this shape (XLA's actual fusion) ---
        from geopurify_tpu.models.focalnet import FocalModulationBlock

        blk = FocalModulationBlock(C, focal_level=L, focal_window=3,
                                   dtype=dt)
        bvars = blk.init(jax.random.key(2), x)
        bp = jax.tree_util.tree_map(
            lambda a: (jax.random.normal(jax.random.key(3), a.shape,
                                         a.dtype) * 0.02
                       if jnp.issubdtype(a.dtype, jnp.floating) else a),
            bvars)

        def real_block(x, bp):
            return blk.apply(bp, x).astype(dt)

        t = measure(real_block, x, bp)
        blk_flops = (2 * n * C * (2 * C + L + 1)          # f
                     + 2 * n * C * (9 + 25 + 49 + 81)     # dw convs
                     + 2 * n * C * C * 2                  # h + proj
                     + 2 * n * C * 4 * C * 2)             # mlp
        add_row(f"s{si} REAL block", t, blk_flops, 6 * n * C * bytes_el)

        t = measure(ln, x)
        add_row(f"s{si} layernorm", t, 5 * n * C, 2 * n * C * bytes_el)

        for tag, ms, tf, pf, gb, pb in rows[-12:]:
            print(f"  {tag:22s} {ms:8.3f} ms  {tf:7.2f} TF/s ({pf:5.1f}%)"
                  f"  {gb:7.1f} GB/s ({pb:5.1f}%)")

    # --- whole-backbone reference number ---
    from geopurify_tpu.models.focalnet import FocalNet

    bb = FocalNet(embed_dim=192, depths=(2, 2, 18, 2),
                  focal_levels=(4, 4, 4, 4), focal_windows=(3, 3, 3, 3),
                  dtype=dt)
    img = jax.random.normal(key, (B, 484, 648, 3), dt)
    shapes = jax.eval_shape(bb.init, key, img[:1])
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    ks = jax.random.split(jax.random.key(1), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [jax.random.normal(kk, s.shape, s.dtype) * 0.02 for kk, s in
         zip(ks, leaves)])
    run = jax.jit(lambda p, x: bb.apply(p, x))
    tb = t_sync(run, params, img, trials=args.trials)
    print(f"\nfull backbone B={B}: {tb * 1e3:.1f} ms "
          f"({tb / B * 1e3:.2f} ms/img)")

    # estimated per-block sums vs measured
    est, real = {}, {}
    for tag, ms, *_ in rows:
        sk = tag.split()[0]
        op = tag.split(None, 1)[1]
        if "shiftsum" in op:
            continue
        if op == "REAL block":
            real[sk] = ms
            continue
        est[sk] = est.get(sk, 0.0) + ms + (ms if op == "layernorm" else 0)
    total = 0.0
    for si, (H, W, C, depth) in enumerate(stages):
        t_blk = real.get(f"s{si}", 0.0)
        print(f"  stage {si}: REAL {t_blk:.3f} (per-op sum "
              f"{est.get(f's{si}', 0.0):.3f}) ms/block x {depth} = "
              f"{t_blk * depth:.1f} ms")
        total += t_blk * depth
    print(f"  sum of REAL blocks: {total:.1f} ms (+patch embeds) vs "
          f"measured backbone {tb * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
