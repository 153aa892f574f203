#!/usr/bin/env python
"""GELU / LayerNorm variant probe at FocalNet stage shapes (VERDICT r5
views attack): the B=64 per-op table shows the MLP at 43 TF/s vs the bare
matmul's 132 and LayerNorm at 21% of HBM — if the erf GELU or the f32 LN
two-pass is the gap, a numerically-equivalent-at-bf16 variant is a real
views win. Measures, at [64*121*162, C] for C in {192, 768}:

  gelu_erf     jax.nn.gelu(approximate=False)      (torch-parity exact)
  gelu_tanh    jax.nn.gelu(approximate=True)
  gelu_poly    erf via the A&S 7.1.26 rational poly (|err|<1.5e-7 — below
               bf16 resolution, so bf16 outputs should be ~bit-equal)
  mulonly      x * sigmoid-free elementwise baseline (bandwidth floor)
  ln_f32       two-pass mean/var in f32 (the model's current LN)
  ln_onepass   E[x^2]-E[x]^2 single-pass f32
  mlp_erf / mlp_poly / matmuls_only   the composed [C->4C->C] MLP

Also prints max|bf16(gelu_poly) - bf16(gelu_erf)| over a dense grid.
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
    ap.add_argument("--n", type=int, default=64 * 121 * 162)
    ap.add_argument("--r1", type=int, default=4)
    ap.add_argument("--r2", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    key = jax.random.key(0)
    n = args.n

    def measure(fn, *a):
        def chain(r):
            def body(x, *rest):
                for _ in range(r):
                    x = fn(x, *rest)
                return x
            return jax.jit(body)
        t1 = t_sync(chain(args.r1), *a)
        t2 = t_sync(chain(args.r2), *a)
        return (t2 - t1) / (args.r2 - args.r1)

    def gelu_erf(x):
        return jax.nn.gelu(x, approximate=False)

    def gelu_tanh(x):
        return jax.nn.gelu(x, approximate=True)

    def erf_poly(x):
        # Abramowitz & Stegun 7.1.26, |err| <= 1.5e-7 (f32 compute)
        a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
        a4, a5, p = -1.453152027, 1.061405429, 0.3275911
        s = jnp.sign(x)
        z = jnp.abs(x)
        t = 1.0 / (1.0 + p * z)
        y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(-z * z)
        return s * y

    def gelu_poly(x):
        x32 = x.astype(jnp.float32)
        return (0.5 * x32 * (1.0 + erf_poly(x32 / np.sqrt(2.0).astype(np.float32)))).astype(x.dtype)

    for C in (192, 768):
        x = jax.random.normal(key, (n, C), jnp.bfloat16)
        bytes_rw = 2 * n * C * 2
        for name, fn in (("gelu_erf", gelu_erf), ("gelu_tanh", gelu_tanh),
                         ("gelu_poly", gelu_poly),
                         ("mulonly", lambda x: x * jnp.bfloat16(1.0001))):
            t = measure(fn, x)
            print(f"C={C} {name:10s} {t * 1e3:7.3f} ms  "
                  f"{bytes_rw / t / 1e9:7.1f} GB/s", flush=True)

        def ln_f32(x):
            x32 = x.astype(jnp.float32)
            mu = x32.mean(-1, keepdims=True)
            v = ((x32 - mu) ** 2).mean(-1, keepdims=True)
            return ((x32 - mu) * jax.lax.rsqrt(v + 1e-5)).astype(x.dtype)

        def ln_onepass(x):
            x32 = x.astype(jnp.float32)
            m1 = x32.mean(-1, keepdims=True)
            m2 = (x32 * x32).mean(-1, keepdims=True)
            v = m2 - m1 * m1
            return ((x32 - m1) * jax.lax.rsqrt(v + 1e-5)).astype(x.dtype)

        for name, fn in (("ln_f32", ln_f32), ("ln_onepass", ln_onepass)):
            t = measure(fn, x)
            print(f"C={C} {name:10s} {t * 1e3:7.3f} ms  "
                  f"{bytes_rw / t / 1e9:7.1f} GB/s", flush=True)

    # composed MLP at stage-0 shape
    C = 192
    x = jax.random.normal(key, (n, C), jnp.bfloat16)
    w1 = jax.random.normal(key, (C, 4 * C), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(key, (4 * C, C), jnp.bfloat16) * 0.02
    flops = 2 * n * C * 4 * C * 2
    for name, g in (("mlp_erf", gelu_erf), ("mlp_poly", gelu_poly),
                    ("mlp_tanh", gelu_tanh), ("matmuls_only", None)):
        if g is None:
            fn = lambda x, w1, w2: (x @ w1)[:, :C] @ w2[:C]  # noqa: E731
            fl = 2 * n * C * C + 2 * n * C * C
        else:
            fn = (lambda g: lambda x, w1, w2: g(x @ w1) @ w2)(g)
            fl = flops
        t = measure(fn, x, w1, w2)
        print(f"{name:14s} {t * 1e3:7.3f} ms  {fl / t / 1e12:6.1f} TF/s",
              flush=True)

    # bf16 equivalence of the poly gelu
    g = jnp.linspace(-12.0, 12.0, 2_000_001, dtype=jnp.float32)
    a = np.asarray(gelu_erf(g).astype(jnp.bfloat16), np.float32)
    b = np.asarray(gelu_poly(g).astype(jnp.bfloat16), np.float32)
    bad = np.sum(a != b)
    print(f"gelu_poly vs erf at bf16 over [-12,12]: {bad} of {len(a)} "
          f"outputs differ; max|d|={np.abs(a - b).max():.3e}")
    c = np.asarray(gelu_tanh(g).astype(jnp.bfloat16), np.float32)
    print(f"gelu_tanh vs erf at bf16:              {np.sum(a != c)} differ; "
          f"max|d|={np.abs(a - c).max():.3e}")


if __name__ == "__main__":
    main()
