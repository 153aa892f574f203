#!/usr/bin/env python
"""Selector A/B across candidate widths: approx_min_k (current default) vs
lax.top_k vs full sort_key_val, at the kNN pass-1 workload shape
(32 supertile calls of [2048, C] rows, k=96).

Rationale: the topk phase is 167 ms of the 320 ms kNN at M=65536; if the
selection primitive is ~linear in C, a candidate budget of 3072 or 2048
(paid for by a slightly higher fallback rate, measured separately by
bench_knn3 --candidates) may beat the 4096 default end-to-end.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

K = 96
ROWS = 2048
CALLS = 32


def make_d2(C, seed=0):
    rng = np.random.default_rng(seed)
    near = rng.integers(0, 145, (CALLS, ROWS, C // 2))
    far = rng.integers(145, 120000, (CALLS, ROWS, C - C // 2))
    return jnp.asarray(np.concatenate([near, far], -1).astype(np.float32))


def timeit(name, fn, d2):
    out = fn(d2)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(d2)
        int(jnp.sum(out[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)


def main():
    for C in (2048, 3072, 4096):
        d2 = make_d2(C)

        @jax.jit
        def approx(d2):
            return jax.lax.map(
                lambda d: jax.lax.approx_min_k(d, K, recall_target=1.0), d2
            )

        @jax.jit
        def topk(d2):
            def one(d):
                neg, arg = jax.lax.top_k(-d, K)
                return -neg, arg
            return jax.lax.map(one, d2)

        @jax.jit
        def sortkv(d2):
            def one(d):
                iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
                sd, si = jax.lax.sort_key_val(d, iota)
                return sd[:, :K], si[:, :K]
            return jax.lax.map(one, d2)

        print(f"--- C={C}")
        timeit("approx_min_k", approx, d2)
        timeit("lax.top_k   ", topk, d2)
        timeit("sort_key_val", sortkv, d2)


if __name__ == "__main__":
    main()
