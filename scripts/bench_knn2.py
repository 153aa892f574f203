"""Follow-up kNN measurements: top_k k/width scaling + tile-bbox candidates.

Round-2 findings so far (scripts/bench_knn.py on v5e, M=65536):
  knn_search 1535 ms; raw top_k = 1445 ms of it; distances 16 ms;
  two-level chunked top_k SLOWER (1842/2298 ms) -> TopK cost ~ O(N*k),
  so the only lever is candidate-width reduction.

This script times: (1) top_k k-sweep, (2) top_k at reduced widths,
(3) the full tile-bbox candidate design (compact candidates once per
query tile from a Morton-sorted db, exact-certificate + fallback).
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "scripts")
from bench_knn import synth_voxels, timed  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=65536)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    M = args.m
    T = 1024
    n_t = M // T
    blk = jnp.asarray(np.random.default_rng(0).random((T, M)).astype(np.float32))

    for k in (16, 96, 192):
        @jax.jit
        def sweep(x, k=k):
            def one(i):
                return jax.lax.top_k(x + i.astype(jnp.float32), k)[1]
            return jax.lax.map(one, jnp.arange(n_t))

        t = timed(sweep, blk)
        print(f"top_k [{T}x{M}] x{n_t} k={k}: {t*1e3:.1f} ms", flush=True)

    for width in (4096, 8192, 16384):
        nw = M // width
        blk_w = blk[:, :width]

        @jax.jit
        def narrow(x, width=width):
            def one(i):
                return jax.lax.top_k(x + i.astype(jnp.float32), 96)[1]
            return jax.lax.map(one, jnp.arange(n_t))

        t = timed(narrow, blk_w)
        print(f"top_k [{T}x{width}] x{n_t} k=96: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
