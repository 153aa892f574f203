"""Micro-benchmark: decompose the Stage-2 kNN-96 cost on the real TPU.

VERDICT r1 names the exact kNN-96 (1.49 s of ~3.5 s/scene at M=65k) the top
perf target. This script times the pieces so the attack is data-driven:
  - knn_search end-to-end at bench scale (M=65k) and preset scale (M=262k)
  - raw lax.top_k on a [tile, M] block (the suspected dominant term)
  - the distance-matrix computation alone
  - approx_max_k at various recall targets (for reference; known-rejected)

Usage:  python scripts/bench_knn.py [--smoke]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def synth_voxels(m: int, seed: int = 0) -> np.ndarray:
    """Surface-like integer voxel coords: a few room-scale walls + clutter."""
    rng = np.random.default_rng(seed)
    n_wall = m // 2
    # two walls (y-z and x-z planes) + floor + noise blobs
    w1 = np.stack([np.zeros(n_wall // 3), rng.integers(0, 300, n_wall // 3),
                   rng.integers(0, 150, n_wall // 3)], 1)
    w2 = np.stack([rng.integers(0, 300, n_wall // 3), np.zeros(n_wall // 3),
                   rng.integers(0, 150, n_wall // 3)], 1)
    fl = np.stack([rng.integers(0, 300, n_wall // 3), rng.integers(0, 300, n_wall // 3),
                   np.zeros(n_wall // 3)], 1)
    rest = m - 3 * (n_wall // 3)
    blobs = rng.integers(0, 300, (rest, 3))
    c = np.concatenate([w1, w2, fl, blobs]).astype(np.int32)
    c = np.unique(c, axis=0)
    if len(c) < m:  # pad with random distinct-ish points
        extra = rng.integers(300, 600, (m - len(c), 3)).astype(np.int32)
        c = np.concatenate([c, extra])
    c = c[:m]
    order = np.lexsort((c[:, 2], c[:, 1], c[:, 0]))
    return c[order]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--m", type=int, default=None)
    args = ap.parse_args()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from geopurify_tpu.ops.knn import knn_search

    sizes = [args.m] if args.m else ([4096] if args.smoke else [65536, 262144])
    k = 96
    for M in sizes:
        coords = jnp.asarray(synth_voxels(M), jnp.float32)
        valid = jnp.ones((M,), bool)
        ids = jnp.arange(M, dtype=jnp.int32)

        t = timed(
            lambda c: knn_search(c, c, valid, k=k, query_ids=ids,
                                 exclude_identical_index=True)[1],
            coords,
        )
        print(f"M={M}: knn_search k={k}: {t*1e3:.1f} ms", flush=True)

        # raw top_k cost: one [T, M] block, top_k'd n_t times (same total
        # top_k area as knn_search's full-row path, no distance math)
        T = 1024
        n_t = M // T

        @jax.jit
        def pure_topk(x):
            def one(i):
                return jax.lax.top_k(x + i.astype(jnp.float32), k)[1]
            return jax.lax.map(one, jnp.arange(n_t))

        d2_blk = jnp.asarray(
            np.random.default_rng(0).random((T, M)).astype(np.float32)
        )
        t = timed(pure_topk, d2_blk)
        print(f"M={M}: raw top_k [{T}x{M}] x{n_t}: {t*1e3:.1f} ms", flush=True)

        # distance computation alone (no top_k): same tiling
        @jax.jit
        def dists_only(c):
            c_sq = jnp.sum(c * c, axis=-1)

            def one(i):
                q = jax.lax.dynamic_slice_in_dim(c, i * T, T)
                d2 = (jnp.sum(q * q, -1)[:, None] + c_sq[None, :]
                      - 2.0 * q @ c.T)
                return jnp.sum(d2, axis=1)  # force materialization

            return jax.lax.map(one, jnp.arange(n_t))

        t = timed(dists_only, coords)
        print(f"M={M}: distance matrix only: {t*1e3:.1f} ms", flush=True)

        # two-level EXACT top-k: per-chunk top-k union, then merge — the true
        # top-k of a row is contained in the union of its chunks' top-k's,
        # and narrow sorts are much cheaper than one 65536-wide sort
        for CH in (1024, 4096):
            n_c = M // CH

            @jax.jit
            def twolevel(c):
                c_sq = jnp.sum(c * c, axis=-1)

                def one(i):
                    q = jax.lax.dynamic_slice_in_dim(c, i * T, T)
                    d2 = (jnp.sum(q * q, -1)[:, None] + c_sq[None, :]
                          - 2.0 * q @ c.T)
                    d2r = d2.reshape(T, n_c, CH)
                    neg1, a1 = jax.lax.top_k(-d2r, k)          # [T, n_c, k]
                    base = (jnp.arange(n_c, dtype=jnp.int32) * CH)[None, :, None]
                    idx1 = (a1 + base).reshape(T, n_c * k)
                    neg2, a2 = jax.lax.top_k(neg1.reshape(T, n_c * k), k)
                    return jnp.take_along_axis(idx1, a2, axis=1)

                return jax.lax.map(one, jnp.arange(n_t))

            t = timed(twolevel, coords)
            print(f"M={M}: two-level top_k (chunk {CH}): {t*1e3:.1f} ms", flush=True)

        # approx_max_k reference point
        @jax.jit
        def approx(c):
            c_sq = jnp.sum(c * c, axis=-1)

            def one(i):
                q = jax.lax.dynamic_slice_in_dim(c, i * T, T)
                d2 = (jnp.sum(q * q, -1)[:, None] + c_sq[None, :]
                      - 2.0 * q @ c.T)
                return jax.lax.approx_min_k(d2, k, recall_target=0.99)[1]

            return jax.lax.map(one, jnp.arange(n_t))

        t = timed(approx, coords)
        print(f"M={M}: approx_min_k(recall .99): {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
