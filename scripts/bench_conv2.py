#!/usr/bin/env python
"""A/B the student sparse-conv formulations at the bench scene's density.

The 27-tap neighbor table is only ~20% live on surface scenes (5.4 real
neighbors/voxel — scripts/band_stats_conv.py), so the tap-scan conv gathers
~1.8M rows of which 80% are the zero sentinel. Candidate: pre-matmul all taps
densely (one [M, Cin] @ [Cin, 27*Cout] MXU call), then gather ONLY the live
edges (~0.35M rows) and sorted-segment-sum them per output row.

Usage: python scripts/bench_conv2.py [--m 65536]
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
    float(jnp.sum(out.astype(jnp.float32)))
    ts = []
    for _ in range(trials):
        t0 = time.time()
        out = fn(*a)
        float(jnp.sum(out.astype(jnp.float32)))
        ts.append(time.time() - t0)
    return min(ts) * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=65536)
    ap.add_argument("--cin", type=int, default=512)
    ap.add_argument("--cout", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import bench
    from geopurify_tpu.ops.sparse_conv import build_neighbor_table, sparse_conv3

    M, Cin, Cout = args.m, args.cin, args.cout
    K = 27
    batch = bench.build_scene(0, 2 * M, M, 1, 1024, (32, 48))
    nbr = build_neighbor_table(batch.voxel_coords, batch.voxel_valid)
    valid = batch.voxel_valid
    n_live = int(jnp.sum((nbr < M).astype(jnp.int32)))
    E_cap = 1 << (int(np.ceil(np.log2(n_live))))
    print(f"M={M} live edges={n_live} ({n_live/(M*K):.3f}) E_cap={E_cap}")

    rng = np.random.default_rng(0)
    f32 = jnp.asarray(rng.standard_normal((M, Cin), np.float32))
    W = jnp.asarray(rng.standard_normal((K, Cin, Cout), np.float32) * 0.02)

    # --- current tap-scan conv
    for dt in (jnp.float32, jnp.bfloat16):
        conv = jax.jit(lambda f, w: sparse_conv3(f, nbr, w, valid))
        t = t_sync(conv, f32.astype(dt), W.astype(dt))
        print(f"tap-scan {dt.__name__}: {t:.1f} ms")

    # --- edge-compacted: pack live edge ids once per scene
    @jax.jit
    def edge_pack(nbr):
        live = (nbr < M).reshape(-1)
        rank = jnp.cumsum(live.astype(jnp.int32)) - 1
        keep = live & (rank < E_cap)
        slot = jnp.where(keep, rank, E_cap)
        e_ids = jnp.zeros((E_cap,), jnp.int32).at[slot].set(
            jnp.arange(M * K, dtype=jnp.int32), mode="drop", unique_indices=True
        )
        n = jnp.sum(live.astype(jnp.int32))
        e_live = jnp.arange(E_cap) < n
        rows = jnp.where(e_live, e_ids // K, M)       # non-decreasing, pad M
        srcs = jnp.where(e_live, nbr.reshape(-1)[e_ids], 0)
        taps = jnp.where(e_live, e_ids % K, 0)
        return rows, srcs, taps

    t_pack = t_sync(lambda n: edge_pack(n)[0].astype(jnp.float32), nbr)
    rows, srcs, taps = edge_pack(nbr)
    print(f"edge pack (once/scene): {t_pack:.1f} ms")

    def make_edge_conv(dt):
        W_flat = W.transpose(1, 0, 2).reshape(Cin, K * Cout).astype(dt)

        @jax.jit
        def conv(f):
            g = jax.lax.dot_general(
                f.astype(dt), W_flat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                          # [M, K*Cout]
            g = g.astype(dt).reshape(M * K, Cout)
            ge = g[srcs * K + taps]                    # [E, Cout] live only
            out = jax.ops.segment_sum(
                ge.astype(jnp.float32), rows, num_segments=M,
                indices_are_sorted=True,
            )
            return jnp.where(valid[:, None], out, 0).astype(dt)

        return conv

    for dt in (jnp.float32, jnp.bfloat16):
        t = t_sync(make_edge_conv(dt), f32)
        print(f"edge-compacted {dt.__name__}: {t:.1f} ms")

    # numerical check vs tap-scan (f32)
    ref = sparse_conv3(f32, nbr, W, valid)
    out = make_edge_conv(jnp.float32)(f32)
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"f32 rel err vs tap-scan: {err:.2e}")


if __name__ == "__main__":
    main()
