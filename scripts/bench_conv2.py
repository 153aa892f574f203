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

    # --- scatter-form: out[nbr[j,K-1-k]] += f[j] @ W[k] (stencil symmetry:
    # nbr[i,k]=j <=> nbr[j,K-1-k]=i, see ops/sparse_conv._conv_core_bwd).
    # Per tap: one dense [M,Cin]@[Cin,Cout] matmul (no gather at all) + one
    # unique-index scatter-add of M rows (sentinel M rows drop out of bounds).
    # Gathers cost ~20 ns/row at this table size vs ~12 ns/row scatters, so
    # trading the tap gather for a scatter should win despite the RMW.
    def make_scatter_conv(dt):
        Wd = W.astype(dt)

        @jax.jit
        def conv(f):
            fd = f.astype(dt)

            def body(acc, k):
                g = jax.lax.dot_general(
                    fd, Wd[k], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dst = nbr[:, K - 1 - k]
                acc = acc.at[dst].add(g, mode="drop", unique_indices=True)
                return acc, None

            acc0 = jnp.zeros((M, Cout), jnp.float32)
            acc, _ = jax.lax.scan(body, acc0, jnp.arange(K))
            return jnp.where(valid[:, None], acc, 0).astype(dt)

        return conv

    for dt in (jnp.float32, jnp.bfloat16):
        t = t_sync(make_scatter_conv(dt), f32)
        print(f"scatter-form {dt.__name__}: {t:.1f} ms")
    ref0 = sparse_conv3(f32, nbr, W, valid)
    outs = make_scatter_conv(jnp.float32)(f32)
    err0 = float(jnp.max(jnp.abs(outs - ref0)) / (jnp.max(jnp.abs(ref0)) + 1e-9))
    print(f"scatter-form f32 rel err vs tap-scan: {err0:.2e}")

    # --- z-stacked columns: voxels are lex-sorted (x,y,z), so the z-pred/
    # z-succ of row r are rows r-1/r+1 WHEN THEY EXIST. Build once per conv
    # H = [f(z-pred) || f || f(z-succ)] [M+1, 3C] (two shifts + masks, zero
    # sentinel row), then each (dx,dy) column needs ONE row-gather at the
    # dz=0 tap's index with 3C-wide rows: 27 gathers -> 9, same bytes, 3x
    # fewer gather indices (the per-index cost dominates at C=512 — see the
    # scatter/gather cost model in CLAUDE.md). Misses (middle voxel absent
    # but z+-1 present: a hole or run boundary in the neighbor column) are
    # repaired by an exact per-tap residual over a compacted edge list.
    coords_np = np.asarray(batch.voxel_coords)
    valid_np = np.asarray(valid)
    nbr_np = np.asarray(nbr)
    adj = (
        np.all(coords_np[1:] - coords_np[:-1] == np.array([0, 0, 1]), axis=-1)
        & valid_np[1:] & valid_np[:-1]
    )
    has_pred = jnp.asarray(np.concatenate([[False], adj]))
    has_succ = jnp.asarray(np.concatenate([adj, [False]]))
    # column order: kernel_offsets_3d is x-major product, so taps 3c, 3c+1,
    # 3c+2 are (dx,dy,-1), (dx,dy,0), (dx,dy,+1) of column c
    t_mid = jnp.asarray(nbr_np[:, np.arange(1, K, 3)])  # [M, 9]
    # residual edges: tap k=3c+-1 live while the column's mid tap absent —
    # compacted host-side per tap (in the real impl this is a once-per-scene
    # device compaction with static capacity, like the banded residual)
    res_edges = []   # (tap, dst_rows, src_rows)
    for c in range(9):
        mid_dead = nbr_np[:, 3 * c + 1] >= M
        for k in (3 * c, 3 * c + 2):
            dst = np.nonzero((nbr_np[:, k] < M) & mid_dead)[0]
            if dst.size:
                res_edges.append(
                    (k, jnp.asarray(dst.astype(np.int32)),
                     jnp.asarray(nbr_np[dst, k].astype(np.int32)))
                )
    n_res = int(sum(d.shape[0] for _, d, _ in res_edges))
    print(f"z-stack residual edges: {n_res} ({n_res/(M*K):.4f} of all taps, "
          f"{len(res_edges)} taps)")

    def make_zstack_conv(dt):
        # stacked weights: column c uses [W[3c]; W[3c+1]; W[3c+2]] [3C, Cout]
        Wz = jnp.stack(
            [jnp.concatenate([W[3 * c], W[3 * c + 1], W[3 * c + 2]], axis=0)
             for c in range(9)]
        ).astype(dt)                               # [9, 3Cin, Cout]
        t_mid_s = jnp.where(t_mid < M, t_mid, M)   # sentinel -> zero row

        @jax.jit
        def conv(f):
            fd = f.astype(dt)
            fm = jnp.where(has_pred[:, None], jnp.concatenate(
                [fd[:1] * 0, fd[:-1]], axis=0), 0)
            fp = jnp.where(has_succ[:, None], jnp.concatenate(
                [fd[1:], fd[:1] * 0], axis=0), 0)
            H = jnp.concatenate([fm, fd, fp], axis=1)          # [M, 3C]
            H = jnp.concatenate([H, jnp.zeros((1, 3 * Cin), dt)], axis=0)

            def body(acc, c):
                g = H[t_mid_s[:, c]]                           # [M, 3C]
                acc = acc + jax.lax.dot_general(
                    g, Wz[c], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return acc, None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((M, Cout), jnp.float32), jnp.arange(9))
            # residual: missed z+-1 edges, compacted per tap
            for k, dst, src in res_edges:
                g = jax.lax.dot_general(
                    fd[src], W[k].astype(dt), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = acc.at[dst].add(g, unique_indices=True)
            return jnp.where(valid[:, None], acc, 0).astype(dt)

        return conv

    for dt in (jnp.float32, jnp.bfloat16):
        t = t_sync(make_zstack_conv(dt), f32)
        print(f"z-stack {dt.__name__}: {t:.1f} ms")
    outz = make_zstack_conv(jnp.float32)(f32)
    errz = float(jnp.max(jnp.abs(outz - ref0)) / (jnp.max(jnp.abs(ref0)) + 1e-9))
    print(f"z-stack f32 rel err vs tap-scan: {errz:.2e}")

    if M * K * Cout * 4 > 6e9:
        print("skipping edge-compacted variants (pre-matmul buffer would OOM)")
        return

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
