#!/usr/bin/env python
"""Certificate-failure diagnosis for ops/knn.knn_self_grid at a given M.

Reports, per (radius, candidates) config: how many queries fail the
certificate, split by cause — tile candidate overflow, supertile overflow,
or a genuine d_k > radius (sparse-region query) — plus the true d_k
distribution. The fallback pass costs ~1 full-row top_k per 1024 failures,
so the failure count IS the pass-2 cost model.
"""

from __future__ import annotations

import argparse
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=262144)
    ap.add_argument("--radius", type=int, default=12)
    ap.add_argument("--candidates", type=int, default=4096)
    ap.add_argument("--k", type=int, default=96)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import bench
    from geopurify_tpu.ops.knn import _pad_to, knn_self_grid
    from geopurify_tpu.ops.morton import hilbert_code

    M, k, radius, C = args.m, args.k, args.radius, args.candidates
    T, G = 128, 16
    Cs = min(6 * C, M)
    batch = bench.build_scene(0, 2 * M, M, 1, 1024, (32, 48))
    coords = jnp.asarray(np.asarray(batch.voxel_coords), jnp.int32)
    valid = jnp.ones((M,), bool)

    # exact kNN distances (the grid path is exact) -> true d_k per query
    dists, _ = jax.jit(partial(knn_self_grid, k=k, radius=radius,
                               num_candidates=C))(coords, valid)
    dk = np.sqrt(np.asarray(dists[:, k - 1]))
    print(f"d_{k} percentiles: p50={np.percentile(dk,50):.1f} "
          f"p90={np.percentile(dk,90):.1f} p99={np.percentile(dk,99):.1f} "
          f"max={dk.max():.1f}  frac(d_k > r={radius}): {(dk>radius).mean():.4f}")

    # tile/supertile overflow counts at this (radius, C)
    @jax.jit
    def overflow_stats(coords, valid):
        n_t = -(-M // (T * G)) * G
        Mp = n_t * T
        cf = coords.astype(jnp.float32)
        code = jnp.where(valid, hilbert_code(jnp.maximum(coords, 0)),
                         jnp.int32(2 ** 30))
        perm = jnp.argsort(code)
        perm_p = _pad_to(perm, Mp, value=M - 1).astype(jnp.int32)
        qv_p = _pad_to(valid[perm], Mp, value=False)

        def one_super(arg):
            qids, qvs = arg                       # [G, T]
            q_all = cf[qids.reshape(-1)]
            qv_all = qvs.reshape(-1)[:, None]
            s_lo = jnp.min(jnp.where(qv_all, q_all, jnp.inf), axis=0) - radius
            s_hi = jnp.max(jnp.where(qv_all, q_all, -jnp.inf), axis=0) + radius
            s_in = jnp.all((cf >= s_lo[None]) & (cf <= s_hi[None]), axis=-1) & valid
            s_total = jnp.sum(s_in.astype(jnp.int32))

            def tile_total(qid, qv):
                q = cf[qid]
                qvc = qv[:, None]
                lo = jnp.min(jnp.where(qvc, q, jnp.inf), axis=0) - radius
                hi = jnp.max(jnp.where(qvc, q, -jnp.inf), axis=0) + radius
                in_box = jnp.all((cf >= lo[None]) & (cf <= hi[None]), axis=-1) & valid
                return jnp.sum(in_box.astype(jnp.int32))

            t_tot = jax.vmap(tile_total)(qids, qvs)   # [G]
            return s_total, t_tot

        q_tiles = perm_p.reshape(n_t // G, G, T)
        v_tiles = qv_p.reshape(n_t // G, G, T)
        s_tot, t_tot = jax.lax.map(one_super, (q_tiles, v_tiles))
        return s_tot, t_tot.reshape(-1)

    s_tot, t_tot = overflow_stats(coords, valid)
    s_tot = np.asarray(s_tot)
    t_tot = np.asarray(t_tot)
    print(f"supertiles: {len(s_tot)}, cand p50={np.percentile(s_tot,50):.0f} "
          f"max={s_tot.max()}  overflow(>{Cs}): {(s_tot>Cs).sum()}")
    print(f"tiles: {len(t_tot)}, cand p50={np.percentile(t_tot,50):.0f} "
          f"p99={np.percentile(t_tot,99):.0f} max={t_tot.max()}  "
          f"overflow(>{C}): {(t_tot>C).sum()} "
          f"({(t_tot>C).mean()*100:.2f}% of tiles -> "
          f"{(t_tot>C).sum()*T} queries)")


if __name__ == "__main__":
    main()
