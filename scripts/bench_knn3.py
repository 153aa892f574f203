#!/usr/bin/env python
"""Phase decomposition of ops/knn.knn_self_grid at the driver bench spec.

Stages (cumulative):
  sort     hilbert code + argsort + pad
  super    + per-supertile bbox pass over full M + compaction (32x)
  tileprep + per-tile bbox over Cs + compaction + distance matmul
  topk     + chunked top-k + index gather (full pass 1)
  full     + certificate fallback pass 2 + unsort scatters (== knn_self_grid)

Timing rule (CLAUDE.md): force int(jnp.sum(out)) per trial.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_scene(M, seed=0):
    """The DRIVER BENCH scene family (floor/walls/ellipsoid shells) — not the
    fog quarter bench_pool.py uses; fog inflates certificate failures."""
    import bench

    batch = bench.build_scene(seed, 2 * M, M, 1, 1024, (32, 48))
    return np.asarray(batch.voxel_coords)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=65536)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--k", type=int, default=96)
    ap.add_argument("--radius", type=int, default=12)
    ap.add_argument("--candidates", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from geopurify_tpu.ops.knn import _chunked_topk_min, _pad_to, knn_self_grid
    from geopurify_tpu.ops.morton import hilbert_code

    M = args.m
    k = args.k
    radius = args.radius
    T, G = 128, 16
    C = args.candidates
    Cs = min(6 * C, M)
    coords = jnp.asarray(make_scene(M), jnp.int32)
    valid = jnp.ones((M,), bool)
    _INF = jnp.float32(jnp.inf)

    @partial(jax.jit, static_argnames=("stage",))
    def staged(coords, valid, stage):
        n_t = -(-M // (T * G)) * G
        Mp = n_t * T
        cf = coords.astype(jnp.float32)
        c_sq = jnp.sum(cf * cf, axis=-1)
        r2 = jnp.float32(radius) ** 2

        code = jnp.where(valid, hilbert_code(jnp.maximum(coords, 0)),
                         jnp.int32(2 ** 30))
        perm = jnp.argsort(code)
        perm_p = _pad_to(perm, Mp, value=M - 1).astype(jnp.int32)
        qv_p = _pad_to(valid[perm], Mp, value=False)
        if stage == "sort":
            return perm_p.astype(jnp.int32)

        def _compact(keep, src_idx, budget):
            slot = jnp.cumsum(keep.astype(jnp.int32)) - 1
            slot = jnp.where(keep & (slot < budget), slot, budget)
            out = jnp.zeros((budget,), jnp.int32).at[slot].set(
                src_idx, mode="drop", unique_indices=True)
            return out, jnp.sum(keep.astype(jnp.int32))

        def tile_prep(qid, qv, sci, s_ok):
            q = cf[qid]
            q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
            qvc = qv[:, None]
            lo = jnp.min(jnp.where(qvc, q, _INF), axis=0) - radius
            hi = jnp.max(jnp.where(qvc, q, -_INF), axis=0) + radius
            sc = cf[sci]
            in_box = jnp.all((sc >= lo[None]) & (sc <= hi[None]), axis=-1) & s_ok
            cand_idx, total = _compact(in_box, sci, C)
            cand_ok = jnp.arange(C) < jnp.minimum(total, C)
            cd = cf[cand_idx]
            dots = jax.lax.dot_general(
                q, cd, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            d2 = q_sq + c_sq[cand_idx][None, :] - 2.0 * dots
            bad = (~cand_ok)[None, :] | (cand_idx[None, :] == qid[:, None])
            return jnp.where(bad, _INF, d2), cand_idx, total

        def one_super(arg):
            qids, qvs = arg
            q_all = cf[qids.reshape(-1)]
            qv_all = qvs.reshape(-1)[:, None]
            s_lo = jnp.min(jnp.where(qv_all, q_all, _INF), axis=0) - radius
            s_hi = jnp.max(jnp.where(qv_all, q_all, -_INF), axis=0) + radius
            s_in = jnp.all((cf >= s_lo[None]) & (cf <= s_hi[None]), axis=-1) & valid
            sci, s_total = _compact(s_in, jnp.arange(M, dtype=jnp.int32), Cs)
            s_ok = jnp.arange(Cs) < jnp.minimum(s_total, Cs)
            if stage == "super":
                return jnp.sum(sci) + s_total, jnp.zeros((), jnp.int32), s_total
            d2, cand_idx, total = jax.vmap(
                tile_prep, in_axes=(0, 0, None, None))(qids, qvs, sci, s_ok)
            if stage == "tileprep":
                return (jnp.sum(d2, where=jnp.isfinite(d2)).astype(jnp.int32),
                        jnp.sum(cand_idx), jnp.max(total))
            pd, loc = _chunked_topk_min(d2.reshape(G * T, C), k)
            pi = jax.vmap(lambda ci, lc: ci[lc])(cand_idx, loc.reshape(G, T, k))
            cert = (pd.reshape(G, T, k)[:, :, k - 1] <= r2)
            return (pd.astype(jnp.int32).sum(), jnp.sum(pi),
                    jnp.sum(cert.astype(jnp.int32)))

        q_tiles = perm_p.reshape(n_t // G, G, T)
        v_tiles = qv_p.reshape(n_t // G, G, T)
        a, b, c = jax.lax.map(one_super, (q_tiles, v_tiles))
        return jnp.sum(a) + jnp.sum(b) + jnp.sum(c)

    def t_sync(fn, *a, trials=args.trials):
        out = fn(*a)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ts = []
        for _ in range(trials):
            t0 = time.time()
            out = fn(*a)
            float(jnp.sum(out[0] if isinstance(out, tuple) else out))
            ts.append(time.time() - t0)
        return min(ts)

    for stage in ("sort", "super", "tileprep", "topk"):
        print(f"{stage:9s}", t_sync(partial(staged, stage=stage), coords, valid))

    # B=16/32 measured 2.1/12.1 s at M=2^18 (partially-full blocks shrink
    # the effective in-box budget -> certificate-fallback blowup); 8 is it
    for blk in (1, 8):
        full = jax.jit(lambda c, v: knn_self_grid(
            c, v, k=k, radius=radius, num_candidates=C, compact_block=blk))
        print(f"full B={blk:<3d}", t_sync(full, coords, valid))
    # exactness across blocks (ties aside, distances must match exactly)
    d1, _ = knn_self_grid(coords, valid, k=k, radius=radius,
                          num_candidates=C, compact_block=1)
    d8, _ = knn_self_grid(coords, valid, k=k, radius=radius,
                          num_candidates=C, compact_block=8)
    print("max |d1-d8|:", float(jnp.max(jnp.abs(d1 - d8))))


if __name__ == "__main__":
    import jax.numpy as jnp  # noqa: E402  (t_sync closure)

    main()
