#!/usr/bin/env python
"""Isolate the kNN supertile candidate-selection pass (the 'super' phase of
ops/knn.knn_self_grid at compact_block=8) and A/B the element-test vs a
precomputed block-bbox overlap test.

Variants per supertile (128 at M=2^18, Cs=16384, BLK=8):
  elem : s_in = all-member in-box test over [M, 3] + block any()   (current)
  bbox : overlap test over precomputed block min/max [M/8, 3]      (candidate)
  cumsum-only : just the block cumsum + scatter (cost floor of both)

Timing rule (CLAUDE.md): force int(jnp.sum(out)) per trial.
"""
import argparse, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=262144)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    import jax, jax.numpy as jnp
    from geopurify_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from geopurify_tpu.ops.knn import _pad_to
    from geopurify_tpu.ops.morton import hilbert_code
    import bench
    M = args.m
    T, G, R, BLK, C = 128, 16, 12, 8, 4096
    Cs = 4 * C
    batch = bench.build_scene(0, 2*M, M, 1, 1024, (32, 48))
    coords = jnp.asarray(np.asarray(batch.voxel_coords), jnp.int32)
    valid = jnp.ones((M,), bool)
    nb = M // BLK
    n_t = -(-M // (T*G)) * G
    Mp = n_t * T
    _INF = jnp.float32(jnp.inf)

    @jax.jit
    def prep(coords, valid):
        cf = coords.astype(jnp.float32)
        code = jnp.where(valid, hilbert_code(jnp.maximum(coords, 0)), jnp.int32(2**30))
        perm = jnp.argsort(code)
        perm_p = _pad_to(perm, Mp, value=M-1).astype(jnp.int32)
        qv_p = _pad_to(valid[perm], Mp, value=False)
        blo = jnp.min(cf.reshape(nb, BLK, 3), axis=1)
        bhi = jnp.max(cf.reshape(nb, BLK, 3), axis=1)
        return cf, perm_p, qv_p, blo, bhi
    cf, perm_p, qv_p, blo, bhi = jax.tree.map(jax.block_until_ready, prep(coords, valid))

    def blk_compact(blk_keep, budget):
        bb = budget // BLK
        bslot = jnp.cumsum(blk_keep.astype(jnp.int32)) - 1
        bslot = jnp.where(blk_keep & (bslot < bb), bslot, bb)
        blk_idx = jnp.zeros((bb,), jnp.int32).at[bslot].set(
            jnp.arange(nb, dtype=jnp.int32), mode="drop", unique_indices=True)
        blk_total = jnp.sum(blk_keep.astype(jnp.int32))
        return blk_idx, blk_total

    def super_pass(mode):
        @jax.jit
        def run(cf, perm_p, qv_p, blo, bhi):
            def one_super(arg):
                qids, qvs = arg
                q_all = cf[qids.reshape(-1)]
                qv_all = qvs.reshape(-1)[:, None]
                s_lo = jnp.min(jnp.where(qv_all, q_all, _INF), axis=0) - R
                s_hi = jnp.max(jnp.where(qv_all, q_all, -_INF), axis=0) + R
                if mode == "elem":
                    s_in = jnp.all((cf >= s_lo[None]) & (cf <= s_hi[None]), axis=-1)
                    blk_keep = jnp.any(s_in.reshape(nb, BLK), axis=1)
                elif mode == "bbox":
                    blk_keep = jnp.all((bhi >= s_lo[None]) & (blo <= s_hi[None]), axis=-1)
                else:  # cumsum-only
                    blk_keep = (jnp.arange(nb) % 11) < 2
                sblk, s_total = blk_compact(blk_keep, Cs)
                sci = (sblk[:, None]*BLK + jnp.arange(BLK, dtype=jnp.int32)[None]).reshape(Cs)
                sc = cf.reshape(nb, BLK*3)[sblk].reshape(Cs, 3)
                return jnp.sum(sci) + jnp.sum(sc).astype(jnp.int32) + s_total
            q_tiles = perm_p.reshape(n_t // G, G, T)
            v_tiles = qv_p.reshape(n_t // G, G, T)
            return jnp.sum(jax.lax.map(one_super, (q_tiles, v_tiles)))
        return run

    for mode in ("elem", "bbox", "cumsum"):
        fn = super_pass(mode)
        out = fn(cf, perm_p, qv_p, blo, bhi); float(jnp.sum(out))
        ts = []
        for _ in range(args.trials):
            t0 = time.time()
            out = fn(cf, perm_p, qv_p, blo, bhi)
            float(jnp.sum(out))
            ts.append(time.time() - t0)
        print(f"super[{mode}] M={M}: {min(ts):.4f}s")

if __name__ == "__main__":
    main()
