#!/usr/bin/env python
"""Sweep the banded operator's row_tile (= window-start granularity): smaller
tiles center windows tighter (fewer out-of-band residual edges — the
residual segment_sum dominates preset smoothing: 0.67 of 0.96 s at 2M lex
edges) at the cost of a larger [n_t, band, C] window-gather transient.

Replicates the pipeline's HILBERT row order (geometry_guided_pooling), then
for each row_tile: build + n_res + 19x smoothing time.

Usage: python scripts/bench_band_rt.py [--m 262144 --band 6144 --channels 128
       --max-residual 2097152] [--row-tiles 2048,1024,512]
"""
import argparse, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=262144)
    ap.add_argument("--band", type=int, default=6144)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--max-residual", type=int, default=2097152)
    ap.add_argument("--row-tiles", default="2048,1024,512")
    ap.add_argument("--res-chunks", default="262144",
                    help="residual segment_sum chunk sizes to sweep")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    import jax, jax.numpy as jnp
    from geopurify_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from geopurify_tpu.config import load_config
    from geopurify_tpu.ops.pooling import (
        build_affinity_graph, build_banded_operator, iterate_pooling_banded)
    from geopurify_tpu.ops.morton import hilbert_code
    import bench as bench_mod

    cfg = load_config("scannet")
    pc = cfg.pooling
    M = args.m
    rng = np.random.default_rng(0)
    batch = bench_mod.build_scene(0, 2*M, M, 1, 1024, (32, 48))
    coords = jnp.asarray(np.asarray(batch.voxel_coords), jnp.int32)
    valid = jnp.ones((M,), bool)
    emb = jnp.asarray(rng.normal(0, 1, (M, 128)).astype(np.float32))
    sfeats = jnp.asarray(rng.normal(0, 1, (M, args.channels)).astype(np.float32))

    graph = jax.jit(lambda e, c, v: build_affinity_graph(
        e, c, v, k=pc.knn_k, sharpen=pc.sharpen,
        knn_radius=pc.knn_radius, knn_candidates=pc.knn_candidates))
    nbr, w = graph(emb, coords, valid)
    # pipeline's hilbert reorder (geometry_guided_pooling)
    order = jnp.argsort(jnp.where(valid, hilbert_code(jnp.maximum(coords, 0)),
                                  jnp.int32(2**30)))
    rank = jnp.zeros((M,), jnp.int32).at[order].set(jnp.arange(M, dtype=jnp.int32))
    w_h = w[order]; nbr_h = rank[nbr[order]]; feats_h = sfeats[order]
    jax.block_until_ready(feats_h)

    def t_sync(fn, *a):
        # drop the previous output BEFORE re-invoking: at M=2^18 a banded
        # operator holds a 3.2 GB S — two live at once OOM the 16 GB chip
        out = fn(*a); float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ts = []
        for _ in range(args.trials):
            out = None
            t0 = time.time()
            out = fn(*a)
            float(jnp.sum(out[0] if isinstance(out, tuple) else out))
            ts.append(time.time() - t0)
        return min(ts)

    for rt in (int(x) for x in args.row_tiles.split(",")):
        banded = jax.jit(lambda ww, nn_, rt=rt: build_banded_operator(
            ww, nn_, band=args.band, row_tile=rt,
            max_residual=args.max_residual, assume_unique_neighbors=True))
        tb = t_sync(banded, w_h, nbr_h)
        op = banded(w_h, nbr_h)
        n_res = int(jax.device_get((op.res_row < M).sum()))
        n_drop = int(jax.device_get(op.n_dropped))
        for rc in (int(x) for x in args.res_chunks.split(",")):
            smooth = jax.jit(lambda o, f, rt=rt, rc=rc: iterate_pooling_banded(
                o, f, num_iterations=pc.num_iterations, band=args.band,
                row_tile=rt, res_chunk=rc))
            tsm = t_sync(smooth, op, feats_h)
            print(f"row_tile={rt} res_chunk={rc}: n_res={n_res} "
                  f"dropped={n_drop} build={tb:.3f}s smooth19={tsm:.3f}s",
                  flush=True)
        op = None

if __name__ == "__main__":
    main()
