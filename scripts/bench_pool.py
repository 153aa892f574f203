#!/usr/bin/env python
"""Decompose the Stage-2 pool tail (kNN / banded build / smoothing / student /
segment) at the driver bench spec — the r3 perf target is pool < 0.7 s.

Timing rule (CLAUDE.md): block_until_ready alone under-measures through the
axon tunnel; every trial forces int(jnp.sum(out)).

Usage: python scripts/bench_pool.py [--m 65536] [--trials 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def t_sync(fn, *args, trials=3):
    import jax.numpy as jnp

    out = fn(*args)
    first = jnp.sum(out[0] if isinstance(out, tuple) else out)
    float(first)  # compile + first run
    ts = []
    for _ in range(trials):
        t0 = time.time()
        out = fn(*args)
        s = jnp.sum(out[0] if isinstance(out, tuple) else out)
        float(s)
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=65536)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--band", type=int, default=None,
                    help="override pooling.band (bench --preset-scale uses "
                         "6144 at M=2^18; the default 12288 OOMs there)")
    ap.add_argument("--max-residual", type=int, default=None)
    ap.add_argument("--channels", type=int, default=None,
                    help="smoothed channel count (logit-space default "
                         "smooths n_cls->128-padded, not 518)")
    ap.add_argument("--smooth-only", action="store_true",
                    help="time only banded build + banded/gather smoothing "
                         "(band sweeps; skips kNN/student/total)")
    args = ap.parse_args()
    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from geopurify_tpu.config import load_config
    from geopurify_tpu.models.student import AffinityPredictor
    from geopurify_tpu.ops.knn import knn_self_grid
    from geopurify_tpu.ops.pooling import (
        build_affinity_graph,
        build_banded_operator,
        geometry_guided_pooling,
        iterate_pooling_banded,
    )
    from geopurify_tpu.ops.segment import segment_mean
    from geopurify_tpu.ops.sparse_conv import build_neighbor_table

    cfg = load_config("scannet")
    pc = cfg.pooling
    if args.band or args.max_residual:
        import dataclasses

        pc = dataclasses.replace(
            pc,
            band=args.band or pc.band,
            max_residual=args.max_residual or pc.max_residual,
        )
    M = args.m
    P = 2 * M
    rng = np.random.default_rng(0)

    # the DRIVER BENCH scene family (floor/walls/ellipsoid shells) — the old
    # fog-quarter synthetic inflated kNN certificate failures ~10x
    import bench as bench_mod

    batch = bench_mod.build_scene(0, P, M, 1, 1024, (32, 48))
    coords = jnp.asarray(np.asarray(batch.voxel_coords), jnp.int32)
    valid = jnp.ones((M,), bool)
    emb = jnp.asarray(rng.normal(0, 1, (M, 128)).astype(np.float32))
    feats = jnp.asarray(rng.normal(0, 1, (M, 518)).astype(np.float32))
    smooth_ch = args.channels or feats.shape[1]
    sfeats = feats[:, :smooth_ch] if smooth_ch <= 518 else jnp.asarray(
        rng.normal(0, 1, (M, smooth_ch)).astype(np.float32))

    graph = jax.jit(lambda e, c, v: build_affinity_graph(
        e, c, v, k=pc.knn_k, sharpen=pc.sharpen,
        knn_radius=pc.knn_radius, knn_candidates=pc.knn_candidates,
    ))
    if not args.smooth_only:
        knn = jax.jit(lambda c, v: knn_self_grid(
            c, v, k=pc.knn_k, radius=pc.knn_radius,
            num_candidates=pc.knn_candidates,
        ))
        print("knn_self_grid:", t_sync(knn, coords, valid, trials=args.trials))
        print("graph build (knn+affinity):",
              t_sync(graph, emb, coords, valid, trials=args.trials))

    nbr, w = graph(emb, coords, valid)
    banded = jax.jit(lambda ww, nn_: build_banded_operator(
        ww, nn_, band=pc.band, max_residual=pc.max_residual,
        assume_unique_neighbors=True,
    ))
    print("banded build:", t_sync(banded, w, nbr, trials=args.trials))

    op = banded(w, nbr)
    rc_arg = args.max_residual or 262144
    smooth = jax.jit(lambda o, f: iterate_pooling_banded(
        o, f, num_iterations=pc.num_iterations, band=pc.band,
        res_chunk=rc_arg,
    ))
    print("19x banded smoothing:",
          t_sync(smooth, op, sfeats, trials=args.trials))
    # split: re-run with the residual EMPTIED (res_row=M padding everywhere)
    # — the runtime chunk gate skips every residual chunk, so the difference
    # vs the full op is the 19x residual cost (gather + sorted segment_sum)
    n_res = int(jax.device_get((op.res_row < M).sum()))
    # EMPTY group arrays (static shape 0) so the ungated grouped apply
    # compiles away entirely — zeroed weights would still pay the full
    # slot-proportional gather+einsum (r4 review finding)
    op_nores = op._replace(
        res_row=jnp.full_like(op.res_row, M),
        res_w=jnp.zeros_like(op.res_w),
        grp_row=jnp.zeros((0,), jnp.int32),
        grp_col=jnp.zeros((0, 8), jnp.int32),
        grp_w=jnp.zeros((0, 8), jnp.float32),
    )
    t_core = t_sync(smooth, op_nores, sfeats, trials=args.trials)
    print(f"  banded core only (residual gated off; n_res={n_res}):", t_core)

    # gather-path A/B: in LOGIT space (C=n_cls) the per-round gather traffic
    # scales with C while the banded path's S-read cost is C-independent —
    # at tiny C the fixed-degree gather may win and the banded build
    # (2x M*K scatters) drops entirely
    from geopurify_tpu.ops.pooling import iterate_pooling

    gsmooth = jax.jit(lambda ww, nn_, f: iterate_pooling(
        ww, nn_, f, num_iterations=pc.num_iterations,
    ))
    print("19x gather smoothing:",
          t_sync(gsmooth, w, nbr, sfeats, trials=args.trials))
    if args.smooth_only:
        return

    pool = jax.jit(lambda e, f, c, v: geometry_guided_pooling(
        e, f, c, v, k=pc.knn_k, sharpen=pc.sharpen,
        num_iterations=pc.num_iterations, spmm_mode=pc.spmm_mode,
        band=pc.band, max_residual=pc.max_residual,
        knn_radius=pc.knn_radius, knn_candidates=pc.knn_candidates,
    ))
    print("geometry_guided_pooling total:",
          t_sync(pool, emb, sfeats, coords, valid, trials=args.trials))

    # student + segment tail
    student = AffinityPredictor(
        input_dim=cfg.student.input_dim, hidden_dim=cfg.student.hidden_dim,
        embed_dim=cfg.student.embed_dim,
        num_res_blocks=cfg.student.num_res_blocks,
    )
    svars = student.init(jax.random.key(0), feats[:8], jnp.full((8, 27), 8,
                         jnp.int32), jnp.ones(8, bool), train=False)
    nbr_tab = jax.jit(build_neighbor_table)(coords, valid)
    stud = jax.jit(lambda f, nb, v: student.apply(svars, f, nb, v, train=False))
    print("neighbor table:", t_sync(
        jax.jit(build_neighbor_table), coords, valid, trials=args.trials))
    print("student fwd (tap-scan):",
          t_sync(stud, feats, nbr_tab, valid, trials=args.trials))
    if M >= cfg.student.zstack_min_voxels:
        # mirror the pipeline's large-M fast path (_voxel_embed): z-stack
        # table derived from the 27-table, conv via rolls + 9 wide gathers
        from geopurify_tpu.ops.sparse_conv import build_zstack_table

        zbuild = jax.jit(lambda c, v, nb: build_zstack_table(
            c, v, nb, res_budget=max(16384, M // 16)))
        print("zstack table build:",
              t_sync(lambda c, v: zbuild(c, v, nbr_tab), coords, valid,
                     trials=args.trials))
        zt = zbuild(coords, valid, nbr_tab)
        # zt rides as a traced pytree argument — a closure capture would bake
        # the [M, 27] table into the jaxpr as constants (compile blowup)
        studz = jax.jit(
            lambda f, z, v: student.apply(svars, f, z, v, train=False))
        print("student fwd (z-stack):",
              t_sync(studz, feats, zt, valid, trials=args.trials))

    p2v = jnp.asarray(rng.integers(0, M, P, ), jnp.int32)
    f2d = jnp.asarray(rng.normal(0, 1, (P, 512)).astype(np.float32))
    seg = jax.jit(lambda f, i: segment_mean(f, i, num_segments=M))
    print("segment_mean P->M:", t_sync(seg, f2d, p2v, trials=args.trials))


if __name__ == "__main__":
    main()
