#!/usr/bin/env python
"""Preset-scale fill A/B (P=2^20, M=2^18, Pv=65536):

  1. per-view nearest_fill_grid at Pv=65536 across num_candidates — the
     default 2048 budget was tuned at Pv=16384; dense tiles at 4x the rows
     may overflow into full-db fallbacks (the same failure the global fill
     hit at P=131k, scripts/bench_ab_fill.py);
  2. voxel-resolution unseen fill: old argmin_search full M x M sweep vs
     the grid-pruned donor fill (models/lift.fill_unseen_points_voxel).

Timing rule (CLAUDE.md): force float(jnp.sum(out)) per trial.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def t_sync(fn, *a, trials=3):
    import jax.numpy as jnp

    out = fn(*a)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    ts = []
    for _ in range(trials):
        t0 = time.time()
        out = fn(*a)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import bench
    from geopurify_tpu.ops.knn import argmin_search, nearest_fill_grid

    P, M, V, Pv = 2 ** 20, 2 ** 18, 2, 2 ** 16
    batch = bench.build_scene(0, P, M, V, Pv, (32, 48))
    rng = np.random.default_rng(0)

    # --- per-view fill at Pv=65536 ---
    C = 512
    coords = np.asarray(batch.points[np.asarray(batch.view_point_ids[0]) % P])
    vj = jnp.asarray(np.asarray(batch.view_point_valid[0]))
    cj = jnp.asarray(coords, jnp.float32)
    feats = jnp.asarray(rng.standard_normal((Pv, C), np.float32))
    for frac in (0.3, 0.6):
        has = jnp.asarray((rng.random(Pv) > frac)) & vj
        for nc in (2048, 4096, 8192):
            f = jax.jit(partial(nearest_fill_grid, num_candidates=nc))
            t = t_sync(f, feats, cj, has, vj)
            print(f"view-fill Pv={Pv} unseen={frac:.2f} cand={nc}: {t*1e3:7.1f}ms")

    # --- voxel-resolution global fill at M=2^18 ---
    vfeats = jnp.asarray(rng.standard_normal((M, C), np.float32))
    vcoords = batch.voxel_coords.astype(jnp.float32)
    vvalid = batch.voxel_valid
    for frac in (0.1, 0.3):
        vox_seen = jnp.asarray(rng.random(M) > frac) & vvalid

        def old(f, c, s, v):
            donor = argmin_search(c, c, s & v)
            return f[donor]

        t_old = t_sync(jax.jit(old), vfeats, vcoords, vox_seen, vvalid)
        t_new = t_sync(
            jax.jit(partial(nearest_fill_grid, num_candidates=4096)),
            vfeats, vcoords, vox_seen, vvalid,
        )
        print(f"voxel-fill M={M} unseen={frac:.2f}: argmin={t_old*1e3:7.1f}ms "
              f"grid={t_new*1e3:7.1f}ms")


if __name__ == "__main__":
    main()
