#!/usr/bin/env python
"""A/B the round-3 landed-but-unmeasured changes at the driver bench spec:

  1. nearest_fill (gated O(n_unseen*N) sweep) vs nearest_fill_grid
     (Hilbert-tiled bbox-pruned) at the per-view (Pv=16384) and global
     (P=131072) fill shapes, across unseen fractions;
  2. knn_self_grid selector='approx' (lax.approx_min_k) vs 'exact'
     (lax.top_k) on the real bench voxel coords (M=65536).

Timing rule (CLAUDE.md): force int(jnp.sum(out)) per trial.
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
    from geopurify_tpu.ops.knn import knn_self_grid, nearest_fill, nearest_fill_grid

    P, M, V, Pv = 131072, 65536, 8, 16384
    batch = bench.build_scene(0, P, M, V, Pv, (32, 48))
    rng = np.random.default_rng(0)

    # --- fills ---
    C = 512
    for name, N, coords, valid in (
        ("view", Pv, np.asarray(batch.points[np.asarray(batch.view_point_ids[0]) % P]),
         np.asarray(batch.view_point_valid[0])),
        ("global", P, np.asarray(batch.points), np.asarray(batch.point_valid)),
    ):
        feats = jnp.asarray(rng.standard_normal((N, C), np.float32))
        cj = jnp.asarray(coords, jnp.float32)
        vj = jnp.asarray(valid)
        jsweep = jax.jit(lambda f, c, h, v: nearest_fill(f, c, h, v))
        jgrid = jax.jit(lambda f, c, h, v: nearest_fill_grid(f, c, h, v))
        for frac in (0.05, 0.3, 0.6):
            has = jnp.asarray((rng.random(N) > frac)) & vj
            t_sweep = t_sync(jsweep, feats, cj, has, vj)
            t_grid = t_sync(jgrid, feats, cj, has, vj)
            print(f"fill {name:6s} N={N} unseen={frac:.2f}: sweep={t_sweep*1e3:7.1f}ms grid={t_grid*1e3:7.1f}ms")

    # --- knn selector ---
    vc = batch.voxel_coords
    vv = batch.voxel_valid
    for sel in ("approx", "exact"):
        f = jax.jit(partial(knn_self_grid, k=96, radius=12, num_candidates=4096,
                            selector=sel))
        t = t_sync(f, vc, vv)
        print(f"knn selector={sel}: {t*1e3:7.1f}ms")


if __name__ == "__main__":
    main()
