#!/usr/bin/env python
"""Do the out-of-band kNN edges cluster tightly enough for a SECOND banded
window (per-tile, centered on the out-of-band neighbors' median) to absorb
them as MXU work instead of the per-round COO segment_sum?

Run CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/band2_stats.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax.numpy as jnp

    import bench
    from geopurify_tpu.ops.knn import knn_self_grid
    from geopurify_tpu.ops.morton import hilbert_code

    M, K = 65536, 96
    band, row_tile = 12288, 2048
    batch = bench.build_scene(0, 2 * M, M, 1, 1024, (32, 48))
    coords, valid = batch.voxel_coords, batch.voxel_valid

    dists, nbr = knn_self_grid(coords, valid, k=K)
    code = np.asarray(hilbert_code(jnp.maximum(coords, 0)))
    order = np.argsort(code, kind="stable")
    rank = np.empty(M, np.int64)
    rank[order] = np.arange(M)
    nbr_h = rank[np.asarray(nbr)[order]]
    live = np.isfinite(np.asarray(dists))[order]

    rows = np.arange(M)[:, None]
    tile = rows // row_tile
    n_t = M // row_tile
    center = tile * row_tile + row_tile // 2
    dev = np.where(live, nbr_h - center, 0)
    # window-1 starts: outlier-clipped mean (mirrors build_banded_operator)
    starts = np.zeros(n_t, np.int64)
    for t in range(n_t):
        sl = slice(t * row_tile, (t + 1) * row_tile)
        d = np.clip(dev[sl][live[sl]], -band, band)
        mu = d.mean() if d.size else 0.0
        starts[t] = np.clip(t * row_tile + row_tile // 2 + int(mu) - band // 2,
                            0, M - band)
    local = nbr_h - starts[tile.ravel()].reshape(-1, 1)
    in1 = live & (local >= 0) & (local < band)
    out1 = live & ~in1
    print(f"edges={live.sum()} out-of-band1={out1.sum()} "
          f"({out1.sum()/live.sum():.4f})")

    for band2 in (2048, 4096, 6144):
        captured = 0
        for t in range(n_t):
            sl = slice(t * row_tile, (t + 1) * row_tile)
            ob = nbr_h[sl][out1[sl]]
            if ob.size == 0:
                continue
            med = int(np.median(ob))
            s2 = np.clip(med - band2 // 2, 0, M - band2)
            captured += ((ob >= s2) & (ob < s2 + band2)).sum()
        print(f"band2={band2}: captures {captured} of {out1.sum()} "
              f"({captured/max(out1.sum(),1):.3f}) -> residual "
              f"{out1.sum()-captured}")


if __name__ == "__main__":
    main()


def mean_variant():
    """Same capture test with per-tile MEAN (device-cheap) window-2 centers,
    plus a trimmed-mean variant (drop edges beyond 1.5 IQR-ish via clip)."""
    import jax.numpy as jnp

    import bench
    from geopurify_tpu.ops.knn import knn_self_grid
    from geopurify_tpu.ops.morton import hilbert_code

    M, K = 65536, 96
    band, row_tile = 12288, 2048
    batch = bench.build_scene(0, 2 * M, M, 1, 1024, (32, 48))
    coords, valid = batch.voxel_coords, batch.voxel_valid
    dists, nbr = knn_self_grid(coords, valid, k=K)
    code = np.asarray(hilbert_code(jnp.maximum(coords, 0)))
    order = np.argsort(code, kind="stable")
    rank = np.empty(M, np.int64)
    rank[order] = np.arange(M)
    nbr_h = rank[np.asarray(nbr)[order]]
    live = np.isfinite(np.asarray(dists))[order]
    rows = np.arange(M)[:, None]
    tile = rows // row_tile
    n_t = M // row_tile
    center = tile * row_tile + row_tile // 2
    dev = np.where(live, nbr_h - center, 0)
    starts = np.zeros(n_t, np.int64)
    for t in range(n_t):
        sl = slice(t * row_tile, (t + 1) * row_tile)
        d = np.clip(dev[sl][live[sl]], -band, band)
        starts[t] = np.clip(t * row_tile + row_tile // 2 +
                            (int(d.mean()) if d.size else 0) - band // 2,
                            0, M - band)
    local = nbr_h - starts[tile.ravel()].reshape(-1, 1)
    in1 = live & (local >= 0) & (local < band)
    out1 = live & ~in1
    for band2 in (2048, 4096):
        for how in ("mean", "median"):
            cap = 0
            for t in range(n_t):
                sl = slice(t * row_tile, (t + 1) * row_tile)
                ob = nbr_h[sl][out1[sl]]
                if ob.size == 0:
                    continue
                c = int(np.mean(ob)) if how == "mean" else int(np.median(ob))
                s2 = np.clip(c - band2 // 2, 0, M - band2)
                cap += ((ob >= s2) & (ob < s2 + band2)).sum()
            print(f"band2={band2} {how}: {cap/out1.sum():.3f} "
                  f"-> residual {out1.sum()-cap}")


if __name__ == "__main__" and "--mean" in sys.argv:
    mean_variant()


def mode_variant():
    """Window-2 centered on the argmax COARSE-HISTOGRAM bin (device-cheap:
    segment_sum + argmax per tile), single and dual-window variants."""
    import jax.numpy as jnp

    import bench
    from geopurify_tpu.ops.knn import knn_self_grid
    from geopurify_tpu.ops.morton import hilbert_code

    M, K = 65536, 96
    band, row_tile = 12288, 2048
    batch = bench.build_scene(0, 2 * M, M, 1, 1024, (32, 48))
    coords, valid = batch.voxel_coords, batch.voxel_valid
    dists, nbr = knn_self_grid(coords, valid, k=K)
    code = np.asarray(hilbert_code(jnp.maximum(coords, 0)))
    order = np.argsort(code, kind="stable")
    rank = np.empty(M, np.int64)
    rank[order] = np.arange(M)
    nbr_h = rank[np.asarray(nbr)[order]]
    live = np.isfinite(np.asarray(dists))[order]
    rows = np.arange(M)[:, None]
    tile = rows // row_tile
    n_t = M // row_tile
    center = tile * row_tile + row_tile // 2
    dev = np.where(live, nbr_h - center, 0)
    starts = np.zeros(n_t, np.int64)
    for t in range(n_t):
        sl = slice(t * row_tile, (t + 1) * row_tile)
        d = np.clip(dev[sl][live[sl]], -band, band)
        starts[t] = np.clip(t * row_tile + row_tile // 2 +
                            (int(d.mean()) if d.size else 0) - band // 2,
                            0, M - band)
    local = nbr_h - starts[tile.ravel()].reshape(-1, 1)
    in1 = live & (local >= 0) & (local < band)
    out1 = live & ~in1
    for band2 in (2048, 4096):
        bw = band2 // 2
        n_bins = -(-M // bw)
        cap1 = cap2 = 0
        for t in range(n_t):
            sl = slice(t * row_tile, (t + 1) * row_tile)
            ob = nbr_h[sl][out1[sl]]
            if ob.size == 0:
                continue
            hist = np.bincount(ob // bw, minlength=n_bins)
            b1 = hist.argmax()
            s2 = np.clip(b1 * bw + bw // 2 - band2 // 2, 0, M - band2)
            in2 = (ob >= s2) & (ob < s2 + band2)
            cap1 += in2.sum()
            rest = ob[~in2]
            if rest.size:
                hist2 = np.bincount(rest // bw, minlength=n_bins)
                b2 = hist2.argmax()
                s3 = np.clip(b2 * bw + bw // 2 - band2 // 2, 0, M - band2)
                cap2 += ((rest >= s3) & (rest < s3 + band2)).sum()
        tot = out1.sum()
        print(f"band2={band2} mode: {cap1/tot:.3f} (resid {tot-cap1}); "
              f"+2nd window: {(cap1+cap2)/tot:.3f} (resid {tot-cap1-cap2})")


if __name__ == "__main__" and "--mode" in sys.argv:
    mode_variant()
