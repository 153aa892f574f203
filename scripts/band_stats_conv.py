#!/usr/bin/env python
"""Premise check for a banded sparse-conv: in Hilbert voxel order, what
fraction of the 27-stencil neighbor edges fall inside a [row_tile-windowed]
band of width B? (The kNN-96 graph needs band 12288 at M=65k; the 27-stencil
reaches only +-1 voxel so its window should be far tighter.)

Run CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/band_stats_conv.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax.numpy as jnp

    import bench
    from geopurify_tpu.ops.morton import hilbert_code
    from geopurify_tpu.ops.sparse_conv import build_neighbor_table

    M = 65536
    batch = bench.build_scene(0, 2 * M, M, 1, 1024, (32, 48))
    coords = batch.voxel_coords
    valid = batch.voxel_valid
    nbr = np.asarray(build_neighbor_table(coords, valid))      # [M, 27] lex order

    code = np.asarray(hilbert_code(jnp.maximum(coords, 0)))
    order = np.argsort(code, kind="stable")
    rank = np.empty(M, np.int64)
    rank[order] = np.arange(M)

    # neighbor table in hilbert order: row i' = rank[i], entries rank[nbr]
    nbr_pad = np.concatenate([rank, [M]])
    nbr_h = nbr_pad[nbr[order]]                                 # [M, 27]
    live = nbr_h < M
    print(f"edges: {live.sum()} of {live.size} ({live.mean():.3f} fill)")

    rows = np.arange(M)[:, None]
    for row_tile in (512, 2048):
        tile = rows // row_tile
        center = tile * row_tile + row_tile // 2
        dev = np.where(live, nbr_h - center, 0)
        # adaptive per-tile window center (outlier-clipped mean like pooling)
        t_dev = np.zeros(M // row_tile)
        for t in range(M // row_tile):
            sl = slice(t * row_tile, (t + 1) * row_tile)
            d = dev[sl][live[sl]]
            t_dev[t] = d.mean() if d.size else 0.0
        local = nbr_h - (center + t_dev[tile.ravel()].reshape(-1, 1).astype(int))
        for B in (256, 512, 1024, 2048, 4096):
            inb = live & (np.abs(local) <= B // 2)
            frac_out = 1 - inb.sum() / live.sum()
            print(f"row_tile={row_tile} band={B}: out-of-band "
                  f"{frac_out:.4f} ({(live & ~inb).sum()} edges)")


if __name__ == "__main__":
    main()
