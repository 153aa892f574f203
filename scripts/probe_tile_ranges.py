#!/usr/bin/env python
"""Host-side probe: per-tile candidate global-id RANGES for knn_self_grid's
rel-packed keys at a given M on the driver bench scene family.

The rel-pack needs (max_cand_id - min_cand_id) < B per tile. B=65536 gives
8-bit d2 headroom (clamp 255); the maximum exact-f32 budget at radius 12 is
B = 2^24 // 146 = 114912 (clamp 145 > r2=144). Prints the range distribution
and the fraction of tiles exceeding each budget.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=262144)
    ap.add_argument("--radius", type=int, default=12)
    ap.add_argument("--tile", type=int, default=128)
    args = ap.parse_args()

    import bench
    from geopurify_tpu.ops.morton import hilbert_code

    M, T, r = args.m, args.tile, args.radius
    batch = bench.build_scene(0, 2 * M, M, 1, 1024, (32, 48))
    coords = np.asarray(batch.voxel_coords, np.int64)

    code = np.asarray(hilbert_code(np.maximum(coords, 0).astype(np.int32)))
    perm = np.argsort(code, kind="stable")
    n_t = M // T
    qs = perm[: n_t * T].reshape(n_t, T)

    # per-tile bbox candidates = rows with coords inside bbox+r. In lex order
    # the candidate ID RANGE is [first row with x >= lo_x, last row with
    # x <= hi_x] intersected with y/z constraints; min/max candidate id is
    # what rel-pack cares about. Exact per-tile scan is O(n_t * M) = 5e8 —
    # fine in numpy vectorized per tile over M bools? 2048 * 262144 = 5.4e8
    # bool ops per axis... do it chunked.
    lo = coords[qs].min(axis=1) - r   # [n_t, 3]
    hi = coords[qs].max(axis=1) + r
    ranges = np.zeros(n_t, np.int64)
    counts = np.zeros(n_t, np.int64)
    CH = 256
    for t0 in range(0, n_t, CH):
        t1 = min(t0 + CH, n_t)
        inb = np.ones((t1 - t0, M), bool)
        for ax in range(3):
            c = coords[:, ax][None, :]
            inb &= (c >= lo[t0:t1, ax][:, None]) & (c <= hi[t0:t1, ax][:, None])
        any_row = inb.any(axis=1)
        first = inb.argmax(axis=1)
        last = M - 1 - inb[:, ::-1].argmax(axis=1)
        ranges[t0:t1] = np.where(any_row, last - first, 0)
        counts[t0:t1] = inb.sum(axis=1)

    print(f"M={M} tiles={n_t} radius={r}")
    print(f"candidate count: mean {counts.mean():.0f} p50 "
          f"{np.percentile(counts, 50):.0f} p99 {np.percentile(counts, 99):.0f} "
          f"max {counts.max()}")
    for q in (50, 90, 99, 99.9):
        print(f"range p{q}: {np.percentile(ranges, q):.0f}")
    print(f"range max: {ranges.max()}")
    for B in (65536, 114912, 2**24 // 146):
        frac = (ranges >= B).mean()
        print(f"tiles with range >= {B}: {frac*100:.2f}% "
              f"({(ranges >= B).sum()} tiles, {(ranges >= B).sum() * T} queries)")


if __name__ == "__main__":
    main()
