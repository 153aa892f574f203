#!/usr/bin/env python
"""A/B the Pallas banded-window matmul vs the XLA einsum gather core.

Runs the bare core (one round repeated N times via fori_loop, matching the
smoothing loop's structure) at the driver spec (M=65536, band=12288) and
preset spec (M=262144, band=6144), logit-space C=128 bf16.

Timing rule (CLAUDE.md): force int(jnp.sum(out)) per trial.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=65536)
    ap.add_argument("--band", type=int, default=12288)
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=19)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--row-sub", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from geopurify_tpu.ops.pallas_band import banded_window_matmul

    M, band, C = args.m, args.band, args.c
    row_tile = 2048
    n_t = M // row_tile
    rng = np.random.default_rng(0)
    S = jnp.asarray(rng.normal(size=(M, band)).astype(np.float32),
                    jnp.bfloat16)
    starts = jnp.asarray(
        np.clip(np.arange(n_t) * row_tile + row_tile // 2 - band // 2,
                0, M - band).astype(np.int32))
    f0 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def pallas_loop(f):
        def rnd(_, x):
            return banded_window_matmul(
                S, starts, x, band=band, row_tile=row_tile,
                row_sub=args.row_sub,
            ).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, args.rounds, rnd, f)

    win_idx = starts[:, None] + jnp.arange(band, dtype=jnp.int32)[None]
    S3 = S.reshape(n_t, row_tile, band)

    @jax.jit
    def xla_loop(f):
        def rnd(_, x):
            FW = x[win_idx]
            return jnp.einsum(
                "trb,tbc->trc", S3, FW, preferred_element_type=jnp.float32
            ).reshape(M, C).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, args.rounds, rnd, f)

    for name, fn in [("pallas", pallas_loop), ("xla", xla_loop)]:
        out = fn(f0)
        _ = int(jnp.sum(out.astype(jnp.float32)))  # warm + force
        ts = []
        for _ in range(args.trials):
            t0 = time.time()
            out = fn(f0)
            _ = int(jnp.sum(out.astype(jnp.float32)))
            ts.append(time.time() - t0)
        gb = (M * band * 2 * args.rounds) / 1e9
        print(f"{name:8s} {min(ts):.4f}s  (S-stream {gb / min(ts):.0f} GB/s)")

    # exactness: pallas vs xla single round
    a = banded_window_matmul(S, starts, f0, band=band, row_tile=row_tile,
                             row_sub=args.row_sub)
    b = jnp.einsum("trb,tbc->trc", S3, f0[win_idx],
                   preferred_element_type=jnp.float32).reshape(M, C)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"max abs diff single round: {err:.3e}")


if __name__ == "__main__":
    main()
