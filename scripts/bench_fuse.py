#!/usr/bin/env python
"""Cross-view consensus fusion (models/lift.fuse_views) in isolation.

At preset scale (V=32, Pv=65536, P=2^20) the fuse/fill stage measured 1.68 s;
this decomposes how much is the scan-based fusion itself vs the fills, and
gives the A/B harness for any fusion restructuring.
"""

from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", action="store_true")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from geopurify_tpu.models.lift import fuse_views

    if args.preset:
        P, V, Pv, C = 2 ** 20, 32, 2 ** 16, 512
        sdtype = jnp.bfloat16
    else:
        P, V, Pv, C = 131072, 8, 16384, 512
        sdtype = jnp.float32
    n_cls = 19
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((V, Pv, C)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((V, Pv, n_cls)).astype(np.float32))
    ids = jnp.asarray(
        np.stack([rng.choice(P, Pv, replace=False) for _ in range(V)]).astype(np.int32)
    )
    valid = jnp.ones((V, Pv), bool)

    f = jax.jit(partial(fuse_views, num_points=P, top_k=3, storage_dtype=sdtype))
    t = t_sync(f, feats, logits, ids, valid, trials=args.trials)
    print(f"fuse_views P={P} V={V} Pv={Pv} dtype={sdtype.__name__}: {t*1e3:7.1f}ms")


if __name__ == "__main__":
    main()
