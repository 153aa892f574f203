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
    else:
        P, V, Pv, C = 131072, 8, 16384, 512
    n_cls = 19
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((V, Pv, C)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((V, Pv, n_cls)).astype(np.float32))
    ids = jnp.asarray(
        np.stack([rng.choice(P, Pv, replace=False) for _ in range(V)]).astype(np.int32)
    )
    valid = jnp.ones((V, Pv), bool)

    f = jax.jit(partial(fuse_views, num_points=P, top_k=3))
    t = t_sync(f, feats, logits, ids, valid, trials=args.trials)
    print(f"fuse_views P={P} V={V} Pv={Pv}: {t*1e3:7.1f}ms")

    # ---- prefix stages (mirrors fuse_views internals) ----
    from functools import partial as _p

    from geopurify_tpu.ops.segment import segment_sum

    n_cls2 = logits.shape[-1]

    @_p(jax.jit, static_argnames=("stage",))
    def staged(feats, logits, ids_, valid, stage):
        flat_ids = jnp.where(valid, ids_, P).reshape(-1)
        sum_logits = segment_sum(
            logits.reshape(-1, n_cls2).astype(jnp.float32), flat_ids, P)
        count = segment_sum(
            valid.reshape(-1, 1).astype(jnp.float32), flat_ids, P)[:, 0]
        consensus = jnp.argmax(
            sum_logits / jnp.maximum(count, 1.0)[:, None], axis=-1)
        if stage == "segsum":
            return consensus.astype(jnp.float32) + count
        k = 3
        ts0 = jnp.full((P + 1, k), -jnp.inf)
        tp0 = jnp.zeros((P + 1, k), jnp.int32)
        cpad = jnp.concatenate([consensus, jnp.zeros((1,), consensus.dtype)])
        sb = jnp.arange(Pv, dtype=jnp.int32)

        def merge(carry, v):
            ts, tp = carry
            idv = jnp.where(valid[v], ids_[v], P + 1)
            agree = logits[v][jnp.arange(Pv), cpad[jnp.minimum(idv, P)]]
            agree = jnp.where(valid[v], agree, -jnp.inf)
            cat_s = jnp.concatenate([ts[idv], agree[:, None]], axis=1)
            cat_p = jnp.concatenate([tp[idv], (v * Pv + sb)[:, None]], axis=1)
            ns, arg = jax.lax.top_k(cat_s, k)
            np_ = jnp.take_along_axis(cat_p, arg, axis=1)
            ts = ts.at[idv].set(ns, mode="drop", unique_indices=True)
            tp = tp.at[idv].set(np_, mode="drop", unique_indices=True)
            return (ts, tp), None

        (tsc, tpc), _ = jax.lax.scan(merge, (ts0, tp0), jnp.arange(V))
        if stage == "scan":
            return jnp.sum(tpc.astype(jnp.float32)) + jnp.sum(
                jnp.where(jnp.isfinite(tsc), tsc, 0.0))
        return tsc[:P].sum() + tpc[:P].sum()

    for st in ("segsum", "scan"):
        t = t_sync(_p(staged, stage=st), feats, logits, ids, valid,
                   trials=args.trials)
        print(f"  prefix {st:7s}: {t*1e3:7.1f}ms")


if __name__ == "__main__":
    main()
