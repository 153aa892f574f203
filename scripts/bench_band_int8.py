#!/usr/bin/env python
"""A/B the banded smoothing core's S storage dtype: bf16 vs int8.

The 19-round banded matmul is S-READ-BANDWIDTH bound (ROADMAP: ~1.6 GB
re-read per round at the driver spec; widening the band LOSES for exactly
this reason), so halving S's bytes should ~2x the core — IF XLA fuses the
int8->bf16 dequant into the dot's operand read instead of materializing a
bf16 copy of S in HBM (which would triple traffic). This measures:

  bf16   S bf16 (the shipped iterate_pooling_banded core)
  i8row  S int8 with per-row scale d: round = d * (S8 @ F)   (exact refactor
         of (D S8) @ F — quantization error only from the int8 rounding)
  i8i8   S int8 AND F requantized to int8 per round (s8 x s8 -> s32 native
         MXU; per-tensor F scale) — compounding error, measured not assumed

Reports ms/round and, on a small synthetic graph, the max rel error +
argmax agreement vs the f32 gather reference after 19 rounds.

Timing rule (CLAUDE.md): force int(jnp.sum(out)) per trial.
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
    float(jnp.sum(out))
    ts = []
    for _ in range(trials):
        t0 = time.time()
        out = fn(*args)
        float(jnp.sum(out))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=65536)
    ap.add_argument("--band", type=int, default=12288)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=19)
    ap.add_argument("--row-tile", type=int, default=2048)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp

    from geopurify_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    M, band, C, rt = args.m, args.band, args.channels, args.row_tile
    n_t = M // rt
    rng = np.random.default_rng(0)

    # synthetic sharpened-softmax-like rows: ~96 live entries per row, peaked
    S = np.zeros((M, band), np.float32)
    live = rng.integers(0, band, size=(M, 96))
    logits = rng.normal(size=(M, 96)) * 4.0
    w = np.exp(logits - logits.max(axis=1, keepdims=True))
    w /= w.sum(axis=1, keepdims=True)
    np.put_along_axis(S, live, w.astype(np.float32), axis=1)
    starts = np.clip(
        np.arange(n_t, dtype=np.int32) * rt + rt // 2 - band // 2,
        0, max(M - band, 0),
    )
    F = rng.normal(size=(M, C)).astype(np.float32) * 10.0

    win_idx = jnp.minimum(
        jnp.asarray(starts)[:, None] + jnp.arange(band, dtype=jnp.int32)[None],
        M - 1,
    )

    Sb = jnp.asarray(S, jnp.bfloat16).reshape(n_t, rt, band)
    d_row = jnp.asarray(np.maximum(S.max(axis=1), 1e-12) / 127.0)
    S8 = jnp.asarray(
        np.clip(np.rint(S / np.maximum(S.max(axis=1, keepdims=True), 1e-12)
                        * 127.0), 0, 127).astype(np.int8)
    ).reshape(n_t, rt, band)
    d3 = d_row.reshape(n_t, rt, 1).astype(jnp.float32)

    # ALL large arrays ride as jit ARGUMENTS (closure capture bakes them as
    # compile-time constants — 1.6 GB of constant folding through the tunnel;
    # CLAUDE.md environment rule).
    def rounds_bf16(f, Sb, win_idx, d3):
        def body(_, f):
            fw = f.astype(jnp.bfloat16)[win_idx]
            out = jnp.einsum("trb,tbc->trc", Sb, fw,
                             preferred_element_type=jnp.float32)
            return out.reshape(M, C).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, args.rounds, body, f.astype(jnp.bfloat16))

    def rounds_i8row(f, S8, win_idx, d3):
        def body(_, f):
            fw = f.astype(jnp.bfloat16)[win_idx]
            out = jnp.einsum("trb,tbc->trc", S8.astype(jnp.bfloat16), fw,
                             preferred_element_type=jnp.float32)
            return (out * d3).reshape(M, C).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, args.rounds, body, f.astype(jnp.bfloat16))

    def rounds_i8i8(f, S8, win_idx, d3):
        def body(_, f):
            fs = jnp.maximum(jnp.max(jnp.abs(f)), 1e-12) / 127.0
            f8 = jnp.clip(jnp.rint(f / fs), -127, 127).astype(jnp.int8)
            fw = f8[win_idx]
            out = jnp.einsum("trb,tbc->trc", S8, fw,
                             preferred_element_type=jnp.int32)
            return (out.astype(jnp.float32) * (d3 * fs)).reshape(M, C)
        return jax.lax.fori_loop(0, args.rounds, body, f.astype(jnp.float32))

    fj = jnp.asarray(F)
    for name, fn, Sop in (("bf16", rounds_bf16, Sb),
                          ("i8row", rounds_i8row, S8),
                          ("i8i8", rounds_i8i8, S8)):
        jf = jax.jit(fn)
        t = t_sync(jf, fj, Sop, win_idx, d3)
        print(f"{name:6s} {args.rounds} rounds: {t*1000:8.1f} ms "
              f"({t/args.rounds*1000:6.2f} ms/round)")

    # accuracy probe: square small operator, exact f32 reference vs the
    # per-row-dequantized int8 operator iterated the same number of rounds
    Ms = min(4096, M, band)
    Ss = S[:Ms, :Ms].copy()
    Fs = F[:Ms]
    q = np.clip(np.rint(Ss / np.maximum(Ss.max(axis=1, keepdims=True), 1e-12)
                        * 127), 0, 127)
    dq = (q * (np.maximum(Ss.max(axis=1, keepdims=True), 1e-12) / 127.0))
    out_q = Fs.copy()
    out_r = Fs.copy()
    for _ in range(args.rounds):
        out_q = dq @ out_q
        out_r = Ss @ out_r
    rel = np.abs(out_q - out_r).max() / max(np.abs(out_r).max(), 1e-12)
    agree = (out_q.argmax(1) == out_r.argmax(1)).mean()
    print(f"i8row quantization after {args.rounds} rounds (M={Ms} probe): "
          f"max rel {rel:.2e}, argmax agreement {agree*100:.2f}%")


if __name__ == "__main__":
    main()
