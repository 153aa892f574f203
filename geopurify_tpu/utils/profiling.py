"""Profiling and per-stage timing.

The reference has no profiling hooks (SURVEY §5); here tracing is first-class:
- ``StageTimer``: lightweight named-stage wall-clock accumulator with
  blocking-on-device semantics (block_until_ready before stopping the clock),
  summary printing, and JSONL emission;
- ``trace``: context manager around jax.profiler for on-demand device traces
  (view in TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Any, Dict, Iterator, Optional


class StageTimer:
    """Accumulates wall time per named stage across steps."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on: Any = None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax

                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def observe(self, name: str, seconds: float) -> None:
        self.totals[name] += seconds
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_ms": round(1000 * self.totals[k] / max(self.counts[k], 1), 2),
            }
            for k in sorted(self.totals)
        }

    def report(self) -> str:
        lines = ["stage timing:"]
        for k, v in self.summary().items():
            lines.append(
                f"  {k:<28s} {v['total_s']:>9.2f}s total  {v['mean_ms']:>9.1f}ms/call  x{v['count']}"
            )
        return "\n".join(lines)

    def dump_jsonl(self, path: str, **extra) -> None:
        with open(path, "a") as f:
            f.write(json.dumps({"stages": self.summary(), **extra}) + "\n")


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler device trace; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# ---------------------------------------------------------------------------
# Per-stage achieved-FLOPs / bandwidth accounting (VERDICT r3 item #7)
# ---------------------------------------------------------------------------

# v5e (TPU v5 lite) per-chip peaks; override for other parts.
V5E_PEAK_TFLOPS_BF16 = 197.0
V5E_PEAK_HBM_GBPS = 819.0


def compiled_costs(jitted, *args, **kwargs) -> Optional[Dict[str, float]]:
    """(flops, bytes accessed) of a jitted callable at these args, from XLA's
    client-side HLO cost analysis. Uses the jit cache (lower+compile of
    already-compiled shapes is fast). Returns None when the backend exposes
    no analysis."""
    try:
        compiled = jitted.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        if not ca:
            return None
        return {
            "flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0)),
        }
    except Exception:  # noqa: BLE001 — accounting must never break the bench
        return None


def mfu_table(
    rows,                       # [(stage, wall_s, costs_or_None, n_calls)]
    peak_tflops: float = V5E_PEAK_TFLOPS_BF16,
    peak_gbps: float = V5E_PEAK_HBM_GBPS,
) -> str:
    """Render per-stage achieved TFLOP/s and GB/s vs chip peaks.

    ``costs`` is one call's {flops, bytes}; multiplied by n_calls and divided
    by the measured wall. The 'bytes accessed' figure is XLA's HLO-level
    estimate (HBM traffic assuming no fusion-internal re-reads) — treat the
    bandwidth column as a lower-bound estimate of achieved traffic."""
    lines = [
        f"{'stage':18s} {'wall_s':>8s} {'TFLOP/s':>9s} {'%peak':>6s} "
        f"{'GB/s':>8s} {'%BW':>6s}"
    ]
    for stage, wall, costs, n in rows:
        if costs is None or wall <= 0:
            lines.append(f"{stage:18s} {wall:8.3f} {'n/a':>9s} {'':>6s} {'':>8s}")
            continue
        tflops = costs["flops"] * n / wall / 1e12
        gbps = costs["bytes"] * n / wall / 1e9
        lines.append(
            f"{stage:18s} {wall:8.3f} {tflops:9.2f} {100*tflops/peak_tflops:5.1f}% "
            f"{gbps:8.1f} {100*gbps/peak_gbps:5.1f}%"
        )
    return "\n".join(lines)
