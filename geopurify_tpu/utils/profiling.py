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
