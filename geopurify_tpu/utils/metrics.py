"""Segmentation metrics — histogram I/U/target with Base/Novel/All splits.

TPU-native equivalent of the reference's intersectionAndUnionGPU
(reference util/util.py:108-177) and the running Base/Novel/All
mIoU/mAcc/allAcc meters of run/validation.py:434-553. The histograms are plain
segment-sums so they jit, batch, and psum across a device mesh (the reference's
dist.all_reduce at run/validation.py:441-450).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("num_classes", "ignore_labels"))
def intersection_and_union(
    pred: jax.Array,                 # [N] int predicted class
    target: jax.Array,               # [N] int gt class
    valid: jax.Array,                # [N] bool padding mask
    num_classes: int,
    ignore_labels: Tuple[int, ...] = (),
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (intersection, union, target) histograms, each [num_classes]."""
    ignore = jnp.zeros_like(valid)
    for ig in ignore_labels:
        ignore = ignore | (target == ig)
    keep = valid & ~ignore
    sentinel = num_classes
    p = jnp.where(keep, pred, sentinel)
    t = jnp.where(keep, target, sentinel)
    inter = jnp.where(p == t, p, sentinel)

    def hist(x):
        return jax.ops.segment_sum(
            jnp.ones_like(x, jnp.float32), x, num_segments=num_classes + 1
        )[:num_classes]

    area_i = hist(inter)
    area_p = hist(p)
    area_t = hist(t)
    union = area_p + area_t - area_i
    return area_i, union, area_t


def psum_histograms(hists, axis_name: str):
    """Cross-device reduction of (I, U, T) — ≙ dist.all_reduce of the meters."""
    return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis_name), hists)


def allreduce_meter_across_hosts(meter: "SegMeter") -> "SegMeter":
    """Sum a SegMeter's I/U/T histograms over all JAX processes, in place.

    ≙ the reference's eval-time ``dist.all_reduce(I, U, T)``
    (reference run/validation.py:441-450). Each host evaluates its scene shard
    and the final summary must aggregate every shard; single-process runs are
    a no-op (no collective issued).
    """
    if jax.process_count() == 1:
        return meter
    from jax.experimental import multihost_utils

    stacked = jnp.asarray(
        np.stack([meter.intersection, meter.union, meter.target])
    )
    gathered = np.asarray(multihost_utils.process_allgather(stacked))
    total = gathered.sum(axis=0)  # [3, num_classes]
    meter.intersection, meter.union, meter.target = total[0], total[1], total[2]
    return meter


@dataclass
class SegMeter:
    """Accumulates per-class I/U/T and reports Base/Novel/All mIoU, mAcc, allAcc."""

    num_classes: int
    base_category: Sequence[int] = ()
    novel_category: Sequence[int] = ()
    # Non-structural classes (all minus wall/floor/ceiling) — the reference's
    # published f-mIoU/f-mAcc group (reference README.md:115-117,123).
    foreground_category: Sequence[int] = ()
    intersection: np.ndarray = None
    union: np.ndarray = None
    target: np.ndarray = None

    def __post_init__(self):
        self.intersection = np.zeros(self.num_classes)
        self.union = np.zeros(self.num_classes)
        self.target = np.zeros(self.num_classes)

    def update(self, inter, union, target):
        self.intersection += np.asarray(inter)
        self.union += np.asarray(union)
        self.target += np.asarray(target)

    def _group(self, idx: Optional[Sequence[int]] = None) -> Dict[str, float]:
        sel = np.arange(self.num_classes) if idx is None or len(idx) == 0 else np.array(idx)
        i, u, t = self.intersection[sel], self.union[sel], self.target[sel]
        iou = i / np.maximum(u, 1e-10)
        acc = i / np.maximum(t, 1e-10)
        return {
            "mIoU": float(iou.mean()),
            "mAcc": float(acc.mean()),
            "allAcc": float(i.sum() / max(t.sum(), 1e-10)),
        }

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {"all": self._group(None)}
        if len(self.base_category):
            out["base"] = self._group(self.base_category)
        if len(self.novel_category):
            out["novel"] = self._group(self.novel_category)
        if len(self.foreground_category):
            out["foreground"] = self._group(self.foreground_category)
        return out

    def per_class_iou(self) -> np.ndarray:
        return self.intersection / np.maximum(self.union, 1e-10)


class AverageMeter:
    """Running scalar average (util/util.py AverageMeter)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = self.sum = self.count = 0.0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)
