"""Optimizer + LR schedule for Stage-1.

Reproduces the reference's optimization recipe (reference run/train.py:190-198,
318-325): AdamW with three differential-LR parameter groups (input adapter
x0.1, middle res blocks x1, output projection x5 — affinity_module.py:70-85)
under a linear-warmup (2 epochs) + cosine-annealing schedule, expressed as one
optax.multi_transform over a labeled parameter pytree.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax

from geopurify_tpu.config import TrainConfig
from geopurify_tpu.models.student import param_group_label


def label_params(params: Any) -> Any:
    """Pytree of 'input' | 'middle' | 'output' labels, same structure as params."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    labels = [param_group_label(path) for path, _ in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], labels)


def make_schedule(cfg: TrainConfig, steps_per_epoch: int) -> optax.Schedule:
    warmup = cfg.warmup_epochs * steps_per_epoch
    total = cfg.epochs * steps_per_epoch
    cosine = optax.cosine_decay_schedule(cfg.lr_3d, max(total - warmup, 1))
    if warmup <= 0:
        return cosine
    return optax.join_schedules(
        [optax.linear_schedule(cfg.lr_3d * 0.01, cfg.lr_3d, warmup), cosine],
        [warmup],
    )


def make_optimizer(cfg: TrainConfig, params: Any, steps_per_epoch: int):
    base = make_schedule(cfg, steps_per_epoch)
    mults = {
        "input": cfg.lr_input_mult,
        "middle": cfg.lr_middle_mult,
        "output": cfg.lr_output_mult,
    }

    def group(mult: float):
        return optax.adamw(
            learning_rate=lambda s: base(s) * mult,
            weight_decay=cfg.weight_decay,
        )

    tx = optax.multi_transform(
        {k: group(m) for k, m in mults.items()}, label_params(params)
    )
    if cfg.grad_clip:
        # clip by the GLOBAL norm across all parameter groups (inside
        # multi_transform each group would be clipped by its own norm)
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    if getattr(cfg, "grad_accum_steps", 1) > 1:
        # ≙ the X-Decoder trainer's gradient accumulation
        # (reference trainer/default_trainer.py:116-167)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx, base
