"""Checkpointing (orbax) + torch-checkpoint converters.

Save/restore covers what the reference persists (reference run/train.py:371-391,
215-263): student params + batch stats, optimizer state, epoch/step, plus the
RNG key. Orbax gives atomic writes and async-friendly restore; the retry loop
the reference hand-rolls (trainer/utils_trainer.py:125-140) is orbax-native.

Converters map released torch checkpoints into our flax pytrees:
- ``convert_student_checkpoint``: geopurify.pth MinkowskiEngine student
  (affinity_module.py:51-85) -> AffinityPredictor variables. ME convolution
  kernels are [K^3, Cin, Cout] like ours, modulo kernel-offset enumeration
  order (ME enumerates x-fastest; ours is x-slowest) — handled by an index
  permutation.
- ``convert_xdecoder_checkpoint``: xdecoder_focall_last.pt -> XDecoderSegModel
  variables (NCHW conv kernels -> HWIO, in-proj qkv splits, naming map).
"""

from __future__ import annotations

import itertools
import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Orbax save/restore
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state: Dict[str, Any], step: int, keep: int = 3):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))


def save_checkpoint_with_retry(
    path: str, state: Dict[str, Any], step: int, keep: int = 3,
    attempts: int = 3, sleep_s: float = 30.0,
    _save=None,
) -> int:
    """``save_checkpoint`` with the reference's 3-attempt retry loop
    (trainer/utils_trainer.py:125-140: transient filesystem/NFS failures are
    retried after a sleep rather than killing a long run). Returns the number
    of attempts used; raises the last error once exhausted. ``_save`` is the
    failure-injection seam used by tests."""
    import time as _time

    save = _save or save_checkpoint
    last = None
    for attempt in range(1, attempts + 1):
        try:
            save(path, state, step, keep=keep)
            return attempt
        except Exception as e:  # noqa: BLE001 — mirrors the reference's broad catch
            last = e
            import logging

            logging.getLogger("geopurify.checkpoint").warning(
                "checkpoint save attempt %d/%d failed: %s", attempt, attempts, e
            )
            if attempt < attempts:
                _time.sleep(sleep_s)
    raise last


def restore_checkpoint(path: str, template: Dict[str, Any], step: Optional[int] = None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            return None, None
        state = mgr.restore(step, args=ocp.args.StandardRestore(template))
    return state, step


# ---------------------------------------------------------------------------
# Torch -> flax converters
# ---------------------------------------------------------------------------

def _me_offset_permutation() -> np.ndarray:
    """perm[j] = our-order index of ME's j-th kernel offset.

    Ours: itertools.product over (dx, dy, dz) with dx slowest (ops/sparse_conv
    kernel_offsets_3d). MinkowskiEngine enumerates hypercube offsets with the
    FIRST axis fastest.
    """
    r = (-1, 0, 1)
    ours = {off: i for i, off in enumerate(itertools.product(r, r, r))}
    me_order = [(dx, dy, dz) for dz in r for dy in r for dx in r]
    return np.array([ours[o] for o in me_order])


def convert_student_checkpoint(state_dict: Dict[str, "np.ndarray"]) -> Dict[str, Any]:
    """Map a torch (MinkowskiEngine) AffinityPredictor state_dict into flax
    variables {'params': ..., 'batch_stats': ...}.

    Torch names (affinity_module.py:51-85):
      input_layer.0.kernel / input_layer.1.{weight,bias,running_mean,running_var}
      res_blocks.{i}.conv{1,2}.kernel, res_blocks.{i}.norm{1,2}.*
      output_layer.kernel (+ bias terms where present)
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    perm = _me_offset_permutation()
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv3(src: str, dst: str):
        k = sd[f"{src}.kernel"]
        entry = {"kernel": jnp.asarray(k[perm])}
        if f"{src}.bias" in sd:
            entry["bias"] = jnp.asarray(sd[f"{src}.bias"])
        else:
            entry["bias"] = jnp.zeros((k.shape[-1],), jnp.float32)
        params[dst] = entry

    def bn(src: str, dst: str):
        # ME.MinkowskiBatchNorm wraps torch BatchNorm1d under `.bn`
        pre = f"{src}.bn" if f"{src}.bn.weight" in sd else src
        params[dst] = {
            "scale": jnp.asarray(sd[f"{pre}.weight"]),
            "bias": jnp.asarray(sd[f"{pre}.bias"]),
        }
        stats[dst] = {
            "mean": jnp.asarray(sd[f"{pre}.running_mean"]),
            "var": jnp.asarray(sd[f"{pre}.running_var"]),
        }

    conv3("input_layer.0", "input_conv")
    bn("input_layer.1", "input_norm")
    i = 0
    while f"res_blocks.{i}.conv1.kernel" in sd:
        conv3(f"res_blocks.{i}.conv1", f"res{i}_conv1")
        bn(f"res_blocks.{i}.norm1", f"res{i}_norm1")
        conv3(f"res_blocks.{i}.conv2", f"res{i}_conv2")
        bn(f"res_blocks.{i}.norm2", f"res{i}_norm2")
        i += 1
    # 1x1x1 output conv: ME kernel is [Cin, Cout] already
    k = sd["output_layer.kernel"]
    params["output_conv"] = {
        "kernel": jnp.asarray(k if k.ndim == 2 else k[0]),
        "bias": jnp.asarray(
            sd.get("output_layer.bias", np.zeros(k.shape[-1], np.float32))
        ),
    }
    # re-nest res block params under flax module names
    nested: Dict[str, Any] = {}
    for key, val in params.items():
        m = re.match(r"res(\d+)_(conv\d|norm\d)", key)
        if m:
            nested.setdefault(f"res{m.group(1)}", {})[m.group(2)] = val
        else:
            nested[key] = val
    nested_stats: Dict[str, Any] = {}
    for key, val in stats.items():
        m = re.match(r"res(\d+)_(norm\d)", key)
        if m:
            nested_stats.setdefault(f"res{m.group(1)}", {})[m.group(2)] = val
        else:
            nested_stats[key] = val
    return {"params": nested, "batch_stats": nested_stats}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint on CPU into numpy arrays (no torch tensors leak)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in obj.items()}
