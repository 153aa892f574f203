"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: int = -1,
    tp: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """(data, model) mesh; dp == -1 takes all remaining devices."""
    devs = np.array(devices if devices is not None else jax.devices())
    n = devs.size
    if dp == -1:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp == n, f"dp*tp = {dp * tp} != {n} devices"
    return Mesh(devs.reshape(dp, tp), (data_axis, model_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch/scene) axis across the data axis."""
    return NamedSharding(mesh, P(data_axis))


def shard_batch(tree, mesh: Mesh, data_axis: str = "data"):
    """Device-put a pytree with its leading axis sharded over `data`."""
    sh = data_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
