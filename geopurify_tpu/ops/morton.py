"""Morton (z-order) codes for integer voxel coordinates.

Shared by the Sonata teacher's serialized attention (models/sonata.py) and the
spatially-tiled kNN (ops/knn.py): Morton order groups spatially-near voxels
into near ranks, so fixed-size tiles of the sorted sequence are compact boxes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def part1by2(x: jax.Array) -> jax.Array:
    """Spread the low 10 bits of x so there are 2 zero bits between each."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton_code(coords: jax.Array, order: int = 0) -> jax.Array:
    """30-bit Morton code of non-negative int coords (clamped to 10 bits/axis).

    ``order`` selects the axis permutation: 0 = (x,y,z), 1 = (y,x,z) — the
    z / z-trans serialization pair PTv3 alternates between blocks.
    """
    c = jnp.clip(coords, 0, (1 << 10) - 1).astype(jnp.int32)
    if order == 1:
        c = c[:, jnp.array([1, 0, 2])]
    return (
        part1by2(c[:, 0])
        | (part1by2(c[:, 1]) << 1)
        | (part1by2(c[:, 2]) << 2)
    )
