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


def hilbert_code(coords: jax.Array, bits: int = 10) -> jax.Array:
    """3-D Hilbert index of non-negative int coords (clamped to ``bits``/axis).

    Skilling's transpose algorithm (public domain, "Programming the Hilbert
    curve", AIP 2004), vectorized over rows with a static loop over bit
    planes. Unlike Morton order, the Hilbert curve is CONTINUOUS — every
    consecutive pair of ranks is spatially adjacent — so fixed-size tiles of
    the sorted sequence have tightly bounded bounding boxes (no Morton seam
    teleports), which is what the tiled kNN's candidate pruning needs.
    """
    c = jnp.clip(coords, 0, (1 << bits) - 1).astype(jnp.int32)
    x0, x1, x2 = c[:, 0], c[:, 1], c[:, 2]

    # inverse undo: walk bit planes high to low
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for xi in range(3):
            x = (x0, x1, x2)[xi]
            has = (x & q) != 0
            # if bit set: invert low bits of x0; else swap low bits x0<->xi
            t = jnp.where(has, 0, (x0 ^ x) & p)
            x0 = jnp.where(has, x0 ^ p, x0 ^ t)
            if xi == 0:
                # swapping x0 with itself is a no-op; the branch above
                # already applied the invert when the bit was set
                continue
            x_new = x ^ t
            if xi == 1:
                x1 = x_new
            else:
                x2 = x_new
        q >>= 1

    # Gray encode
    x1 = x1 ^ x0
    x2 = x2 ^ x1
    t = jnp.zeros_like(x0)
    q = 1 << (bits - 1)
    while q > 1:
        t = jnp.where((x2 & q) != 0, t ^ (q - 1), t)
        q >>= 1
    x0, x1, x2 = x0 ^ t, x1 ^ t, x2 ^ t

    # interleave (transpose -> index): X[0]'s bit is the most significant
    # of each 3-bit group
    return (part1by2(x0) << 2) | (part1by2(x1) << 1) | part1by2(x2)
