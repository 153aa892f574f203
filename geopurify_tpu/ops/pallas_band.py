"""Pallas banded-window matmul — the 19x smoothing core as one TPU kernel.

The banded operator's apply is ``out[tile] = S[tile] @ F[ws : ws+band]``
(ops/pooling.py iterate_pooling_banded, ≙ reference affinity_module.py's
19x ``sparse.mm`` at dataset/data_loader_ablation.py:214-231). The XLA path
materializes the window gather ``FW = F[win_idx]`` as an [n_t, band, C]
HBM transient every round (write + re-read), and its einsum streams S at
~200-300 GB/s effective. This kernel removes the transient entirely: each
tile's F window is DMA'd straight into a double-buffered VMEM scratch
(prefetched one tile ahead, overlapping the previous tile's matmuls) while
S streams through the normal Pallas block pipeline — per round the only
HBM traffic is S once (bandwidth floor) + one window read per tile.

Shapes/limits:
  - S [Mp, band] (row-padded to row_tile), starts [n_t] i32, F [M, C];
    start + band <= M for every tile AND start % 8 == 0 — Mosaic requires
    the dynamic HBM row offset provably divisible by the sublane tiling
    (build_banded_operator clips and quantizes accordingly).
  - VMEM: 2*row_sub*band (S double buffer) + 2*band*C (window double
    buffer), both in S.dtype — the caller gates on this fitting ~13 MB
    (logit-space C=128 fits at band 12288; feature-space C=512 does not
    and keeps the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# v5e VMEM is ~16 MB/core; leave headroom for the out block + spills.
VMEM_BUDGET_BYTES = 13 * 1024 * 1024


def vmem_bytes(band: int, channels: int, row_sub: int, itemsize: int) -> int:
    """VMEM footprint of the kernel's resident buffers (gate on this)."""
    return (2 * row_sub * band + 2 * band * channels) * itemsize


def _kernel(starts_ref, s_ref, f_ref, o_ref, win_ref, sems, *, band):
    i = pl.program_id(0)   # tile (shares one window start)
    j = pl.program_id(1)   # row sub-block within the tile
    n_t = pl.num_programs(0)

    def win_dma(t, slot):
        # Mosaic must PROVE the dynamic HBM row offset divisible by the
        # sublane tiling (8) — build_banded_operator quantizes starts to
        # multiples of 8 and the annotation carries that fact here.
        start = pl.multiple_of(starts_ref[t], 8)
        return pltpu.make_async_copy(
            f_ref.at[pl.ds(start, band)],
            win_ref.at[slot],
            sems.at[slot],
        )

    @pl.when(j == 0)
    def _prefetch():
        @pl.when(i == 0)
        def _():
            win_dma(0, 0).start()

        @pl.when(i + 1 < n_t)
        def _():
            win_dma(i + 1, (i + 1) % 2).start()

        win_dma(i, i % 2).wait()

    o_ref[:] = jax.lax.dot_general(
        s_ref[:], win_ref[i % 2],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit, static_argnames=("band", "row_tile", "row_sub", "interpret")
)
def banded_window_matmul(
    S: jax.Array,        # [Mp, band] compute dtype (bf16), row-padded
    starts: jax.Array,   # [n_t] i32 window starts, start + band <= M
    f: jax.Array,        # [M, C] same dtype as S
    *,
    band: int,
    row_tile: int = 2048,
    row_sub: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Per-tile windowed matmul: out[Mp, C] f32, rows past M are zero."""
    Mp = S.shape[0]
    M, C = f.shape
    assert Mp % row_tile == 0 and row_tile % row_sub == 0
    n_t = Mp // row_tile
    n_sub = row_tile // row_sub

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_t, n_sub),
        in_specs=[
            pl.BlockSpec(
                (row_sub, band), lambda i, j, starts: (i * n_sub + j, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),      # F stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (row_sub, C), lambda i, j, starts: (i * n_sub + j, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, band, C), S.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, band=band),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, C), jnp.float32),
        interpret=interpret,
    )(starts.astype(jnp.int32), S, f)
