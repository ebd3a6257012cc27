"""Batched counting sweep: two y-columns per grid step.

The halo sweep's dominant cost at tuned grid shapes is per-grid-step
overhead (~30 µs of DMA issue per swept column, measured via the
grid-shape sweep in docs/design.md). Processing two adjacent y-columns per
step halves the step count and shares their overlapping 3×4 neighborhood
(12 lane-column DMAs for two centers instead of 2×9) — same dense tile
tests, ~30-40% less sweep overhead. Count-only; the fill path keeps the
per-tile bookkeeping kernels.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import _HALF_OFFSETS


def _make_kernel(grid_dim, cell_capacity):
    M = cell_capacity
    Gz = grid_dim

    def kernel(*refs):
        centers = refs[:2]
        cols = refs[2:14]  # lane-oriented, (dx, dy) in row-major 3x4
        total_ref = refs[14]
        cursor = refs[15]

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            cursor[0] = 0

        def tile_test(a, b):
            mask = None
            for c in range(3):
                m = (a[:, 4 + c:5 + c] > b[c:c + 1, :]) & (
                    a[:, c:c + 1] < b[4 + c:5 + c, :]
                )
                mask = m if mask is None else (mask & m)
            return mask

        rows_m = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
        cols_m = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
        tri = cols_m > rows_m

        def process_cell(z, acc):
            for k in range(2):
                center = centers[k]
                a = center[0, 0, z + 1]
                self_col = cols[1 * 4 + (k + 1)]  # (dx=0, dy=0) for center k
                mask = tile_test(a, self_col[0, 0, z + 1]) & tri
                acc = acc + jnp.sum(mask, dtype=jnp.int32)
                for (dx, dy, dz) in _HALF_OFFSETS:
                    b_col = cols[(dx + 1) * 4 + (dy + k + 1)]
                    mask = tile_test(a, b_col[0, 0, z + 1 + dz])
                    acc = acc + jnp.sum(mask, dtype=jnp.int32)
            return acc

        acc = jax.lax.fori_loop(0, Gz, process_cell, jnp.int32(0))
        cursor[0] = cursor[0] + acc

        @pl.when(step == pl.num_programs(0) - 1)
        def _finish():
            total_ref[0] = cursor[0]

    return kernel


@partial(jax.jit, static_argnames=("grid_dim", "cell_capacity", "interpret"))
def batched_count(bins, grid_dim, cell_capacity, interpret=False):
    """Total pair count from padded bins, two y-columns per step."""
    M = cell_capacity
    assert grid_dim % 2 == 0, "grid_dim must be even for y-batching"
    Gp = grid_dim + 2
    kernel = _make_kernel(grid_dim, cell_capacity)
    bins_lane = jnp.swapaxes(bins, -1, -2)
    gy2 = grid_dim // 2

    def center_spec(k):
        return pl.BlockSpec(
            (1, 1, Gp, M, 8),
            lambda s, k=k: (s // gy2 + 1, (s % gy2) * 2 + 1 + k, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def col_spec(dx, dy):
        return pl.BlockSpec(
            (1, 1, Gp, 8, M),
            lambda s, dx=dx, dy=dy: (s // gy2 + dx, (s % gy2) * 2 + dy,
                                     0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = [center_spec(0), center_spec(1)] + [
        col_spec(dx, dy) for dx in (0, 1, 2) for dy in (0, 1, 2, 3)
    ]

    out = pl.pallas_call(
        kernel,
        grid=(grid_dim * gy2,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((1,), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(bins, bins, *([bins_lane] * 12))
    return out[0][0]
