"""Fused Pallas halo kernel: grid-stencil pair counting + emission.

One kernel replaces the whole XLA stencil + compaction chain of grid.py:
the grid is swept in (x, y) steps; each step DMAs the 3×3 neighborhood of
z-columns into VMEM (9 columns × (grid_dim+2) cells), runs the 14-offset
dense tile tests for all z cells of the column, and extracts hits with a
short scalar loop per hit — reading both sphere ids directly from the bin
lanes and writing (id_a, id_b) through an SMEM cursor, ascending-index
deterministic. This is the TPU analog of the reference's traverse kernel
with its atomic pair cursor (collision.cl:174-226): same contract (true
count even past capacity; only ``capacity`` pairs materialized), no atomics,
no divergence, traffic ≈ 9× the bin bytes + O(hits).

The dedup rule matches grid.py: 13 lexicographically-positive offsets visit
each unordered cell pair once; the self offset uses the upper triangle.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import _HALF_OFFSETS

#: Value filling unused pair slots.
NO_PAIR = np.uint32(0xFFFFFFFF)


def _make_kernel(grid_dim, cell_capacity, capacity, count_only):
    M = cell_capacity
    Gz = grid_dim

    def kernel(*refs):
        # refs: 9 column refs [(dx,dy) in row-major 3x3 of the 1-cell halo],
        # then outputs, then scratch (cursor smem, mask vmem, rowmax vmem).
        cols = refs[:9]
        if count_only:
            total_ref = refs[9]
            cursor = refs[10]
            pairs_ref = None
        else:
            pairs_ref, total_ref = refs[9], refs[10]
            cursor = refs[11]

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            cursor[0] = 0  # write cursor (capped at capacity)
            cursor[1] = 0  # true running count
            if pairs_ref is not None:
                pairs_ref[:] = jnp.full(pairs_ref.shape, NO_PAIR, jnp.uint32)

        center = cols[4]  # (dx, dy) == (1, 1)

        def load(col, z):
            return col[0, 0, z]

        def tile_test(a, b):
            # a, b: [M, 8] float rows; strict overlap mask [M, M] bool.
            alo = jnp.expand_dims(a[:, 0:3], 1)   # [M, 1, 3]
            ahi = jnp.expand_dims(a[:, 4:7], 1)
            blo = jnp.expand_dims(b[:, 0:3], 0)   # [1, M, 3]
            bhi = jnp.expand_dims(b[:, 4:7], 0)
            return jnp.all((ahi > blo) & (alo < bhi), axis=-1)

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)

        def emit(a_col, za, b_col, zb, mask):
            """Record all set (i, j) of mask as id pairs.

            Mosaic forbids scalar stores to VMEM, so the mask lives in
            vector registers as the loop carry, bits are cleared with
            one-hot selects, and each pair lands as a (1, 2) dynamic-slice
            row store.
            """
            cnt = jnp.sum(mask, dtype=jnp.int32)

            @pl.when(cnt > 0)
            def _extract():
                def body(_, m):
                    row_max = jnp.max(m, axis=1)
                    i = jnp.argmax(row_max.reshape(1, M), axis=1)[0]
                    sel_row = jnp.sum(
                        jnp.where(rows_i == i, m, 0.0), axis=0
                    )
                    j = jnp.argmax(sel_row.reshape(1, M), axis=1)[0]
                    c = cursor[0]

                    @pl.when(c < capacity)
                    def _store():
                        # All-vector path (Mosaic bitcast requires vectors):
                        # [1, 8] row slices -> id lanes -> [1, 2] bitcast.
                        rowa = a_col[0, 0, za, pl.ds(i, 1), :]
                        rowb = b_col[0, 0, zb, pl.ds(j, 1), :]
                        ids2 = jnp.concatenate(
                            [rowa[:, 3:4], rowb[:, 3:4]], axis=1
                        )
                        pairs_ref[pl.ds(c, 1), :] = (
                            jax.lax.bitcast_convert_type(ids2, jnp.uint32)
                        )

                    cursor[0] = c + 1
                    return jnp.where((rows_i == i) & (cols_i == j), 0.0, m)

                jax.lax.fori_loop(0, cnt, body, mask.astype(jnp.float32))

            cursor[1] = cursor[1] + cnt

        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
            > jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
        )

        def process_cell(z, acc):
            a = load(center, z + 1)
            mask = tile_test(a, a) & tri
            if count_only:
                acc = acc + jnp.sum(mask, dtype=jnp.int32)
            else:
                emit(center, z + 1, center, z + 1, mask)
            for (dx, dy, dz) in _HALF_OFFSETS:
                b_col = cols[(dx + 1) * 3 + (dy + 1)]
                b = load(b_col, z + 1 + dz)
                mask = tile_test(a, b)
                if count_only:
                    acc = acc + jnp.sum(mask, dtype=jnp.int32)
                else:
                    emit(center, z + 1, b_col, z + 1 + dz, mask)
            return acc

        acc = jax.lax.fori_loop(0, Gz, process_cell, jnp.int32(0))
        if count_only:
            cursor[1] = cursor[1] + acc

        @pl.when(step == pl.num_programs(0) - 1)
        def _finish():
            total_ref[0] = cursor[1]

    return kernel


@partial(jax.jit, static_argnames=(
    "grid_dim", "cell_capacity", "capacity", "interpret"))
def halo_pairs(bins, grid_dim, cell_capacity, capacity, interpret=False):
    """Count (and emit, if capacity > 0) colliding pairs from padded bins.

    Args:
      bins: [grid_dim+2]³ padded bin tensor from grid.build_grid (f32).
      capacity: 0 = count-only; else pair-buffer capacity (pairs live in
        VMEM during the sweep — keep capacity ≲ 1M).

    Returns:
      (pairs uint32[capacity, 2] or None, total int32) — total is the true
      pair count even when it exceeds capacity.
    """
    M = cell_capacity
    count_only = capacity == 0
    kernel = _make_kernel(grid_dim, cell_capacity, max(capacity, 1),
                          count_only)

    grid = (grid_dim * grid_dim,)

    def col_spec(dx, dy):
        def index_map(s):
            gx = s // grid_dim
            gy = s % grid_dim
            return (gx + dx, gy + dy, 0, 0, 0)

        return pl.BlockSpec(
            (1, 1, grid_dim + 2, M, 8), index_map,
            memory_space=pltpu.VMEM,
        )

    in_specs = [col_spec(dx, dy) for dx in (0, 1, 2) for dy in (0, 1, 2)]

    scratch_shapes = [
        pltpu.SMEM((2,), jnp.int32),
    ]

    if count_only:
        out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        out_shape = [jax.ShapeDtypeStruct((1,), jnp.int32)]
    else:
        out_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((capacity, 2), jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*([bins] * 9))

    if count_only:
        return None, out[0][0]
    return out[0], out[1][0]
