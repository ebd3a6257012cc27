"""Pallas streaming compaction: indices of set elements of a huge mask.

The missing TPU primitive. XLA's scatter/gather cost is proportional to the
*operand* size (measured ~5 ms per million elements on v5e — two orders of
magnitude off HBM bandwidth), which makes "collect the few set positions of
a big mask" — the heart of every pair-emission step — catastrophically slow
in pure XLA. This kernel restores the right cost model:

  stream the mask through VMEM at DMA bandwidth
  + a short vector-select loop per *hit* (first-set row/lane via masked
    min-reductions; Mosaic forbids scalar VMEM stores and integer argmax)

so compaction costs (mask bytes / bandwidth) + O(hits), the same shape as
the reference's atomic-cursor emission (collision.cl:203-214) but
deterministic: hits are recorded in ascending index order.

This plays the role the reference's hand-rolled scan.cl/radix.cl machinery
played for OpenCL — the one hand-written device kernel the platform doesn't
give you — and everything sparse (grid pair emission, cluster-pair lists,
frontier traversal) composes on top.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Sentinel filling unused output slots.
NO_INDEX = np.uint32(0xFFFFFFFF)

#: Rows × lanes per streamed grid block (i32 mask: 256 KB per block).
_BLOCK_ROWS = 512
_LANES = 128
_BLOCK = _BLOCK_ROWS * _LANES

#: Rows per extraction sub-tile: per-hit masked reductions run over one
#: [8, 128] vreg instead of the whole streamed block — dense hit patterns
#: (e.g. segment boundaries, ~3% density) were reduction-bound otherwise.
_SUB_ROWS = 8
_SUB = _SUB_ROWS * _LANES

_BIG = np.int32(2 ** 30)


def _compact_kernel(mask_ref, out_ref, total_ref, cursor):
    """One grid step: extract set positions of a [_BLOCK_ROWS, 128] block."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        cursor[0] = 0
        cursor[1] = 0  # running true count (may exceed capacity)
        out_ref[:] = jnp.full(out_ref.shape, NO_INDEX, jnp.uint32)

    capacity = out_ref.shape[0]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (_SUB_ROWS, _LANES), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (_SUB_ROWS, _LANES), 1)

    def sub_block(t, total):
        off = pl.multiple_of(t * _SUB_ROWS, _SUB_ROWS)
        m0 = mask_ref[pl.ds(off, _SUB_ROWS), :]
        cnt = jnp.sum(m0, dtype=jnp.int32)

        @pl.when(cnt > 0)
        def _extract():
            base = step * _BLOCK + t * _SUB

            def body(_, m):
                # First set element in row-major order via min-reduces.
                i = jnp.min(jnp.where(m > 0, row_i, _BIG))
                in_row = (row_i == i) & (m > 0)
                j = jnp.min(jnp.where(in_row, lane_i, _BIG))
                c = cursor[0]

                @pl.when(c < capacity)
                def _store():
                    flat = (
                        jnp.full((1, 1), base, jnp.int32) + i * _LANES + j
                    )
                    out_ref[pl.ds(c, 1), :] = jax.lax.bitcast_convert_type(
                        flat, jnp.uint32
                    )

                cursor[0] = c + 1
                return jnp.where((row_i == i) & (lane_i == j), 0, m)

            jax.lax.fori_loop(0, cnt, body, m0)

        return total + cnt

    total = jax.lax.fori_loop(
        0, _BLOCK_ROWS // _SUB_ROWS, sub_block, jnp.int32(0)
    )
    cursor[1] = cursor[1] + total

    @pl.when(step == pl.num_programs(0) - 1)
    def _finish():
        total_ref[0] = cursor[1]


@partial(jax.jit, static_argnames=("capacity", "interpret"))
def compact_mask(mask, capacity, interpret=False):
    """Indices of set elements of ``mask``, in ascending order.

    Args:
      mask: flat bool/int array; nonzero = set. Padded internally to a
        block multiple.
      capacity: static output capacity. Like the reference's overflow
        contract, the returned count is the TRUE number of set elements
        even when it exceeds capacity; only the first ``capacity`` indices
        are materialized.
      interpret: run in the Pallas interpreter (CPU testing).

    Returns:
      (indices uint32[capacity] — unused slots hold NO_INDEX,
       count int32 scalar).
    """
    mask = jnp.asarray(mask)
    n = mask.shape[0]
    padded = -(-n // _BLOCK) * _BLOCK
    m = jnp.zeros((padded,), jnp.int32).at[:n].set(mask.astype(jnp.int32))
    m = m.reshape(padded // _LANES, _LANES)

    grid = padded // _BLOCK
    out, total = pl.pallas_call(
        _compact_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((capacity, 1), jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
        ],
        interpret=interpret,
    )(m)
    return out[:, 0], total[0]
