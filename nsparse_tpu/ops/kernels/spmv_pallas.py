"""Pallas TPU kernel: BSR SpMV with scalar-prefetched block indirection.

The MXU-path analog of the reference's AMB SpMV kernel
(``kernel_spmv_amb_atomic``, ``cuda-c/src/kernel/kernel_spmv_amb.cu:22-96``):
where the reference's thread decodes a packed chunk descriptor and FMAs
``block_size`` values per 16-bit column load, the TPU kernel walks dense
``(br, bc)`` tiles in block-row order.  ``block_col`` is a scalar-prefetch
operand driving the BlockSpec index map, so the needed x tile is DMA'd by
the Pallas pipeline itself (no in-kernel gather); partial products
accumulate in the output block, which Pallas keeps resident in VMEM while
consecutive grid steps map to the same output index (the sorted-by-row tile
order guarantees that), replacing the reference's atomicAdd scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsparse_tpu.formats.bsr import BSR


def _kernel(block_row_ref, block_col_ref, data_ref, x_ref, y_ref):
    k = pl.program_id(0)
    nblocks = pl.num_programs(0)

    row = block_row_ref[k]
    prev_row = block_row_ref[jnp.maximum(k - 1, 0)]
    is_first = (k == 0) | (row != prev_row)

    # (br, bc) @ (bc,) as a broadcast-FMA + lane reduction (VPU) — for the
    # (8, 128) default a matvec is too skinny for the MXU; wider tiles hit
    # the MXU via jnp.dot in the multi-vector spmm kernel.
    part = jnp.sum(data_ref[0] * x_ref[0][None, :], axis=1)

    @pl.when(is_first)
    def _():
        y_ref[0] = part

    @pl.when(jnp.logical_not(is_first))
    def _():
        y_ref[0] = y_ref[0] + part


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmv_bsr_pallas(a: BSR, x: jax.Array, interpret: bool = False) -> jax.Array:
    """y = A @ x on the TPU via a flat grid over BSR tiles."""
    br, bc = a.blocksize
    m, n = a.shape
    nbc = (n + bc - 1) // bc
    nbr = a.n_block_rows
    xp = jnp.pad(x, (0, nbc * bc - n)).reshape(nbc, bc).astype(a.data.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block_row, block_col
        grid=(a.nblocks,),
        in_specs=[
            pl.BlockSpec(
                (1, br, bc),
                lambda k, brow, bcol: (k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bc),
                lambda k, brow, bcol: (bcol[k], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, br),
            lambda k, brow, bcol: (brow[k], 0),
            memory_space=pltpu.VMEM,
        ),
    )

    y = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr, br), a.data.dtype),
        interpret=interpret,
    )(a.block_row, a.block_col, a.data, xp)
    return y.reshape(-1)[:m]
