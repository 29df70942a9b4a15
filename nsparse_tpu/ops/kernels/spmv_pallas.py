"""Pallas TPU kernel: BSR SpMV with scalar-prefetched block indirection.

The MXU-path analog of the reference's AMB SpMV kernel
(``kernel_spmv_amb_atomic``, ``cuda-c/src/kernel/kernel_spmv_amb.cu:22-96``):
where the reference's thread decodes a packed chunk descriptor and FMAs
``block_size`` values per 16-bit column load, the TPU kernel walks dense
(128, 128) tiles in block-row order.  ``block_col`` is a scalar-prefetch
operand driving the BlockSpec index maps, so the needed x rows are DMA'd by
the Pallas pipeline itself (no in-kernel gather); partial products
accumulate into a VMEM-resident output block (revisited across consecutive
grid steps), replacing the reference's atomicAdd scatter.

TPU block-shape rules forbid (1, 128) blocks, so the 128-wide x row and y
row live inside (8, 128) blocks: the x row is picked by an 8-way sublane
select, the y row is updated by a row-mask select — no dynamic stores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsparse_tpu.formats.bsr import BSR

PB = 128  # pallas path block edge


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(brow_r, bcol_r, data_r, x_r, y_r, acc_r):
    """Scratch accumulator (persists across grid steps) + write-through to
    the revisited output block — the canonical Pallas reduction idiom."""
    k = pl.program_id(0)
    row = brow_r[k]
    prev = brow_r[jnp.maximum(k - 1, 0)]
    new_group = jnp.logical_or(k == 0, (row // 8) != (prev // 8))

    # x row out of the (8, 128) x block via sublane select
    sub = bcol_r[k] % 8
    xrow = jnp.zeros((1, PB), x_r.dtype)
    for r in range(8):
        xrow = jnp.where(sub == r, x_r[r : r + 1, :], xrow)

    # (128, 128) @ (128, 1) -> this block-row's 128 partial sums
    part = jax.lax.dot_general(
        data_r[0], xrow.reshape(PB, 1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=y_r.dtype,
    ).reshape(1, PB)

    rsel = row % 8
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, PB), 0)

    @pl.when(new_group)
    def _():
        acc_r[:] = jnp.zeros_like(acc_r)

    acc_r[:] = jnp.where(rows8 == rsel, acc_r[:] + part, acc_r[:])
    y_r[:] = acc_r[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmv_bsr_pallas(a: BSR, x: jax.Array, interpret: bool | None = None) -> jax.Array:
    """y = A @ x via a flat grid over (128, 128) BSR tiles.

    Requires ``a.blocksize == (128, 128)`` (``BSR.from_csr(a, (128, 128))``).
    """
    br, bc = a.blocksize
    if (br, bc) != (PB, PB):
        raise ValueError(f"pallas BSR SpMV needs (128, 128) tiles, got {a.blocksize}")
    m, n = a.shape
    nbc = (n + bc - 1) // bc
    nbr = a.n_block_rows
    nbr8 = (nbr + 7) // 8 * 8
    xp = jnp.pad(x, (0, nbc * bc - n)).reshape(nbc, bc).astype(a.data.dtype)
    xp = jnp.pad(xp, ((0, (nbc + 7) // 8 * 8 - nbc), (0, 0)))

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
                (8, bc),
                lambda k, brow, bcol: (bcol[k] // 8, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, br),
            lambda k, brow, bcol: (brow[k] // 8, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((8, PB), a.data.dtype)],
    )

    y = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr8, br), a.data.dtype),
        interpret=_interpret() if interpret is None else interpret,
    )(a.block_row, a.block_col, a.data, xp)
    return y.reshape(-1)[:m]