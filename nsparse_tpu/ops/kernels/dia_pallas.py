"""Fused Pallas DIA SpMV: one pass over the diagonals, static shifts.

The XLA path (``ops/spmv.py::spmv_dia``) materializes a padded x and one
shifted slice per diagonal — ~2x the minimum HBM traffic plus per-op
overhead.  This kernel streams row blocks once: each grid step loads the
(ndiag, TR, 128) value block plus three consecutive x row-blocks (the
sliding window: BlockSpec indices are block-granular, so overlap comes from
neighbors), then computes ``y += vals[d] * shift(x, off_d)`` with *static*
lane/sublane rotations per diagonal — offsets are format constants, so each
shift is two rolls and a select.

Applicable while ``max|offset| < TR * 128`` (neighbor blocks suffice);
``spmv_dia`` falls back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_ROWS = 512  # 65536 rows of y per grid step


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _flat_shift(arr, s: int):
    """y[q, l] = arr.flat[q * 128 + l + s] for static s >= 0 (row-major)."""
    if s == 0:
        return arr
    r = arr.shape[0]
    lane_part = s % LANES
    row_part = s // LANES
    if lane_part == 0:
        return pltpu.roll(arr, np.int32(r - row_part), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1)
    a = pltpu.roll(arr, np.int32(LANES - lane_part), 1)
    b = pltpu.roll(a, np.int32((r - row_part) % r), 0)
    c = pltpu.roll(a, np.int32((r - row_part - 1) % r), 0)
    return jnp.where(lane < LANES - lane_part, b, c)


def _kern(x_prev, x_mid, x_next, vals_ref, out_ref, *, offsets, tr):
    xw = jnp.concatenate([x_prev[:], x_mid[:], x_next[:]], axis=0)
    acc = jnp.zeros((tr, LANES), out_ref.dtype)
    base = tr * LANES  # x_mid starts at flat offset base within xw
    for d, off in enumerate(offsets):
        xs = _flat_shift(xw, base + off)[:tr]
        acc = acc + vals_ref[d] * xs
    out_ref[:] = acc


def spmv_dia_pallas(vals: jax.Array, offsets, x: jax.Array, m: int):
    """y = A @ x for DIA arrays; vals (ndiag, Mp), offsets static tuple.

    Requires max|offset| < TILE_ROWS * 128 and a square-ish layout where
    x can be padded to Mp + one tile on each side.
    """
    ndiag, mp = vals.shape
    tr = TILE_ROWS
    while tr * LANES > mp and tr > 8:
        tr //= 2
    span = tr * LANES
    assert all(abs(o) < span for o in offsets), (offsets, span)
    n_tiles = mp // span if mp % span == 0 else mp // span + 1
    mp_pad = n_tiles * span

    # x laid out with one guard tile on each side; padded region is zero
    xp = jnp.zeros(mp_pad + 2 * span, x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(vals.dtype), (span,))
    x2 = xp.reshape(-1, LANES)
    vals_p = jnp.pad(vals, ((0, 0), (0, mp_pad - mp))).reshape(
        ndiag, -1, LANES
    )

    trows = span // LANES
    out = pl.pallas_call(
        functools.partial(_kern, offsets=tuple(offsets), tr=trows),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((trows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((trows, LANES), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((trows, LANES), lambda i: (i + 2, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ndiag, trows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((trows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp_pad // LANES, LANES), vals.dtype),
        interpret=_interpret(),
    )(x2, x2, x2, vals_p)
    return out.reshape(-1)[:m]
