"""Windowed gather kernels — the TPU substitute for random gather.

TPU vector units have no arbitrary-gather instruction, and XLA lowers
``x[idx]`` to a ~12-cycle-per-element scalar loop (measured ~0.13 G
gathers/s on v5e).  But the VPU *can* rotate a vector register across lanes
in one step (``pltpu.roll``), so a gather whose indices fall inside a small
window can be computed as a **roll-scan**: for each shift s, rotate the
window and select the lanes whose index distance equals s.  Cost is
O(window) VPU steps per (rows, 128) tile — measured 2.5 G gathers/s for a
128-wide window and 4.6 G/s for a 32-wide one (20-35x over XLA's gather).

This is the TPU reincarnation of the reference's column segmentation: AMB
compresses column indices to 16-bit offsets within a segment so the x
segment stays cache-resident (``convert_amb.cu:313-346``); here indices are
compressed to a window so the x window stays *register*-resident and the
gather becomes lane rotations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roll_gather_tile(win, idx, window: int):
    """out[r, l] = win[r, idx[r, l]] for one (TR, >=window) tile.

    ``window`` must be a divisor or a multiple of 128.  idx in [0, window).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1)
    acc = jnp.zeros(idx.shape, win.dtype)
    if window <= LANES:
        if window < LANES:
            # period-`window` broadcast across the 128 lanes
            wb = jnp.concatenate([win[:, :window]] * (LANES // window), axis=1)
        else:
            wb = win
        for s in range(window):
            ws = pltpu.roll(wb, s, 1)  # ws[:, i] = wb[:, (i - s) % 128]
            acc = acc + jnp.where(
                (idx % window) == ((lane - s) % window), ws,
                jnp.zeros_like(acc),
            )
        return acc
    # window = K * 128: scan each 128-lane group of the window
    sub = idx % LANES
    grp = idx // LANES
    for g in range(window // LANES):
        wg = win[:, g * LANES : (g + 1) * LANES]
        hit = grp == g
        for s in range(LANES):
            ws = pltpu.roll(wg, s, 1)
            acc = acc + jnp.where(
                hit & (sub == ((lane - s) % LANES)), ws,
                jnp.zeros_like(acc),
            )
    return acc


def _roll_gather_groups(rows, idx):
    """out[r, l] = rows[idx[r, l] // 128][r, (idx % 128)[r, l]].

    ``rows`` is a list of (TR, 128) group windows (each typically a
    broadcast row vector); avoids lane-axis concatenation, which Mosaic
    cannot relayout.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1)
    sub = idx % LANES
    grp = idx // LANES
    acc = jnp.zeros(idx.shape, rows[0].dtype)
    for g, wg in enumerate(rows):
        hit = grp == g
        for s in range(LANES):
            ws = pltpu.roll(wg, s, 1)
            acc = acc + jnp.where(
                hit & (sub == ((lane - s) % LANES)), ws,
                jnp.zeros_like(acc),
            )
    return acc


def _gather_kernel(win_ref, idx_ref, out_ref, *, window: int):
    out_ref[:] = _roll_gather_tile(win_ref[:], idx_ref[:], window)


def windowed_gather(
    win: jax.Array, idx: jax.Array, window: int, tile_rows: int = 256
) -> jax.Array:
    """out[t, l] = win[t, idx[t, l]], with idx[t, l] < window.

    ``win``: (T, max(window, 128)) per-row windows; ``idx``: (T, 128).
    ``window`` must be a divisor or a multiple of 128.
    """
    t, l = idx.shape
    assert l == LANES, idx.shape
    tr = min(tile_rows, t)
    assert t % tr == 0
    wl = win.shape[1]
    return pl.pallas_call(
        functools.partial(_gather_kernel, window=window),
        grid=(t // tr,),
        in_specs=[
            pl.BlockSpec((tr, wl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tr, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, LANES), win.dtype),
        interpret=_interpret(),
    )(win, idx)


def gather_from_flat(
    src: jax.Array,
    base: jax.Array,
    idx: jax.Array,
    window: int,
    tile_rows: int = 8,
    other: jax.Array | None = None,
) -> jax.Array:
    """out[t, l] = src[idx[t, l]] (optionally * other[t, l]).

    ``src`` is a flat padded array in HBM.  Each grid tile covers
    ``tile_rows`` rows of ``idx`` and DMAs the ``window``-wide slice of
    ``src`` starting at ``base[tile]`` (scalar-prefetched BlockSpec index),
    then roll-scans inside the VMEM-resident window.

    Requirements: ``window`` in {128, 256, ..., 1024}; ``base[t]`` a
    multiple of 128; ``base[t] <= idx[tile t] < base[t] + window``;
    ``len(src) >= max(base) + 2048`` and a multiple of 1024.

    The DMA granularity is two (8, 128) source blocks (TPU block specs
    cannot start at arbitrary sublanes), so the kernel first selects the
    ``window // 128`` sublane rows starting at the base's sublane offset,
    then roll-scans the window.
    """
    t, l = idx.shape
    assert l == LANES and window % LANES == 0 and window <= 1024
    n_tiles = t // tile_rows
    assert n_tiles * tile_rows == t
    src2 = src.reshape(-1, LANES)
    wrows = window // LANES

    def kern(base_r, srca_r, srcb_r, idx_r, *rest):
        if other is not None:
            oth_r, out_r = rest
        else:
            (out_r,) = rest
        i = pl.program_id(0)
        sub = (base_r[i] // LANES) % 8
        rows = []
        for j in range(wrows):
            row = jnp.zeros((1, LANES), srca_r.dtype)
            for r in range(8):
                cand = (
                    srca_r[r + j : r + j + 1, :]
                    if r + j < 8
                    else srcb_r[r + j - 8 : r + j - 7, :]
                )
                row = jnp.where(sub == r, cand, row)
            rows.append(jnp.broadcast_to(row, (tile_rows, LANES)))
        loc = idx_r[:] - base_r[i]
        g = _roll_gather_groups(rows, loc)
        out_r[:] = g if other is None else oth_r[:] * g

    in_specs = [
        pl.BlockSpec(
            (8, LANES),
            lambda i, base: (base[i] // 1024, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (8, LANES),
            lambda i, base: (base[i] // 1024 + 1, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (tile_rows, LANES), lambda i, base: (i, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [base, src2, src2, idx]
    if other is not None:
        in_specs.append(
            pl.BlockSpec(
                (tile_rows, LANES), lambda i, base: (i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(other)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile_rows, LANES), lambda i, base: (i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, LANES), src.dtype),
        interpret=_interpret(),
    )(*args)


def scatter_tiles(
    dst: jax.Array, tile_ids: jax.Array, vals: jax.Array, tile_rows: int = 8
) -> jax.Array:
    """dst[tile_ids[i]*tile_rows : +tile_rows, :] = vals[i] (in place).

    Tile-granular scatter via a scalar-prefetched output index map — used to
    patch fallback-tile results into a windowed-gather output.  ``dst`` is
    donated (input_output_aliases); returns the updated array.
    """
    n = int(tile_ids.shape[0])
    if n == 0:
        return dst

    def kern(ids_r, vals_r, dst_in_r, dst_out_r):
        del ids_r, dst_in_r
        dst_out_r[:] = vals_r[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(
                (tile_rows, LANES), lambda i, ids: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_rows, LANES), lambda i, ids: (ids[i], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_rows, LANES), lambda i, ids: (ids[i], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(dst.shape, dst.dtype),
        input_output_aliases={2: 0},
        interpret=_interpret(),
    )(tile_ids, vals.reshape(-1, LANES), dst)
