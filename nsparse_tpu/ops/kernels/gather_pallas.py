"""Windowed / banded gather kernels — the TPU substitute for random gather.

TPU vector units have no arbitrary-gather instruction, and XLA lowers
``x[idx]`` to a ~12-cycle-per-element scalar loop (measured ~0.13 G
gathers/s on v5e).  The VPU *can* rotate a vector register across lanes or
sublanes in one step (``pltpu.roll``, dynamic shift supported), which gives
two fast gather shapes:

- **windowed**: all of a tile's indices fall in a small window
  ``[base, base + W)`` -> roll-scan: for each shift s, rotate the window and
  select the lanes at distance s.  O(W) VPU steps per (8, 128) tile.
- **banded**: ``idx - position`` falls in a small band ``[base, base + D)``
  (quasi-diagonal access, the SELL/banded-matrix case) -> align the source
  by a *dynamic* flat roll, then scan only the D band offsets.  O(D) steps —
  independent of how far the tile strides through the source.

These are the TPU reincarnation of the reference's column segmentation
(16-bit in-segment indices keeping the x segment cache-resident,
``convert_amb.cu:313-346``): indices are rebased against a window/band so
the source stays register-resident and the gather becomes lane rotations.

All kernels read their tiles through scalar-prefetched BlockSpecs, so a
planner can route *subsets* of tiles to each kernel (the analog of the
reference's per-bin kernel dispatch, ``kernel_spgemm_hash_d.cu:1077-1185``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_ROWS = 8
TILE = TILE_ROWS * LANES  # 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# in-kernel building blocks
# ---------------------------------------------------------------------------


def _flat_align(blk, off):
    """y[q, l] = blk.flat[q * 128 + l + off] (row-major), off traced.

    ``blk`` is (R, 128); valid for q * 128 + l + off < R * 128 (the caller
    guarantees off + needed span fits).
    """
    r = blk.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1)
    l_off = off % LANES
    s_off = off // LANES
    a = pltpu.roll(blk, (LANES - l_off) % LANES, 1)   # a[q,l] = blk[q, (l+l_off)%128]
    b = pltpu.roll(a, (r - s_off) % r, 0)             # rows shifted by s_off
    c = pltpu.roll(a, (r - s_off - 1) % r, 0)         # rows shifted by s_off+1
    return jnp.where(lane < LANES - l_off, b, c)


def _flat_shift_static(aligned, s: int):
    """y[q, l] = aligned.flat[q * 128 + l + s] for static s in [0, 128]."""
    if s == 0:
        return aligned
    r = aligned.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, aligned.shape, 1)
    a = pltpu.roll(aligned, np.int32((LANES - s % LANES) % LANES), 1)
    if s % LANES == 0:
        a_next = pltpu.roll(aligned, np.int32(r - s // LANES), 0)
        return a_next
    b = pltpu.roll(a, np.int32((r - s // LANES) % r), 0)
    c = pltpu.roll(a, np.int32((r - s // LANES - 1) % r), 0)
    return jnp.where(lane < LANES - (s % LANES), b, c)


def _roll_scan_window(aligned, loc, window: int):
    """out[r, l] = aligned-window[loc[r, l]] with loc in [0, window).

    ``aligned`` is (R, 128) holding the window at flat offset 0.  Cost:
    O(window) rotate+select steps on (tile, 128) vregs.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, loc.shape, 1)
    sub = loc % LANES
    grp = loc // LANES
    acc = jnp.zeros(loc.shape, aligned.dtype)
    for g in range(window // LANES if window >= LANES else 1):
        wg = jnp.broadcast_to(aligned[g : g + 1, :], loc.shape)
        hit = grp == g if window > LANES else None
        for s in range(min(window, LANES)):
            ws = pltpu.roll(wg, np.int32(s), 1)
            sel = sub == ((lane - s) % LANES)
            if hit is not None:
                sel = sel & hit
            acc = acc + jnp.where(sel, ws, jnp.zeros_like(acc))
    return acc


def _band_scan(aligned, d, band: int, tile_rows: int = TILE_ROWS):
    """out[p] = aligned.flat[p_local + d[p]] with d in [0, band).

    ``aligned``: (R, 128) with R * 128 >= tile_rows * 128 + band; ``d``:
    (tile_rows, 128).  Cost: O(band) static shifts — independent of the
    stride covered.
    """
    acc = jnp.zeros(d.shape, aligned.dtype)
    for s in range(band):
        ys = _flat_shift_static(aligned, s)[:tile_rows]
        acc = acc + jnp.where(d == s, ys, jnp.zeros_like(acc))
    return acc


# ---------------------------------------------------------------------------
# pallas calls (tile subsets via scalar-prefetched ids)
# ---------------------------------------------------------------------------


def _src_specs(src_rows: int, n_src: int):
    """``n_src`` consecutive (src_rows, 128) source blocks starting at the
    block containing ``bases[i]``."""
    span = src_rows * LANES

    def mk(j):
        return pl.BlockSpec(
            (src_rows, LANES),
            lambda i, ids, bases, j=j: (bases[i] // span + j, 0),
            memory_space=pltpu.VMEM,
        )

    return [mk(j) for j in range(n_src)]


def _tile_spec(tile_rows: int):
    return pl.BlockSpec(
        (tile_rows, LANES), lambda i, ids, bases: (ids[i], 0),
        memory_space=pltpu.VMEM,
    )


def _subset_call(
    kern, n_tiles, src2, ids, bases, idx, other, out_alias,
    tile_rows: int, src_rows: int, n_src: int,
):
    """Run ``kern`` over the tile subset ``ids`` (ids in units of
    ``tile_rows``-row blocks), writing into ``out_alias`` (donated)."""
    in_specs = _src_specs(src_rows, n_src) + [_tile_spec(tile_rows)]
    args = [ids, bases] + [src2] * n_src + [idx]
    if other is not None:
        in_specs.append(_tile_spec(tile_rows))
        args.append(other)
    in_specs.append(_tile_spec(tile_rows))  # aliased output as input
    args.append(out_alias)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=_tile_spec(tile_rows),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_alias.shape, out_alias.dtype),
        input_output_aliases={len(args) - 1: 0},
        interpret=_interpret(),
    )(*args)


WIN_SUB = 8  # (8,128) subtiles per window supertile (one grid step)


def _make_window_kern(window: int, fused: bool, n_src: int, win_sub: int):
    """Window kernel over one supertile = ``win_sub`` subtiles, each with
    its own base and source blocks — batching amortizes the ~1us
    per-grid-step cost that dominates at (8,128) granularity.  (Interpret
    mode uses win_sub=1: the 8x-unrolled kernel jaxpr makes the HLO
    interpreter's recursive trace pathologically slow.)"""

    def kern(ids_r, bases_r, *rest):
        srcs, rest = rest[: n_src * win_sub], rest[n_src * win_sub:]
        if fused:
            idx_r, oth_r, alias_r, out_r = rest
        else:
            idx_r, alias_r, out_r = rest
            oth_r = None
        del alias_r
        i = pl.program_id(0)
        for k in range(win_sub):
            base = bases_r[i * win_sub + k]
            blk = jnp.concatenate(
                [srcs[n_src * k + j][:] for j in range(n_src)], axis=0
            )
            aligned = _flat_align(blk, base % (srcs[0].shape[0] * LANES))
            loc = idx_r[k * TILE_ROWS:(k + 1) * TILE_ROWS] - base
            g = _roll_scan_window(aligned, loc, window)
            # sentinel indices (idx == -1) contribute zero; without the
            # mask their negative loc aliases a shift through the % wrap
            g = jnp.where(loc >= 0, g, jnp.zeros_like(g))
            if oth_r is not None:
                g = oth_r[k * TILE_ROWS:(k + 1) * TILE_ROWS] * g
            out_r[k * TILE_ROWS:(k + 1) * TILE_ROWS] = g

    return kern


def _make_band_kern(band: int, fused: bool, n_src: int):
    def kern(ids_r, bases_r, *rest):
        srcs, rest = rest[:n_src], rest[n_src:]
        if fused:
            idx_r, oth_r, alias_r, out_r = rest
        else:
            idx_r, alias_r, out_r = rest
            oth_r = None
        del alias_r
        i = pl.program_id(0)
        base = bases_r[i]  # src flat index of band start for p_local = 0
        blk = jnp.concatenate([s[:] for s in srcs], axis=0)
        aligned = _flat_align(blk, base % (srcs[0].shape[0] * LANES))
        lane = jax.lax.broadcasted_iota(jnp.int32, idx_r.shape, 1)
        srow = jax.lax.broadcasted_iota(jnp.int32, idx_r.shape, 0)
        p_local = srow * LANES + lane
        d = idx_r[:] - base - p_local
        g = _band_scan(aligned, d, band, tile_rows=idx_r.shape[0])
        out_r[:] = g if oth_r is None else oth_r[:] * g

    return kern


def gather_subset_window(src2, ids, bases, idx, other, out, window: int):
    """Windowed gather over the supertile subset ``ids`` (units of
    WIN_SUB * 8 rows); ``bases`` holds one base per subtile; out donated.

    Source DMA per subtile: 2 x (16, 128) blocks — covers any 1024-wide
    window."""
    n_src = 2
    src_rows = 16
    span = src_rows * LANES
    win_sub = 1 if _interpret() else WIN_SUB
    if win_sub == 1 and WIN_SUB > 1:
        # expand supertile ids to subtile ids (bases are already per
        # subtile in matching order)
        ids = (
            ids[:, None] * WIN_SUB
            + jnp.arange(WIN_SUB, dtype=ids.dtype)[None, :]
        ).reshape(-1)
    kern = _make_window_kern(
        window, other is not None, n_src=n_src, win_sub=win_sub
    )
    block_rows = win_sub * TILE_ROWS

    def mk_src(k, j):
        return pl.BlockSpec(
            (src_rows, LANES),
            lambda i, ids, bases, k=k, j=j: (
                bases[i * win_sub + k] // span + j, 0),
            memory_space=pltpu.VMEM,
        )

    def big_tile():
        return pl.BlockSpec(
            (block_rows, LANES), lambda i, ids, bases: (ids[i], 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = [mk_src(k, j) for k in range(win_sub) for j in range(n_src)]
    in_specs.append(big_tile())  # idx
    args = [ids, bases] + [src2] * (n_src * win_sub) + [idx]
    if other is not None:
        in_specs.append(big_tile())
        args.append(other)
    in_specs.append(big_tile())  # aliased output as input
    args.append(out)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(int(ids.shape[0]),),
        in_specs=in_specs,
        out_specs=big_tile(),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out.shape, out.dtype),
        input_output_aliases={len(args) - 1: 0},
        interpret=_interpret(),
    )(*args)


BAND_TILE_ROWS = 128  # supertile rows for the banded class


def gather_subset_band(src2, ids, bases, idx, other, out, band: int):
    """Banded gather over the supertile subset ``ids``; out donated.

    Banded access tolerates coarse tiles (the span bound is on
    ``idx - position``), so supertiles amortize per-grid-step DMA setup.
    Source DMA: 4 x (64, 128) blocks = 32768 elements, covering
    base%8192 + 16384 + band."""
    kern = _make_band_kern(band, other is not None, n_src=4)
    return _subset_call(
        kern, int(ids.shape[0]), src2, ids, bases, idx, other, out,
        tile_rows=BAND_TILE_ROWS, src_rows=64, n_src=4,
    )


def gather_tiles8(
    src: jax.Array, tile_ids: jax.Array, n_out_tiles: int,
    tile_rows: int = 8,
) -> jax.Array:
    """out tile i = src tile ``tile_ids[i]`` — a tile-granular gather that
    moves 8 tiles per grid step (8 scalar-prefetch-indexed input blocks,
    one contiguous 8-tile output block), so it runs at DMA speed
    (~354 GB/s measured at 25M f32) instead of one grid step per tile.

    Used to reorder the piecewise expansion's class-compact output into
    arena order.  ``n_out_tiles`` must be a multiple of 8.
    """
    G = 8
    assert n_out_tiles % G == 0

    def kern(ids_r, *refs):
        del ids_r
        out_r = refs[G]
        for k in range(G):
            out_r[pl.ds(k * tile_rows, tile_rows), :] = refs[k][:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_out_tiles // G,),
        in_specs=[
            pl.BlockSpec(
                (tile_rows, LANES),
                (lambda i, ids, k=k: (ids[i * G + k], 0)),
                memory_space=pltpu.VMEM,
            )
            for k in range(G)
        ],
        out_specs=pl.BlockSpec(
            (G * tile_rows, LANES), lambda i, ids: (i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_out_tiles * tile_rows, LANES), src.dtype
        ),
        interpret=_interpret(),
    )(tile_ids, *([src] * G))


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
    if dst.dtype == jnp.float64:
        # tile-granular movement: two uint32 planes (see planes.py)
        from nsparse_tpu.ops.kernels import planes

        dlo, dhi = planes.split(dst)
        vlo, vhi = planes.split(vals.reshape(-1, LANES))
        return planes.combine(
            scatter_tiles(dlo, tile_ids, vlo, tile_rows),
            scatter_tiles(dhi, tile_ids, vhi, tile_rows),
        )

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


# ---------------------------------------------------------------------------
# standalone whole-array windowed gather (kept for tests / simple callers)
# ---------------------------------------------------------------------------


def _roll_gather_tile(win, idx, window: int):
    """out[r, l] = win[r, idx[r, l]] for one (TR, >=window) tile.

    ``window`` must be a divisor or a multiple of 128.  idx in [0, window).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1)
    acc = jnp.zeros(idx.shape, win.dtype)
    if window <= LANES:
        if window < LANES:
            wb = jnp.concatenate([win[:, :window]] * (LANES // window), axis=1)
        else:
            wb = win
        for s in range(window):
            ws = pltpu.roll(wb, np.int32(s), 1)
            acc = acc + jnp.where(
                (idx % window) == ((lane - s) % window), ws,
                jnp.zeros_like(acc),
            )
        return acc
    sub = idx % LANES
    grp = idx // LANES
    for g in range(window // LANES):
        wg = win[:, g * LANES : (g + 1) * LANES]
        hit = grp == g
        for s in range(LANES):
            ws = pltpu.roll(wg, np.int32(s), 1)
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
