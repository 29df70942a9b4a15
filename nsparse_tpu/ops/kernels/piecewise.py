"""Piecewise-run product expansion: A-entry-major SpGEMM streams.

In A-entry-major ("aem") product order the two SpGEMM value streams are
*piecewise trivial*: between run boundaries, the B factor is a contiguous
slice of ``b.val`` (one B row, slope-1 indices) and the A factor is one
constant ``a.val`` entry.  A run boundary occurs once per (A entry, B row)
pair, so tiles of 1024 products typically contain only a handful of runs
(R-MAT 14 x 8: 62% of products sit in tiles with <= 8 runs, 99.3% with
<= 32).  The kernel therefore forms ``a.val[e] * b.val[start:stop]``
products with ~J * 10 VPU instructions per 1024 outputs, where J is the
per-tile piece budget — 3-30x cheaper than the roll-scan windowed gathers
(win128 = 0.42 instr/element, win1024 = 1.9 measured) that a
B-major fill + slab-order A gather needs.

The B value table lives whole in VMEM (sparse matrices' value arrays are
small: nnz * 4 bytes); pieces are read by dynamic sublane slices + a flat
align, never by per-element gathers.  Per-piece A values arrive as an SMEM
stream computed per numeric call (the re-run API keeps the descriptors).

Role analog: the reference's per-warp expansion loop in the hash numeric
kernel (cuda-c/src/kernel/kernel_spgemm_hash_template.cu:769-815) streams
(a_val, b_row) pairs from global memory; here the same streaming is
expressed as plan-routed piece descriptors so the VPU only does aligned
block moves.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsparse_tpu.ops.kernels.gather_pallas import (
    LANES,
    TILE,
    TILE_ROWS,
    _flat_align,
    scatter_tiles,
)

from nsparse_tpu.tune.kernelgen import kernel_config as _kernel_config
from nsparse_tpu.tune.kernelgen import plan_chip as _plan_chip

_CFG = _kernel_config(_plan_chip())

SUB = 8                      # subtiles per grid step (grid-step amortization)
SUPER = SUB * TILE           # products per supertile
J_CLASSES = _CFG.pw_j_classes           # per-subtile piece budgets
BIAS = 2048                  # zero rows prepended to the B table (neg offsets)
SRC_ROWS = 16                # sublane rows per piece slice (1024 + align span)
BANK_K = _CFG.bank_k         # pre-rolled bank copies (8-aligned mode)
BANK_ROWS_MAX = _CFG.bank_rows_max      # bank cap: 13/16 of kernel VMEM


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PiecewisePlan:
    """Routing for the aem product expansion ``out[p] = a.val[ae(p)] *
    b.val[bp(p)]`` (zero beyond ``n``).

    Attributes:
      ids: per class, (n_groups * SUB,) int32 arena-subtile ids, grouped
        SUB per grid step (-1 = group pad: inert descriptors, zero tile).
      cuts: per class, (n_groups * SUB * J,) int32 — piece start positions
        within each subtile (TILE sentinel = inert piece).
      boffs: per class, flat B-table offsets biased so that the in-kernel
        source index is ``boff + local_pos`` (>= 0 by the BIAS rows).
      aidx: per class, (n_super * SUB * J,) int32 a.val indices per piece
        (index nnz_a = the zero pad slot).
      fb_ids: subtiles routed to the XLA fallback (run-dense tiles).
      fb_bidx / fb_aidx: (n_fb * TILE,) element-level indices for them
        (-1 = zero slot).
      n: true product count; n_pad: padded length (multiple of SUPER).
      nnz_a / nnz_b: value-array sizes the plan was built for.
      apv_gp: FlatGatherPlan over the concatenation of all classes' aidx
        (monotone -> cheap band/window classes) producing the per-piece A
        values in one planned gather; apv_splits: per-class slice bounds.
    """

    ids: Tuple
    cuts: Tuple
    boffs: Tuple
    aidx: Tuple
    apv_gp: object
    fb_ids: jax.Array
    fb_bidx: jax.Array
    fb_aidx: jax.Array
    b8_gp: object  # aligned mode: planned gather b.val -> 8-aligned table
    arena_src: jax.Array  # (n_pad/TILE,) compact tile per arena tile
    n: int = dataclasses.field(metadata=dict(static=True))
    n_pad: int = dataclasses.field(metadata=dict(static=True))
    nnz_a: int = dataclasses.field(metadata=dict(static=True))
    nnz_b: int = dataclasses.field(metadata=dict(static=True))
    apv_splits: Tuple = dataclasses.field(
        default=(), metadata=dict(static=True)
    )
    aligned: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    bank_rows: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )

    @property
    def class_fracs(self):
        t = max(self.n_pad // TILE, 1)
        out = {}
        for j, i in zip(J_CLASSES, self.ids):
            out[f"pw{j}"] = int((np.asarray(i) >= 0).sum()) / t
        out["fallback"] = int(self.fb_ids.shape[0]) / t
        return out


def build_piecewise_plan(
    run_start: np.ndarray,
    run_boff: np.ndarray,
    run_aidx: np.ndarray,
    n: int,
    nnz_a: int,
    nnz_b: int,
    b8_idx: np.ndarray | None = None,
) -> PiecewisePlan:
    """Host-side: route runs into per-supertile piece descriptors.

    ``run_start``: ascending product positions where a new (A entry, B row)
    run begins (run 0 starts at 0); ``run_boff``: table index of each run's
    first product; ``run_aidx``: a.val index of the run's A entry.  The
    products cover [0, n); [n, n_pad) is the zero-pad pool (routed as one
    synthetic run against the zero slots).

    Aligned-bank mode (``b8_idx`` given): run_start and run_boff are both
    multiples of 8, ``b8_idx`` maps 8-aligned table slots to b.val indices
    (-1 = structural zero), and ``nnz_b`` is the aligned table length.  The
    device then reads each piece as a pure dynamic sublane slice from a
    BANK_K-way pre-rolled table bank — ~1.4 cycles per piece measured,
    vs ~25 for the dynamic lane-roll align (lane rolls cost ~8 cycles per
    vreg on this VPU; sublane slices are free).
    """
    from nsparse_tpu.ops.kernels.flat_gather import build_flat_gather_plan

    import os as _os
    import time as _time

    _t0 = [_time.time()]

    def _tick(stage):
        if _os.environ.get("NSPARSE_WIN_TIMING"):
            now = _time.time()
            print(f"[pwplan] {stage}: {now - _t0[0]:.2f}s", flush=True)
            _t0[0] = now

    run_start = np.asarray(run_start, dtype=np.int64)
    run_boff = np.asarray(run_boff, dtype=np.int64)
    run_aidx = np.asarray(run_aidx, dtype=np.int64)
    n_pad = _round_up(max(n, 1), SUPER)

    aligned = b8_idx is not None
    rows_tot = 0
    if aligned:
        assert (run_start % 8 == 0).all() and (run_boff % 8 == 0).all()
        rows_tot = bank_rows_for(nnz_b)
        if rows_tot > BANK_ROWS_MAX:
            aligned = False  # bank would not fit VMEM: dynamic-align path

    # synthetic pad run: zero a.val slot (index nnz_a), b table offset 0
    run_start = np.concatenate([run_start, [n]])
    run_boff = np.concatenate([run_boff, [0]])
    run_aidx = np.concatenate([run_aidx, [nnz_a]])
    n_runs = run_start.size

    n_sub = n_pad // TILE
    sub_base = np.arange(n_sub, dtype=np.int64) * TILE
    first = np.searchsorted(run_start, sub_base, side="right") - 1
    starts_in = np.bincount(
        np.minimum(run_start // TILE, n_sub - 1), minlength=n_sub
    )
    # a run starting exactly at the tile base replaces the continuation
    at_base = np.zeros(n_sub, dtype=bool)
    rb = run_start[(run_start % TILE == 0) & (run_start < n_pad)] // TILE
    at_base[rb] = True
    count = starts_in + (~at_base).astype(np.int64)

    # dead subtiles (every covering run is the zero-a.val gap/pad run)
    # produce exact zeros: they get no class and route to the compact
    # buffer's trailing zero tile (~15-25% of window-arena slots are slack)
    live_run = run_aidx != nnz_a
    pref = np.concatenate([[0], np.cumsum(live_run)])
    lo = np.maximum(first, 0)
    hi = np.minimum(first + count, n_runs)
    sub_live = pref[np.maximum(hi, lo)] - pref[lo] > 0

    # subtile-granular classing: each live subtile pays its OWN pow2 piece
    # budget, not the max over its supertile (2.9x fewer piece-slots on
    # R-MAT-14); groups of SUB same-class subtiles share a grid step, the
    # kernel writes the compact class-major buffer, and one tile-gather
    # pass (gather_tiles8, ~0.6 ms at 25M) restores arena order
    cls_of = np.full(n_sub, -1, np.int64)
    for ci, J in enumerate(J_CLASSES):
        m = sub_live & (cls_of < 0) & (count <= J)
        cls_of[m] = ci
    _tick("classing")

    ids, cuts_l, boffs_l, aidx_l = [], [], [], []
    cpos_of = np.full(n_sub, -1, np.int64)  # compact tile index
    cbase = 0
    for ci, J in enumerate(J_CLASSES):
        subs = np.flatnonzero(cls_of == ci).astype(np.int64)
        n_g = -(-subs.size // SUB)
        padded = np.full(n_g * SUB, -1, np.int64)
        padded[: subs.size] = subs
        ids.append(jnp.asarray(padded.astype(np.int32)))
        if not subs.size:
            cuts_l.append(jnp.zeros((0,), jnp.int32))
            boffs_l.append(jnp.zeros((0,), jnp.int32))
            aidx_l.append(jnp.zeros((0,), jnp.int32))
            continue
        cpos_of[subs] = cbase + np.arange(subs.size)
        cbase += n_g * SUB
        sc = np.maximum(padded, 0)
        # runs first[t] + k, valid while k < count[t]; group-pad subtiles
        # (padded < 0) carry only inert pieces (cut == TILE -> acc 0)
        k = np.arange(J, dtype=np.int64)
        r = first[sc][:, None] + k[None, :]
        valid = (
            (k[None, :] < count[sc][:, None])
            & (r < n_runs)
            & (padded >= 0)[:, None]
        )
        rc = np.minimum(r, n_runs - 1)
        base = sub_base[sc][:, None]
        cut = np.where(valid, np.maximum(run_start[rc] - base, 0), TILE)
        eff = run_boff[rc] - run_start[rc] + base + BIAS
        if aligned:
            # bank-row code: eff = 128*q + 8*k -> row q of pre-rolled copy k
            boff = np.where(
                valid, (eff % LANES) // 8 * rows_tot + eff // LANES, 0
            )
        else:
            boff = np.where(valid, eff, BIAS)
        # forward-fill invalid slots from the previous valid piece so the
        # concatenated aidx stream stays near-monotone (cheap gather
        # classes); inert pieces (cut == TILE) never multiply their value
        flat = np.where(valid, run_aidx[rc], -1).reshape(-1)
        last = np.maximum.accumulate(
            np.where(flat >= 0, np.arange(flat.size), -1)
        )
        ai = flat[np.maximum(last, 0)]
        ai = np.where(last >= 0, ai, 0)
        cuts_l.append(jnp.asarray(cut.reshape(-1).astype(np.int32)))
        boffs_l.append(jnp.asarray(boff.reshape(-1).astype(np.int32)))
        aidx_l.append(ai.astype(np.int32))
        _tick(f"class-J{J}")

    # arena tile -> compact tile (sentinel: the trailing zero tile, which
    # no class grid ever writes — dead subtiles and fallback subtiles,
    # the latter patched in by scatter_tiles afterwards)
    arena_src = np.where(cpos_of >= 0, cpos_of, cbase).astype(np.int32)

    # fallback: live subtiles denser than the largest budget -> elements
    fb_subs = np.flatnonzero(sub_live & (cls_of < 0)).astype(np.int64)
    if fb_subs.size:
        pos = (fb_subs[:, None] * TILE + np.arange(TILE)[None, :]).reshape(-1)
        ridx = np.searchsorted(run_start, pos, side="right") - 1
        live = pos < n
        fb_bidx = np.where(
            live, run_boff[ridx] + pos - run_start[ridx], -1
        ).astype(np.int32)
        fb_aidx = np.where(live, run_aidx[ridx], 0).astype(np.int32)
    else:
        fb_bidx = np.zeros(0, np.int32)
        fb_aidx = np.zeros(0, np.int32)

    _tick("fallback")
    # one planned gather covers every class's per-piece A values
    aidx_cat = (
        np.concatenate(aidx_l) if aidx_l else np.zeros(0, np.int32)
    )
    splits, off = [], 0
    for a in aidx_l:
        splits.append((off, off + int(a.size)))
        off += int(a.size)
    _tick("aidx-cat")
    apv_gp = build_flat_gather_plan(aidx_cat.astype(np.int32))
    _tick("apv-gp")
    b8_gp = (
        build_flat_gather_plan(np.asarray(b8_idx, dtype=np.int32))
        if aligned else None
    )
    _tick("b8-gp")

    return PiecewisePlan(
        ids=tuple(ids),
        cuts=tuple(cuts_l),
        boffs=tuple(boffs_l),
        aidx=tuple(aidx_l),
        apv_gp=apv_gp,
        fb_ids=jnp.asarray(fb_subs.astype(np.int32)),
        fb_bidx=jnp.asarray(fb_bidx),
        fb_aidx=jnp.asarray(fb_aidx),
        b8_gp=b8_gp,
        arena_src=jnp.asarray(arena_src),
        n=n,
        n_pad=n_pad,
        nnz_a=nnz_a,
        nnz_b=nnz_b,
        apv_splits=tuple(splits),
        aligned=aligned,
        bank_rows=rows_tot,
    )


def _make_pw_kern(j_budget: int, sub: int, aligned: bool,
                  mode: str = "mul"):
    """``mode``: "mul" (B piece times per-piece A scalar — the f32 hot
    path), "copy" (B piece verbatim) or "fill" (per-piece A scalar
    broadcast).  copy/fill are pure movement: the f64 planes route
    (ops/kernels/planes.py) expands each uint32 plane separately and
    multiplies in XLA f64."""

    def kern(ids_r, cuts_r, boffs_r, apv_r, tbl_r, alias_r, out_r):
        del ids_r, alias_r
        pos = (
            jax.lax.broadcasted_iota(
                jnp.int32, (TILE_ROWS, LANES), 0
            ) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 1)
        )
        for k in range(sub):
            dt = apv_r.dtype if mode == "fill" else tbl_r.dtype
            acc = jnp.zeros((TILE_ROWS, LANES), dt)
            for j in range(j_budget):
                cut = cuts_r[k, j]
                boff = boffs_r[k, j]
                av = apv_r[k, j]
                if mode == "fill":
                    acc = jnp.where(pos >= cut, av, acc)
                    continue
                if aligned:
                    # boff is a bank-row code: a pure dynamic sublane
                    # slice of the pre-rolled bank IS the aligned piece
                    seg = tbl_r[pl.ds(boff, TILE_ROWS), :]
                else:
                    row0 = boff // LANES
                    blk = tbl_r[pl.ds(row0, SRC_ROWS), :]
                    seg = _flat_align(blk, boff % LANES)[:TILE_ROWS]
                acc = jnp.where(
                    pos >= cut, seg if mode == "copy" else seg * av, acc
                )
            out_r[pl.ds(k * TILE_ROWS, TILE_ROWS), :] = acc

    return kern


def _pw_class_call(j_budget, ids, cuts, boffs, apv, tbl2, out, aligned,
                   g_base, mode: str = "mul"):
    """One class's expansion into its compact-buffer range.

    ``ids`` is (n_groups * SUB,) subtile-granular; the output blocks are
    written SEQUENTIALLY from group offset ``g_base`` (class-major compact
    layout) — arena order is restored afterwards by one gather_tiles8
    pass, so the kernel's write side stays contiguous.
    """
    n_subt = int(ids.shape[0])
    sub = 1 if _interpret() else SUB
    n_steps = n_subt // sub
    base_blk = g_base * (SUB // sub)
    block_rows = sub * TILE_ROWS
    # aux arrays are subtile-major 2-D: (n_subtiles, J), block (sub, J)
    cuts = cuts.reshape(-1, j_budget)
    boffs = boffs.reshape(-1, j_budget)
    apv = apv.reshape(-1, j_budget)

    def big_tile():
        return pl.BlockSpec(
            (block_rows, LANES), lambda i, ids: (base_blk + i, 0),
            memory_space=pltpu.VMEM,
        )

    def smem_vec():
        return pl.BlockSpec(
            (sub, j_budget), lambda i, ids: (i, 0),
            memory_space=pltpu.SMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            smem_vec(),  # cuts
            smem_vec(),  # boffs
            smem_vec(),  # apv
            pl.BlockSpec(
                tbl2.shape, lambda i, ids: (0, 0), memory_space=pltpu.VMEM
            ),
            big_tile(),  # aliased out as input
        ],
        out_specs=big_tile(),
    )
    kern = _make_pw_kern(j_budget, sub, aligned, mode)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out.shape, out.dtype),
        # alias indices count the scalar-prefetch operand too
        input_output_aliases={5: 0},
        interpret=_interpret(),
    )(ids, cuts, boffs, apv, tbl2, out)


def _bank_kernel(x_ref, o_ref, *, rows_blk: int, per_copy: int):
    """One output block of pre-rolled copy k: y[q, l] = flat[q*128+l+8k]
    (k < 16 -> lane shift 8k < 128).  The whole flat table (+8 pad rows)
    stays VMEM-resident; each step slices its row window dynamically."""
    i = pl.program_id(0)
    k = i // per_copy
    s = 8 * k
    r0 = (i % per_copy) * rows_blk
    blk = x_ref[pl.ds(r0, rows_blk + 8), :]
    lane = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1)
    a = pltpu.roll(blk, (LANES - s) % LANES, 1)
    c = pltpu.roll(a, rows_blk + 8 - 1, 0)
    y = jnp.where(lane < LANES - s, a, c)
    o_ref[:] = y[:rows_blk]


def build_bank(b8_gp, bank_rows: int, b_val: jax.Array) -> jax.Array:
    """Pre-rolled aligned b8 bank: (BANK_K * bank_rows, 128).  Every
    8-aligned piece is then one dynamic sublane slice (see
    ``build_piecewise_plan`` aligned mode).  One Pallas pass builds all
    BANK_K copies (the 16-XLA-roll version cost ~1.3 ms per call)."""
    import functools

    from nsparse_tpu.ops.kernels.flat_gather import flat_gather

    b8 = flat_gather(b8_gp, b_val)
    flat = jnp.zeros(bank_rows * LANES, b_val.dtype)
    flat = jax.lax.dynamic_update_slice(flat, b8, (BIAS,))
    if _interpret():
        return jnp.concatenate(
            [jnp.roll(flat, -8 * k) for k in range(BANK_K)]
        ).reshape(-1, LANES)
    # rows_blk divides bank_rows so every block maps to ONE copy k
    rows_blk = 64
    for cand in (256, 128, 64):
        if bank_rows % cand == 0:
            rows_blk = cand
            break
    x2 = jnp.concatenate(
        [flat, jnp.zeros(8 * LANES, flat.dtype)]
    ).reshape(-1, LANES)
    n_blocks = BANK_K * bank_rows // rows_blk
    per_copy = bank_rows // rows_blk
    return pl.pallas_call(
        functools.partial(
            _bank_kernel, rows_blk=rows_blk, per_copy=per_copy
        ),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(
            x2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )],
        out_specs=pl.BlockSpec(
            (rows_blk, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (BANK_K * bank_rows, LANES), b_val.dtype
        ),
    )(x2)


def bank_rows_for(nnz_b8: int) -> int:
    """Bank row count for an aligned b8 table of ``nnz_b8`` slots
    (rounded to 64 rows so the bank-builder kernel gets 8-divisible
    blocks)."""
    rows = (BIAS + _round_up(nnz_b8 + TILE + LANES, LANES)) // LANES
    return _round_up(rows, 64)


def piecewise_expand(
    plan: PiecewisePlan, a_val: jax.Array, b_val: jax.Array,
    bank: jax.Array = None,
) -> jax.Array:
    """Device: materialize the aem product array (n_pad,) f32.

    ``a_val``/``b_val`` are the CSR value arrays the plan was built for
    (any values, same sparsity — the SpGEMM_Hash_Numeric re-run contract).
    """
    from nsparse_tpu.ops.kernels import flat_gather as _fg

    on_tpu = _fg.FORCE_PALLAS or jax.default_backend() == "tpu"
    use_pallas = on_tpu and b_val.dtype == jnp.float32
    a_pad = jnp.concatenate(
        [a_val, jnp.zeros(1, a_val.dtype)]
    )
    if b_val.dtype == jnp.float64 and on_tpu:
        return _piecewise_expand_f64(plan, a_pad, b_val)
    if not use_pallas:
        return _piecewise_reference(plan, a_pad, b_val)

    from nsparse_tpu.ops.kernels.flat_gather import flat_gather

    dt = b_val.dtype
    if plan.aligned:
        # 8-aligned table + BANK_K pre-rolled flat copies: every piece
        # becomes one dynamic sublane slice (lane rolls cost ~8 cyc/vreg
        # on this VPU; sublane slices are free).  ``bank``: a caller-
        # shared pre-built bank (same b8_gp/bank_rows).
        tbl2 = (
            bank if bank is not None
            else build_bank(plan.b8_gp, plan.bank_rows, b_val)
        )
        fb_table = flat_gather(plan.b8_gp, b_val)
    else:
        tbl_rows = (
            _round_up(plan.nnz_b + TILE + SRC_ROWS * LANES, LANES) // LANES
        )
        tbl2 = jnp.zeros((BIAS // LANES + tbl_rows, LANES), dt)
        tbl2 = jax.lax.dynamic_update_slice(
            tbl2.reshape(-1), b_val, (BIAS,)
        ).reshape(-1, LANES)
        fb_table = b_val

    apv_cat = flat_gather(plan.apv_gp, a_pad.astype(dt))
    # classes write the class-major compact buffer (sequential blocks);
    # the +1 trailing tile stays zero (dead/fallback arena tiles source it)
    n_ct = sum(int(i.shape[0]) for i in plan.ids) + 1
    out = jnp.zeros((n_ct * TILE_ROWS, LANES), dt)
    g_base = 0
    for j_budget, ids, cuts, boffs, (lo, hi) in zip(
        J_CLASSES, plan.ids, plan.cuts, plan.boffs, plan.apv_splits
    ):
        if not int(ids.shape[0]):
            continue
        apv = apv_cat[lo:hi]
        out = _pw_class_call(
            j_budget, ids, cuts, boffs, apv, tbl2, out, plan.aligned,
            g_base,
        )
        g_base += int(ids.shape[0]) // SUB
    from nsparse_tpu.ops.kernels.gather_pallas import gather_tiles8

    arena = gather_tiles8(
        out, plan.arena_src, plan.n_pad // TILE, tile_rows=TILE_ROWS
    )
    if int(plan.fb_ids.shape[0]):
        fb_b = jnp.where(
            plan.fb_bidx >= 0, fb_table[jnp.clip(plan.fb_bidx, 0)], 0
        )
        fb_vals = (fb_b * a_pad[plan.fb_aidx]).astype(dt).reshape(
            -1, LANES
        )
        arena = scatter_tiles(
            arena, plan.fb_ids, fb_vals, tile_rows=TILE_ROWS
        )
    return arena.reshape(-1)


def _pw_expand_plane(plan: PiecewisePlan, src_plane: jax.Array,
                     mode: str) -> jax.Array:
    """One uint32 bit plane through the class kernels.

    ``mode`` "copy" expands B-table pieces verbatim; "fill" broadcasts
    the per-piece A scalar over each piece extent.  Both are pure
    movement (see ``_make_pw_kern``), so the same piece tables expand
    an f64 stream as two 32-bit planes.  Returns the class-major
    (rows, 128) arena-ordered plane."""
    from nsparse_tpu.ops.kernels.flat_gather import flat_gather
    from nsparse_tpu.ops.kernels.gather_pallas import gather_tiles8

    dt = jnp.uint32
    apv_cat = None
    if mode == "copy":
        if plan.aligned:
            tbl2 = build_bank(plan.b8_gp, plan.bank_rows, src_plane)
        else:
            tbl_rows = (
                _round_up(plan.nnz_b + TILE + SRC_ROWS * LANES, LANES)
                // LANES
            )
            tbl2 = jnp.zeros((BIAS // LANES + tbl_rows, LANES), dt)
            tbl2 = jax.lax.dynamic_update_slice(
                tbl2.reshape(-1), src_plane, (BIAS,)
            ).reshape(-1, LANES)
    else:  # fill: the kernel never reads the table
        tbl2 = jnp.zeros((TILE_ROWS, LANES), dt)
        apv_cat = flat_gather(plan.apv_gp, src_plane)
    n_ct = sum(int(i.shape[0]) for i in plan.ids) + 1
    out = jnp.zeros((n_ct * TILE_ROWS, LANES), dt)
    g_base = 0
    for j_budget, ids, cuts, boffs, (lo, hi) in zip(
        J_CLASSES, plan.ids, plan.cuts, plan.boffs, plan.apv_splits
    ):
        if not int(ids.shape[0]):
            continue
        apv = (
            apv_cat[lo:hi] if mode == "fill"
            else jnp.zeros(hi - lo, dt)
        )
        out = _pw_class_call(
            j_budget, ids, cuts, boffs, apv, tbl2, out, plan.aligned,
            g_base, mode,
        )
        g_base += int(ids.shape[0]) // SUB
    return gather_tiles8(
        out, plan.arena_src, plan.n_pad // TILE, tile_rows=TILE_ROWS
    )


def _piecewise_expand_f64(
    plan: PiecewisePlan, a_pad: jax.Array, b_val: jax.Array
) -> jax.Array:
    """f64 expansion: per-plane pure-movement expansions of the A and B
    streams (same piece tables), one XLA f64 multiply, fallback pieces
    in XLA f64.  The f64 analog of the reference's double-compiled
    expansion kernels (``cuda-c/inc/nsparse.h:3-11``)."""
    from nsparse_tpu.ops.kernels import planes
    from nsparse_tpu.ops.kernels.flat_gather import flat_gather

    b_lo, b_hi = planes.split(b_val)
    a_lo, a_hi = planes.split(a_pad)
    b_exp = planes.combine(
        _pw_expand_plane(plan, b_lo, "copy"),
        _pw_expand_plane(plan, b_hi, "copy"),
    )
    a_exp = planes.combine(
        _pw_expand_plane(plan, a_lo, "fill"),
        _pw_expand_plane(plan, a_hi, "fill"),
    )
    arena = a_exp * b_exp
    if int(plan.fb_ids.shape[0]):
        fb_table = (
            flat_gather(plan.b8_gp, b_val) if plan.aligned else b_val
        )
        fb_b = jnp.where(
            plan.fb_bidx >= 0, fb_table[jnp.clip(plan.fb_bidx, 0)], 0
        )
        fb_vals = (fb_b * a_pad[plan.fb_aidx]).reshape(-1, LANES)
        arena = scatter_tiles(
            arena, plan.fb_ids, fb_vals, tile_rows=TILE_ROWS
        )
    return arena.reshape(-1)


def _piecewise_reference(plan, a_pad, b_val):
    """XLA path (off-TPU / f64): same output, element gathers."""
    if plan.aligned:
        from nsparse_tpu.ops.kernels.flat_gather import flat_gather

        tbl = flat_gather(plan.b8_gp, b_val)
    else:
        tbl = b_val
    tn = int(tbl.shape[0])
    # class-major compact buffer (+1 zero tile), then the arena gather —
    # mirrors the Pallas path exactly
    n_ct = sum(int(i.shape[0]) for i in plan.ids) + 1
    out_c = jnp.zeros((n_ct, TILE), b_val.dtype)
    pos = jnp.arange(TILE, dtype=jnp.int32)
    cbase = 0
    for j_budget, ids, cuts, boffs, aidx in zip(
        J_CLASSES, plan.ids, plan.cuts, plan.boffs, plan.aidx
    ):
        n_subt = int(ids.shape[0])
        if not n_subt:
            continue
        n_real = int((np.asarray(ids) >= 0).sum())
        cuts2 = cuts.reshape(n_subt, j_budget)[:n_real]
        boffs2 = boffs.reshape(n_subt, j_budget)[:n_real]
        aidx2 = aidx.reshape(n_subt, j_budget)[:n_real]
        # per element: the last piece with cut <= pos
        sel = jnp.sum(
            (cuts2[:, None, :] <= pos[None, :, None]).astype(jnp.int32),
            axis=-1,
        ) - 1
        sel = jnp.clip(sel, 0)
        bo = jnp.take_along_axis(boffs2, sel, axis=1)
        ai = jnp.take_along_axis(aidx2, sel, axis=1)
        if plan.aligned:
            # decode the bank-row code back to the flat table offset
            bo = (
                (bo % plan.bank_rows) * LANES + (bo // plan.bank_rows) * 8
            )
        bidx = bo + pos[None, :] - BIAS
        zero_b = (bidx < 0) | (bidx >= tn)
        vals = jnp.where(
            zero_b, 0, tbl[jnp.clip(bidx, 0, tn - 1)]
        ) * a_pad[ai]
        rows = cbase + jnp.arange(n_real, dtype=jnp.int32)
        out_c = out_c.at[rows].set(vals.astype(out_c.dtype))
        cbase += n_subt
    out = out_c[plan.arena_src].reshape(-1)
    if int(plan.fb_ids.shape[0]):
        fb_b = jnp.where(
            plan.fb_bidx >= 0, tbl[jnp.clip(plan.fb_bidx, 0)], 0
        )
        fb_vals = (fb_b * a_pad[plan.fb_aidx]).reshape(-1, TILE)
        out = out.reshape(-1, TILE).at[plan.fb_ids].set(
            fb_vals.astype(out.dtype)
        ).reshape(-1)
    return out
