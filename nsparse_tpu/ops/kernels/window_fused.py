"""Fused window-arena reduction: fold + tiers + extraction + entry order
in ONE Pallas kernel per width class.

Round-3 ran the window numeric as separate HBM passes: fold pyramid
materialization, a run-copy extraction over a 45M-slot pyramid (measured
~7 ms of the 11.4 ms R-MAT-14 numeric — DMA read amplification plus
~2200 grid-step overheads), a shared-tile entry Benes, and the final
merge.  But a window (<= 32K slots, 128 KB f32) fits VMEM whole: this
kernel keeps every intermediate — the fold pyramid, the radix-8 tier
recursion, the extracted totals, and the entry-ordered result — in VMEM
scratch, reading the tier-1-permuted products once and writing only the
entry-ordered arena.  This is the TPU analog of the reference doing
expand + accumulate + sort in one kernel over shared memory
(``cuda-c/src/kernel/kernel_spgemm_hash_template.cu:620-816``).

Phases per grid step (one block = BLK slots = NWB windows):

1. F0 copy: the tier-1 Benes output block lands in the PYR scratch
   (8 zeroed bias rows in front keep extraction slices in bounds).
2. Tier-1 folds: ``F_k = F_{k-1}[:, :W >> k] + F_{k-1}[:, W >> k:]``
   (level-major regions, row-granular adds; widths < 256 fold on lanes).
3. Radix-8 tiers: per tier, build ``[prev_F3 | zeros]`` arenas, apply
   the per-tier Benes in VMEM (transposed middle when the block's tier
   rows reach a 128 multiple, lane rolls otherwise — deep tiers are
   tiny), fold 3 levels into PYR tier regions.  Tier arenas require
   V >= 256, bounding the supported entry length at ``8^t_max(W)``; the
   plan routes heavier rows to wider windows or the global fallback.
4. Extraction: plan-known runs (level intervals + tier totals), phase-
   matched to a per-window cursor, become pure dynamic sublane slices
   of PYR selected into the E scratch per 1024-slot subtile (run-copy
   semantics without DMA or grid-step overhead).
5. Entry Benes (width P = W): per-window masks reorder E into C-entry
   order rotated to ``c_rpt[first_row] mod 128``, so the final merge
   run-copy reads every window phase-matched.

The output arena is CLASS-MAJOR (each class's windows contiguous); the
merge run-copy composes per-window runs (plus the fallback segment)
into ``c_val``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE = 1024
TILE_ROWS = 8
PYR_BIAS = TILE_ROWS  # zeroed front rows: negative-ish piece anchors


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _benes_stages(width: int):
    w = width.bit_length() - 1
    return [width >> (t + 1) for t in range(w)] + [
        1 << (t + 1) for t in range(w - 1)
    ]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FusedClassPlan:
    """Device routing for one width class of the fused window kernel.

    Static geometry:
      w: window width (= entry-Benes width P); blk: slots per grid step;
      lv: tier-1 fold levels;
      levels: ((width, rows_per_win, base_rows_per_win), ...) — the PYR
        level layout, level-major per block; index 0 is F0.  Block-level
        region base = PYR_BIAS + base_rows_per_win * NWB.
      tier_meta: per tier (v_in, V, mid_mode), mid_mode in
        {"trans", "lane"}; each tier's 3 fold levels follow in levels.
      j_cap: extraction pieces per 1024-slot subtile (padded).

    Arrays:
      trips: (n_steps * SUBS, 8) int32; column 0 = live piece count of
        the subtile (the in-kernel loop trip).
      cuts/ends/srows: (n_steps * SUBS, j_cap) int32 piece tables —
        output bounds within the subtile and the phase-matched PYR
        source row (block-local, bias included); inert pieces carry
        cut == end == TILE and srow == 0.
      emo/emt: (slots/128, 128) int32 entry-Benes masks (split layout).
      tier_masks: per tier, (tmo, tmt) for "trans" or (tm,) for "lane".
      ref_ext_idx / ref_entry_idx / ref_tier_idx: off-TPU reference
        gather indices (None / () when built for TPU).
    """

    trips: jax.Array
    cuts: jax.Array
    ends: jax.Array
    srows: jax.Array
    emo: jax.Array
    emt: jax.Array
    tier_masks: Tuple
    ref_ext_idx: object
    ref_entry_idx: object
    ref_tier_idx: Tuple
    w: int = dataclasses.field(metadata=dict(static=True))
    blk: int = dataclasses.field(metadata=dict(static=True))
    lv: int = dataclasses.field(metadata=dict(static=True))
    levels: Tuple = dataclasses.field(metadata=dict(static=True))
    tier_meta: Tuple = dataclasses.field(metadata=dict(static=True))
    j_cap: int = dataclasses.field(metadata=dict(static=True))
    n_steps: int = dataclasses.field(metadata=dict(static=True))
    slots: int = dataclasses.field(metadata=dict(static=True))


def class_levels(W: int, lv: int, tier_vs) -> Tuple:
    """Static PYR level layout: (width, rows_per_win, base_rows_per_win)
    for F0, F1..F_lv, then 3 levels per tier."""
    out = []
    base = 0
    widths = [W] + [W >> k for k in range(1, lv + 1)]
    for V in tier_vs:
        widths += [V >> 1, V >> 2, V >> 3]
    for width in widths:
        rpw = max(width // LANES, 1)
        out.append((width, rpw, base))
        base += rpw
    return tuple(out)


def _apply_stages(z, m, stages, sub_dist=False):
    """Benes stages on a (rows, 128) value; masks m same shape.

    ``sub_dist``: data is 128x128-transposed, so d < 128 are sublane
    distances; otherwise d >= 128 are sublane (row) distances and
    d < 128 lane distances."""
    rows = z.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    for t, d in stages:
        if sub_dist or d >= LANES:
            sd = d // LANES if d >= LANES else d
            up = pltpu.roll(z, (rows - sd) % rows, 0)
            dn = pltpu.roll(z, sd % rows, 0)
            part = jnp.where((sub & sd) == 0, up, dn)
        else:
            left = pltpu.roll(z, (LANES - d) % LANES, 1)
            right = pltpu.roll(z, d, 1)
            part = jnp.where((lane & d) == 0, left, right)
        bit = (m >> t) & 1
        z = jnp.where(bit == 1, part, z)
    return z


def _trans128(z):
    """128x128-block transpose of a (rows, 128) value (rows % 128 == 0)."""
    return jnp.swapaxes(
        z.reshape(-1, LANES, LANES), 1, 2
    ).reshape(z.shape[0], LANES)


def _split_benes_value(z, mo, mt, width):
    """Full split-middle Benes on a (rows, 128) value (rows % 128 == 0,
    tiles of ``width`` aligned within)."""
    stages = list(enumerate(_benes_stages(width)))
    wv = width.bit_length() - 1
    s_total = 2 * wv - 1
    kk = max(wv - 7, 0)
    if kk:
        z = _apply_stages(z, mo, stages[:kk])
    zt = _apply_stages(
        _trans128(z), mt, stages[kk : s_total - kk], sub_dist=True
    )
    z = _trans128(zt)
    if kk:
        z = _apply_stages(z, mo, stages[s_total - kk :])
    return z


def _make_fused_kernel(cfg):
    W = cfg["w"]
    BLK = cfg["blk"]
    NWB = BLK // W
    LV = cfg["lv"]
    LEVELS = cfg["levels"]
    TIERS = cfg["tier_meta"]
    J_CAP = cfg["j_cap"]
    N_TIERS = len(TIERS)
    SUBS = BLK // TILE
    ROWS = BLK // LANES
    RPW = W // LANES
    PR = PYR_BIAS + sum(r for _, r, _ in LEVELS) * NWB + TILE_ROWS
    # debug phase gate: "f0" | "folds" | "tiers" | "extract" | "full"
    PHASES = cfg.get("phases", "full")
    _ORDER = ("f0", "folds", "tiers", "extract", "full")
    PLIM = _ORDER.index(PHASES)

    def lvl_base(li):
        return PYR_BIAS + LEVELS[li][2] * NWB

    def kern(trips_r, cuts_r, ends_r, srows_r, x_r, emo_r, emt_r, *rest):
        tier_masks = rest[:N_TIERS]
        o_r, pyr, e_s = rest[N_TIERS:]

        # --- 1. F0 (bias rows zeroed once per first step visit) -------
        pyr[0:PYR_BIAS, :] = jnp.zeros((PYR_BIAS, LANES), x_r.dtype)
        pyr[PYR_BIAS : PYR_BIAS + ROWS, :] = x_r[:]
        pyr[PR - TILE_ROWS : PR, :] = jnp.zeros(
            (TILE_ROWS, LANES), x_r.dtype
        )
        if PLIM == 0:
            o_r[:] = x_r[:]
            return

        # --- 2/3. folds + tiers --------------------------------------
        def fold_store(cur, cur_width, cur_rows, dst_li):
            """One halving fold of ``cur`` ((NWB * cur_rows, 128)) into
            LEVELS[dst_li]; returns the stored value + its geometry."""
            dwidth, drpw, _ = LEVELS[dst_li]
            db = lvl_base(dst_li)
            if cur_width >= 2 * LANES:
                v3 = cur.reshape(NWB, cur_rows, LANES)
                h = cur_rows // 2
                r = (v3[:, :h] + v3[:, h:]).reshape(NWB * h, LANES)
                pyr[db : db + NWB * h, :] = r
                return r, cur_width // 2, h
            # lane-granular: width <= 128, halves within the row
            hw = cur_width // 2
            v2 = cur.reshape(NWB, cur_rows * LANES)
            r = v2[:, :hw] + v2[:, hw : 2 * hw]
            pad = jnp.concatenate(
                [r, jnp.zeros((NWB, drpw * LANES - hw), r.dtype)],
                axis=1,
            ).reshape(NWB * drpw, LANES)
            pyr[db : db + NWB * drpw, :] = pad
            return pad, hw, drpw

        cur = x_r[:]
        cw, cr = W, RPW
        for k in range(1, LV + 1):
            cur, cw, cr = fold_store(cur, cw, cr, k)
        if PLIM == 1:
            o_r[:] = pyr[PYR_BIAS : PYR_BIAS + ROWS, :]
            return

        li = LV + 1
        for ti, (v_in, V, mid_mode) in enumerate(TIERS):
            # arena: per window [prev_L3 (v_in) | zeros]; v_in >= 128
            src3 = cur.reshape(NWB, cr, LANES)
            arena = jnp.concatenate(
                [src3, jnp.zeros_like(src3)], axis=1
            ).reshape(NWB * 2 * cr, LANES)
            t_rows = NWB * 2 * cr
            if mid_mode == "trans":
                tmo = tier_masks[ti][0][:]
                tmt = tier_masks[ti][1][:]
                z = _split_benes_value(arena, tmo, tmt, V)
            else:
                tm = tier_masks[ti][0][:]
                z = _apply_stages(
                    arena, tm, list(enumerate(_benes_stages(V)))
                )
            cur, cw, cr = z, V, 2 * cr
            for k in (1, 2, 3):
                cur, cw, cr = fold_store(cur, cw, cr, li + k - 1)
            li += 3
        if PLIM == 2:
            o_r[:] = pyr[PYR_BIAS : PYR_BIAS + ROWS, :]
            return

        # --- 4. extraction -------------------------------------------
        pos = (
            jax.lax.broadcasted_iota(
                jnp.int32, (TILE_ROWS, LANES), 0
            ) * LANES
            + jax.lax.broadcasted_iota(
                jnp.int32, (TILE_ROWS, LANES), 1
            )
        )

        def sub_body(s, carry):
            def piece(j, acc):
                cut = cuts_r[s, j]
                end = ends_r[s, j]
                srow = srows_r[s, j]
                seg = pyr[pl.ds(srow, TILE_ROWS), :]
                return jnp.where((pos >= cut) & (pos < end), seg, acc)

            acc = jax.lax.fori_loop(
                0, trips_r[s, 0], piece,
                jnp.zeros((TILE_ROWS, LANES), x_r.dtype),
            )
            e_s[pl.ds(s * TILE_ROWS, TILE_ROWS), :] = acc
            return carry

        jax.lax.fori_loop(0, SUBS, sub_body, 0)
        if PLIM == 3:
            o_r[:] = e_s[0:ROWS, :]
            return

        # --- 5. entry Benes (width W) --------------------------------
        stages = list(enumerate(_benes_stages(W)))
        wv = W.bit_length() - 1
        s_total = 2 * wv - 1
        kk = max(wv - 7, 0)
        # outer pre, per window (row distances stay within the window)
        if kk:
            for w in range(NWB):
                zw = e_s[w * RPW : (w + 1) * RPW, :]
                mw = emo_r[w * RPW : (w + 1) * RPW, :]
                e_s[w * RPW : (w + 1) * RPW, :] = _apply_stages(
                    zw, mw, stages[:kk]
                )
        # transposed middle, per 128-row group
        for g in range(ROWS // LANES):
            zt = _trans128(e_s[g * LANES : (g + 1) * LANES, :])
            zt = _apply_stages(
                zt, emt_r[g * LANES : (g + 1) * LANES, :],
                stages[kk : s_total - kk], sub_dist=True,
            )
            e_s[g * LANES : (g + 1) * LANES, :] = _trans128(zt)
        # outer post, per window, into the output block
        for w in range(NWB):
            zw = e_s[w * RPW : (w + 1) * RPW, :]
            if kk:
                mw = emo_r[w * RPW : (w + 1) * RPW, :]
                zw = _apply_stages(zw, mw, stages[s_total - kk :])
            o_r[w * RPW : (w + 1) * RPW, :] = zw

    return kern, PR


def fused_class_apply(plan: FusedClassPlan, x: jax.Array) -> jax.Array:
    """Run the fused reduction on one class's tier-1-permuted slots;
    returns the (slots,) entry-ordered class arena."""
    if plan.ref_ext_idx is not None:
        return _fused_reference(plan, x)

    import os

    cfg = dict(
        w=plan.w, blk=plan.blk, lv=plan.lv, levels=plan.levels,
        tier_meta=plan.tier_meta, j_cap=plan.j_cap,
        phases=os.environ.get("NSPARSE_FUSED_PHASES", "full"),
    )
    kern, PR = _make_fused_kernel(cfg)
    ROWS = plan.blk // LANES
    SUBS = plan.blk // TILE
    NWB = plan.blk // plan.w

    def smem(cols=None):
        return pl.BlockSpec(
            (SUBS, cols or plan.j_cap), lambda i: (i, 0),
            memory_space=pltpu.SMEM,
        )

    def vmem_rows(rows):
        return pl.BlockSpec(
            (rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    in_specs = [
        smem(8), smem(), smem(), smem(),
        vmem_rows(ROWS), vmem_rows(ROWS), vmem_rows(ROWS),
    ]
    args = [
        plan.trips, plan.cuts, plan.ends, plan.srows,
        x[: plan.slots].reshape(-1, LANES),
        plan.emo, plan.emt,
    ]
    t_rows_max = TILE_ROWS
    wrapped_masks = []
    for (v_in, V, mode), masks in zip(plan.tier_meta, plan.tier_masks):
        t_rows = NWB * V // LANES
        t_rows_max = max(t_rows_max, t_rows)
        wrapped_masks.append(len(masks))
        for m in masks:
            in_specs.append(vmem_rows(t_rows))
            args.append(m)

    arity = tuple(wrapped_masks)

    def flat_kern(trips, cuts, ends, srows, xx, emo, emt, *rest):
        n_masks = sum(arity)
        masks_flat = rest[:n_masks]
        tail = rest[n_masks:]
        grouped, off = [], 0
        for a in arity:
            grouped.append(tuple(masks_flat[off : off + a]))
            off += a
        return kern(trips, cuts, ends, srows, xx, emo, emt, *grouped,
                    *tail)

    out = pl.pallas_call(
        flat_kern,
        grid=(plan.n_steps,),
        in_specs=in_specs,
        out_specs=vmem_rows(ROWS),
        out_shape=jax.ShapeDtypeStruct(
            (plan.n_steps * ROWS, LANES), x.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((PR, LANES), x.dtype),
            pltpu.VMEM((ROWS, LANES), x.dtype),
        ],
        interpret=_interpret(),
    )(*args)
    return out.reshape(-1)


def _fused_reference(plan: FusedClassPlan, x: jax.Array) -> jax.Array:
    """Off-TPU reference: same plan semantics via XLA gathers + sliced
    fold adds (the kernel itself is validated on TPU)."""
    W = plan.w
    n_win = plan.slots // W
    F = x[: plan.slots].reshape(n_win, W)
    levels = [F]
    cur = F
    for k in range(1, plan.lv + 1):
        half = W >> k
        cur = cur[:, :half] + cur[:, half:]
        levels.append(cur)
    for (v_in, V, mode), ridx in zip(plan.tier_meta, plan.ref_tier_idx):
        arena = jnp.concatenate(
            [cur, jnp.zeros_like(cur)], axis=1
        ).reshape(-1)
        arena = arena[ridx]
        cur = arena.reshape(n_win, V)
        for k in (1, 2, 3):
            half = V >> k
            cur = cur[:, :half] + cur[:, half:]
            levels.append(cur)
    virtual = jnp.concatenate([lv_.reshape(-1) for lv_ in levels])
    idx = plan.ref_ext_idx
    e = jnp.where(idx >= 0, virtual[jnp.clip(idx, 0)], 0).astype(x.dtype)
    return e[plan.ref_entry_idx]
