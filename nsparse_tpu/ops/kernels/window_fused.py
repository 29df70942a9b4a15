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
    # v2 (in-kernel expansion + tier-1 Benes); None/zeros when expand=False
    etrips: object = None
    ecuts: object = None
    eboffs: object = None
    eends: object = None
    m1o: object = None
    m1t: object = None
    w: int = dataclasses.field(default=0, metadata=dict(static=True))
    blk: int = dataclasses.field(default=0, metadata=dict(static=True))
    lv: int = dataclasses.field(default=0, metadata=dict(static=True))
    levels: Tuple = dataclasses.field(
        default=(), metadata=dict(static=True)
    )
    tier_meta: Tuple = dataclasses.field(
        default=(), metadata=dict(static=True)
    )
    j_cap: int = dataclasses.field(default=8, metadata=dict(static=True))
    n_steps: int = dataclasses.field(default=0, metadata=dict(static=True))
    slots: int = dataclasses.field(default=0, metadata=dict(static=True))
    expand: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    j2_cap: int = dataclasses.field(default=8, metadata=dict(static=True))
    apv_lo: int = dataclasses.field(default=0, metadata=dict(static=True))
    apv_hi: int = dataclasses.field(default=0, metadata=dict(static=True))


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
        # bit-t test as a sign test: one shift + one compare (vs
        # shift+and+compare) per stage over the full mask tile
        z = jnp.where((m << (31 - t)) < 0, part, z)
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
    EXPAND = cfg["expand"]
    J2_CAP = cfg.get("j2_cap", 8)
    # debug phase gate
    PHASES = cfg.get("phases", "full")
    _ORDER = ("expand", "f0", "folds", "tiers", "extract", "full")
    PLIM = _ORDER.index(PHASES) - 1  # "expand" -> -1

    def lvl_base(li):
        return PYR_BIAS + LEVELS[li][2] * NWB

    stages_w = list(enumerate(_benes_stages(W)))
    wv_w = W.bit_length() - 1
    s_total_w = 2 * wv_w - 1
    kk_w = max(wv_w - 7, 0)

    GRP = max(RPW, 2 * LANES)  # outer-stage value granularity

    def split_benes_scratch(buf, mo_r, mt_r, store):
        """Width-W split Benes applied through a (ROWS, 128) scratch ref;
        ``store(g, val)`` receives each GRP-row group's final rows.
        Outer stages process GRP >= RPW rows at a time (windows are
        GRP-aligned, so XOR partners stay inside the group)."""
        if kk_w:
            for g in range(ROWS // GRP):
                zw = buf[g * GRP : (g + 1) * GRP, :]
                mw = mo_r[g * GRP : (g + 1) * GRP, :]
                buf[g * GRP : (g + 1) * GRP, :] = _apply_stages(
                    zw, mw, stages_w[:kk_w]
                )
        for g in range(ROWS // LANES):
            zt = _trans128(buf[g * LANES : (g + 1) * LANES, :])
            zt = _apply_stages(
                zt, mt_r[g * LANES : (g + 1) * LANES, :],
                stages_w[kk_w : s_total_w - kk_w], sub_dist=True,
            )
            buf[g * LANES : (g + 1) * LANES, :] = _trans128(zt)
        for g in range(ROWS // GRP):
            zw = buf[g * GRP : (g + 1) * GRP, :]
            if kk_w:
                mw = mo_r[g * GRP : (g + 1) * GRP, :]
                zw = _apply_stages(zw, mw, stages_w[s_total_w - kk_w :])
            store(g, zw)

    pos = None  # built lazily inside the kernel

    def kern_body(refs):
        (etrips_r, ecuts_r, eboffs_r, eends_r, eapv_r, bank_r, x_r,
         trips_r, cuts_r, ends_r, srows_r, emo_r, emt_r, m1o_r, m1t_r,
         tier_masks, o_r, pyr, e_s) = refs

        pos = (
            jax.lax.broadcasted_iota(
                jnp.int32, (TILE_ROWS, LANES), 0
            ) * LANES
            + jax.lax.broadcasted_iota(
                jnp.int32, (TILE_ROWS, LANES), 1
            )
        )
        dt = o_r.dtype

        # --- 0/1. products into PYR F0 -------------------------------
        pyr[0:PYR_BIAS, :] = jnp.zeros((PYR_BIAS, LANES), dt)
        pyr[PR - TILE_ROWS : PR, :] = jnp.zeros((TILE_ROWS, LANES), dt)
        if EXPAND:
            # expansion (aligned-bank pieces) into the E scratch, then
            # the tier-1 Benes lands F0 in PYR.  Pieces cover DISJOINT
            # [cut, end) ranges of the subtile, so instead of the
            # sequential overwrite chain the loop runs ILP independent
            # accumulator chains (the piece loop is latency-bound: each
            # iteration is a handful of vreg ops behind scalar address
            # math, and the carried where() serialized them).
            W8 = J2_CAP // 8  # piece tables: 8 rows per step
            ILP = 4

            def exp_sub(s, carry):
                w8b = W8.bit_length() - 1  # W8 is a power of two
                lo = etrips_r[s, 0]
                hi = etrips_r[s, 1]

                def one(jj, acc):
                    r8 = jj >> w8b
                    c8 = jj & (W8 - 1)
                    # overrun slots (>= hi) belong to the next subtile:
                    # force an empty range
                    cut = jnp.where(jj < hi, ecuts_r[r8, c8], TILE)
                    # force a 0-length range on overrun pieces: the
                    # unsigned test below would read end-cut < 0 as huge
                    end = jnp.where(jj < hi, eends_r[r8, c8], TILE)
                    av = eapv_r[r8, c8]
                    seg = bank_r[pl.ds(eboffs_r[r8, c8], TILE_ROWS), :]
                    # cut <= pos < end as ONE unsigned compare: pieces
                    # keep cut <= end <= TILE, so pos-cut underflows to
                    # a huge uint32 exactly when pos < cut
                    m = (pos - cut).astype(jnp.uint32) < (
                        end - cut
                    ).astype(jnp.uint32)
                    return acc + jnp.where(m, seg * av, 0)

                def chunk(i, accs):
                    j0 = lo + i * ILP
                    return tuple(
                        one(j0 + k, a) for k, a in enumerate(accs)
                    )

                z = jnp.zeros((TILE_ROWS, LANES), dt)
                accs = jax.lax.fori_loop(
                    0, (hi - lo + (ILP - 1)) // ILP, chunk, (z,) * ILP
                )
                acc = accs[0]
                for a in accs[1:]:
                    acc = acc + a
                e_s[pl.ds(s * TILE_ROWS, TILE_ROWS), :] = acc
                return carry

            jax.lax.fori_loop(0, SUBS, exp_sub, 0)
            if PLIM == -1:
                o_r[:] = e_s[0:ROWS, :]
                return
            split_benes_scratch(
                e_s, m1o_r, m1t_r,
                lambda g, zw: pyr.__setitem__(
                    (slice(PYR_BIAS + g * GRP, PYR_BIAS + (g + 1) * GRP),
                     slice(None)), zw
                ),
            )
        else:
            pyr[PYR_BIAS : PYR_BIAS + ROWS, :] = x_r[:]
        if PLIM == 0:
            o_r[:] = pyr[PYR_BIAS : PYR_BIAS + ROWS, :]
            return

        # --- 2/3. folds + tiers --------------------------------------
        def fold_store(cur, cur_width, cur_rows, dst_li):
            dwidth, drpw, _ = LEVELS[dst_li]
            db = lvl_base(dst_li)
            if cur_width >= 2 * LANES:
                v3 = cur.reshape(NWB, cur_rows, LANES)
                h = cur_rows // 2
                r = (v3[:, :h] + v3[:, h:]).reshape(NWB * h, LANES)
                pyr[db : db + NWB * h, :] = r
                return r, cur_width // 2, h
            hw = cur_width // 2
            v2 = cur.reshape(NWB, cur_rows * LANES)
            r = v2[:, :hw] + v2[:, hw : 2 * hw]
            pad = jnp.concatenate(
                [r, jnp.zeros((NWB, drpw * LANES - hw), r.dtype)],
                axis=1,
            ).reshape(NWB * drpw, LANES)
            pyr[db : db + NWB * drpw, :] = pad
            return pad, hw, drpw

        cur = pyr[PYR_BIAS : PYR_BIAS + ROWS, :]
        cw, cr = W, RPW
        for k in range(1, LV + 1):
            cur, cw, cr = fold_store(cur, cw, cr, k)
        if PLIM == 1:
            o_r[:] = pyr[PYR_BIAS : PYR_BIAS + ROWS, :]
            return

        li = LV + 1
        for ti, (v_in, V, mid_mode) in enumerate(TIERS):
            src3 = cur.reshape(NWB, cr, LANES)
            arena = jnp.concatenate(
                [src3, jnp.zeros_like(src3)], axis=1
            ).reshape(NWB * 2 * cr, LANES)
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
        # pieces are disjoint [cut, end) ranges and the table is padded
        # with inert pieces (cut == end == TILE, srow == 0), so the loop
        # runs ILP independent accumulator chains over j_cap-safe chunks
        ILPX = 4

        def sub_body(s, carry):
            def one(j, acc):
                cut = cuts_r[s, j]
                end = ends_r[s, j]
                srow = srows_r[s, j]
                seg = pyr[pl.ds(srow, TILE_ROWS), :]
                m = (pos - cut).astype(jnp.uint32) < (
                    end - cut
                ).astype(jnp.uint32)
                return acc + jnp.where(m, seg, 0)

            def chunk(i, accs):
                j0 = i * ILPX
                return tuple(
                    one(j0 + k, a) for k, a in enumerate(accs)
                )

            z = jnp.zeros((TILE_ROWS, LANES), dt)
            accs = jax.lax.fori_loop(
                0, (trips_r[s, 0] + (ILPX - 1)) // ILPX, chunk,
                (z,) * ILPX,
            )
            acc = accs[0]
            for a in accs[1:]:
                acc = acc + a
            e_s[pl.ds(s * TILE_ROWS, TILE_ROWS), :] = acc
            return carry

        jax.lax.fori_loop(0, SUBS, sub_body, 0)
        if PLIM == 3:
            o_r[:] = e_s[0:ROWS, :]
            return

        # --- 5. entry Benes ------------------------------------------
        split_benes_scratch(
            e_s, emo_r, emt_r,
            lambda g, zw: o_r.__setitem__(
                (slice(g * GRP, (g + 1) * GRP), slice(None)), zw
            ),
        )

    if EXPAND:
        def kern(etrips_r, ecuts_r, eboffs_r, eends_r, eapv_r, bank_r,
                 trips_r, cuts_r, ends_r, srows_r, emo_r, emt_r,
                 m1o_r, m1t_r, *rest):
            tier_masks = rest[:N_TIERS]
            o_r, pyr, e_s = rest[N_TIERS:]
            kern_body((etrips_r, ecuts_r, eboffs_r, eends_r, eapv_r,
                       bank_r, None,
                       trips_r, cuts_r, ends_r, srows_r, emo_r, emt_r,
                       m1o_r, m1t_r, tier_masks, o_r, pyr, e_s))
    else:
        def kern(trips_r, cuts_r, ends_r, srows_r, x_r, emo_r, emt_r,
                 *rest):
            tier_masks = rest[:N_TIERS]
            o_r, pyr, e_s = rest[N_TIERS:]
            kern_body((None, None, None, None, None, None, x_r,
                       trips_r, cuts_r, ends_r, srows_r, emo_r, emt_r,
                       None, None, tier_masks, o_r, pyr, e_s))

    return kern, PR


def fused_class_apply(
    plan: FusedClassPlan,
    x: jax.Array = None,
    bank: jax.Array = None,
    apv: jax.Array = None,
) -> jax.Array:
    """Run the fused reduction for one class; returns the (slots,)
    entry-ordered class arena.

    v1 mode (``plan.expand == False``): ``x`` is the tier-1-permuted
    product array.  v2 mode: ``bank`` is the pre-rolled (rows, 128) b8
    table, ``apv`` the per-piece A values; expansion and the tier-1
    Benes run inside the kernel.
    """
    if plan.ref_ext_idx is not None:
        return _fused_reference(plan, x)

    import os

    cfg = dict(
        w=plan.w, blk=plan.blk, lv=plan.lv, levels=plan.levels,
        tier_meta=plan.tier_meta, j_cap=plan.j_cap, expand=plan.expand,
        j2_cap=plan.j2_cap,
        phases=os.environ.get("NSPARSE_FUSED_PHASES", "full"),
    )
    kern, PR = _make_fused_kernel(cfg)
    ROWS = plan.blk // LANES
    SUBS = plan.blk // TILE
    NWB = plan.blk // plan.w
    dt = (bank if plan.expand else x).dtype

    def smem(cols, dtype=None):
        return pl.BlockSpec(
            (SUBS, cols), lambda i: (i, 0), memory_space=pltpu.SMEM
        )

    def vmem_rows(rows):
        return pl.BlockSpec(
            (rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    in_specs = []
    args = []
    if plan.expand:
        w8 = plan.j2_cap // 8

        def smem_step():
            return pl.BlockSpec(
                (8, w8), lambda i: (i, 0), memory_space=pltpu.SMEM
            )

        in_specs += [
            smem(8), smem_step(), smem_step(), smem_step(), smem_step(),
            pl.BlockSpec(
                bank.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ]
        args += [
            plan.etrips, plan.ecuts, plan.eboffs, plan.eends,
            apv.reshape(-1, w8), bank,
        ]
    in_specs += [smem(8), smem(plan.j_cap), smem(plan.j_cap),
                 smem(plan.j_cap)]
    args += [plan.trips, plan.cuts, plan.ends, plan.srows]
    if not plan.expand:
        in_specs.append(vmem_rows(ROWS))
        args.append(x[: plan.slots].reshape(-1, LANES))
    in_specs += [vmem_rows(ROWS), vmem_rows(ROWS)]
    args += [plan.emo, plan.emt]
    if plan.expand:
        in_specs += [vmem_rows(ROWS), vmem_rows(ROWS)]
        args += [plan.m1o, plan.m1t]

    arity = []
    for (v_in, V, mode), masks in zip(plan.tier_meta, plan.tier_masks):
        t_rows = NWB * V // LANES
        arity.append(len(masks))
        for mref in masks:
            in_specs.append(vmem_rows(t_rows))
            args.append(mref)
    arity = tuple(arity)
    n_lead = (14 if plan.expand else 7)

    def flat_kern(*fargs):
        lead = fargs[:n_lead]
        rest = fargs[n_lead:]
        n_masks = sum(arity)
        masks_flat = rest[:n_masks]
        tail = rest[n_masks:]
        grouped, off = [], 0
        for a in arity:
            grouped.append(tuple(masks_flat[off : off + a]))
            off += a
        return kern(*lead, *grouped, *tail)

    out = pl.pallas_call(
        flat_kern,
        grid=(plan.n_steps,),
        in_specs=in_specs,
        out_specs=vmem_rows(ROWS),
        out_shape=jax.ShapeDtypeStruct(
            (plan.n_steps * ROWS, LANES), dt
        ),
        scratch_shapes=[
            pltpu.VMEM((PR, LANES), dt),
            pltpu.VMEM((ROWS, LANES), dt),
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
