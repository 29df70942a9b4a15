"""SPMD fused-window SpGEMM over a 1-D mesh: stacked per-shard plans.

The round-3 distributed numeric ran XLA gather + ``segment_sum`` per
shard (``parallel/spgemm.py``) — exactly the primitives the single-chip
window kernels exist to avoid.  This module routes the FUSED WINDOW
numeric (``ops/spgemm_window.py``) through ``shard_map``:

- A is row-sharded, B replicated: SpGEMM is row-wise independent, so
  each device runs the fused window pipeline on its row block and C
  comes out row-sharded with NO collectives (the reference's multi-GPU
  row-split model, one plan per device).
- ``shard_map`` requires ONE traced program, but window plans carry
  data-dependent static geometry (class ladders, step counts, piece
  budgets).  Plans are therefore built per shard with
  ``dist=True`` (width-maximal fold/tier ladders — data-independent
  PYR layouts) and then NORMALIZED to common static shapes: step
  tables pad with inert steps (zero trips / ``cut == end == TILE``
  pieces), Benes masks pad with zeros (identity stages), the merge
  run-copy is REBUILT against the padded arena bases, and per-class
  gather plans pad onto a sacrificial dead tile.  The padded work is
  real but proportional to shard imbalance, not to problem size.
- Rows beyond every window capability ride the segmented-scan side
  channel built by ``dist=True`` (shard-uniform shapes, f64-capable).

The normalized per-shard plans are pytree-stacked on a leading device
axis; inside ``shard_map`` each device peels its slice and calls the
ordinary single-chip ``spgemm_numeric`` — the distributed layer adds
no numeric code of its own.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from nsparse_tpu.formats.csr import CSR
from nsparse_tpu.ops.spgemm import SpgemmPlan, spgemm_numeric, spgemm_plan
from nsparse_tpu.parallel.partition import PartitionedCSR

LANES = 128
TILE = 1024


def _round_up(x: int, m: int) -> int:
    return (max(int(x), 0) + m - 1) // m * m


def _shard_csr(a: PartitionedCSR, d: int) -> CSR:
    return CSR(
        rpt=a.rpt[d], col=a.col[d], val=a.val[d],
        shape=(a.m_loc, a.shape[1]), nnz=int(np.asarray(a.rpt[d])[-1]),
    )


def _pad_rows(x, rows, fill):
    """Pad axis 0 of a host copy of ``x`` to ``rows`` with ``fill``."""
    a = np.asarray(x)
    if a.shape[0] == rows:
        return a
    out = np.full((rows,) + a.shape[1:], fill, a.dtype)
    out[: a.shape[0]] = a
    return out


def _pad1(x, n, fill):
    a = np.asarray(x).reshape(-1)
    if a.shape[0] == n:
        return a
    out = np.full(n, fill, a.dtype)
    out[: a.shape[0]] = a
    return out


# --------------------------------------------------------------------------
# flat-gather plan normalization
# --------------------------------------------------------------------------


def _stack_flat_gather(plans):
    """Normalize FlatGatherPlans to one static geometry.

    idx2d pads to a common tile count plus ONE dead tile (all -1 -> zero
    output); class ladders union (builder order: band ascending, then
    win ascending); per-class id lists pad with the dead tile id."""
    from nsparse_tpu.ops.kernels.flat_gather import (
        WIN_SUB, FlatGatherPlan,
    )

    t_max = max(int(p.idx2d.shape[0]) for p in plans)
    dead = t_max  # one sacrificial tile all plans share
    bands = sorted({c for p in plans for c in p.classes if c[0] == "band"},
                   key=lambda c: c[1])
    wins = sorted({c for p in plans for c in p.classes if c[0] == "win"},
                  key=lambda c: c[1])
    classes = tuple(bands + wins)
    n_common = max(int(p.n) for p in plans)
    out = []
    for p in plans:
        idx2d = _pad_rows(p.idx2d, t_max + 1, -1)
        by_cls = dict(zip(p.classes, zip(p.ids, p.bases)))
        out.append((idx2d, by_cls))
    # per-class max id counts across plans
    cnt = {c: 0 for c in classes}
    for p in plans:
        for c, ids, _ in zip(p.classes, p.ids, p.bases):
            cnt[c] = max(cnt[c], int(np.asarray(ids).shape[0]))
    fb_max = max(int(np.asarray(p.fb_ids).shape[0]) for p in plans)
    norm = []
    for p, (idx2d, by_cls) in zip(plans, out):
        ids_l, bases_l = [], []
        for c in classes:
            ids, bases = by_cls.get(
                c, (np.zeros(0, np.int32), np.zeros(0, np.int32))
            )
            ids = _pad1(ids, cnt[c], dead)
            nb = cnt[c] * (WIN_SUB if c[0] == "win" else 1)
            bases = _pad1(bases, nb, 0)
            ids_l.append(jnp.asarray(ids))
            bases_l.append(jnp.asarray(bases))
        norm.append(FlatGatherPlan(
            idx2d=jnp.asarray(idx2d),
            ids=tuple(ids_l),
            bases=tuple(bases_l),
            fb_ids=jnp.asarray(_pad1(p.fb_ids, fb_max, dead)),
            classes=classes,
            n=n_common,
        ))
    return norm


# --------------------------------------------------------------------------
# fused-class plan normalization
# --------------------------------------------------------------------------


def _repack_steps(arr, rps, n_steps_new, fill):
    """Pad a per-step table (``rps`` rows per step) to ``n_steps_new``
    steps."""
    return _pad_rows(np.asarray(arr), rps * n_steps_new, fill)


def _repack_j2(tbl, n_steps, j2_old, j2_new, fill):
    """Piece tables are (n_steps*8, j2/8) blocks whose row-major flatten
    per step is piece order; re-lay for a larger j2 budget."""
    a = np.asarray(tbl).reshape(n_steps, j2_old)
    out = np.full((n_steps, j2_new), fill, a.dtype)
    out[:, :j2_old] = a
    return out.reshape(n_steps * 8, j2_new // 8)


def _normalize_fused(per_shard, bank_rows_old, bank_rows_new):
    """Normalize one width class's FusedClassPlan across shards.

    ``per_shard``: list of FusedClassPlan or None (shard lacks the
    class).  Returns the normalized list (never None)."""
    import dataclasses as dc

    from nsparse_tpu.ops.kernels.window_fused import FusedClassPlan

    ref = next(p for p in per_shard if p is not None)
    if any(p is not None and (p.levels != ref.levels
                              or p.tier_meta != ref.tier_meta
                              or p.lv != ref.lv)
           for p in per_shard):
        raise AssertionError(
            "dist window plans must share PYR layouts (dist=True builds)"
        )
    ns = max(p.n_steps for p in per_shard if p is not None)
    jc = max(p.j_cap for p in per_shard if p is not None)
    j2 = max(p.j2_cap for p in per_shard if p is not None)
    W, BLK = ref.w, ref.blk
    SUBS = BLK // TILE
    ROWS = BLK // LANES
    out = []
    apv_len = ns * j2
    for p, bro in zip(per_shard, bank_rows_old):
        if p is None:
            z = np.zeros
            p = dc.replace(
                ref,
                trips=jnp.asarray(z((0, 8), np.int32)),
                cuts=jnp.asarray(z((0, ref.j_cap), np.int32)),
                ends=jnp.asarray(z((0, ref.j_cap), np.int32)),
                srows=jnp.asarray(z((0, ref.j_cap), np.int32)),
                emo=jnp.asarray(z((0, LANES), np.int32)),
                emt=jnp.asarray(z((0, LANES), np.int32)),
                etrips=jnp.asarray(z((0, 8), np.int32)),
                ecuts=jnp.asarray(z((0, ref.j2_cap // 8), np.int32)),
                eboffs=jnp.asarray(z((0, ref.j2_cap // 8), np.int32)),
                eends=jnp.asarray(z((0, ref.j2_cap // 8), np.int32)),
                m1o=jnp.asarray(z((0, LANES), np.int32)),
                m1t=jnp.asarray(z((0, LANES), np.int32)),
                tier_masks=tuple(
                    tuple(jnp.asarray(z((0, LANES), np.int32))
                          for _ in tm)
                    for tm in ref.tier_masks
                ),
                n_steps=0, slots=0,
            )
            bro = bank_rows_new
        nso = p.n_steps
        # piece/extraction tables
        trips = _repack_steps(p.trips, SUBS, ns, 0)
        cuts = _pad_rows(
            np.pad(np.asarray(p.cuts), ((0, 0), (0, jc - p.j_cap)),
                   constant_values=TILE),
            ns * SUBS, TILE,
        )
        ends = _pad_rows(
            np.pad(np.asarray(p.ends), ((0, 0), (0, jc - p.j_cap)),
                   constant_values=TILE),
            ns * SUBS, TILE,
        )
        srows = _pad_rows(
            np.pad(np.asarray(p.srows), ((0, 0), (0, jc - p.j_cap)),
                   constant_values=0),
            ns * SUBS, 0,
        )
        # expansion tables: re-lay j2 budget, then pad steps; recode the
        # bank-row codes for the common bank height
        etrips = _repack_steps(p.etrips, SUBS, ns, 0)
        ecuts = np.asarray(p.ecuts)
        eboffs = np.asarray(p.eboffs)
        if nso:
            ecuts = _repack_j2(ecuts, nso, p.j2_cap, j2, TILE)
            eends = _repack_j2(
                np.asarray(p.eends), nso, p.j2_cap, j2, TILE
            )
            eb = np.asarray(p.eboffs)
            phase, row = eb // bro, eb % bro
            eb = phase * bank_rows_new + row
            eboffs = _repack_j2(eb, nso, p.j2_cap, j2, 0)
        else:
            ecuts = np.zeros((0, j2 // 8), np.int32)
            eboffs = np.zeros((0, j2 // 8), np.int32)
            eends = np.zeros((0, j2 // 8), np.int32)
        ecuts = _pad_rows(ecuts, ns * 8, TILE)
        eboffs = _pad_rows(eboffs, ns * 8, 0)
        eends = _pad_rows(eends, ns * 8, TILE)
        # masks: zero rows = identity stages on zero data
        emo = _pad_rows(p.emo, ns * ROWS, 0)
        emt = _pad_rows(p.emt, ns * ROWS, 0)
        m1o = _pad_rows(p.m1o, ns * ROWS, 0)
        m1t = _pad_rows(p.m1t, ns * ROWS, 0)
        tms = []
        for (v_in, V, mode), masks in zip(ref.tier_meta, p.tier_masks):
            t_rows = (BLK // W) * V // LANES
            tms.append(tuple(
                jnp.asarray(_pad_rows(m_, ns * t_rows, 0)) for m_ in masks
            ))
        out.append(dc.replace(
            p,
            trips=jnp.asarray(trips), cuts=jnp.asarray(cuts),
            ends=jnp.asarray(ends), srows=jnp.asarray(srows),
            emo=jnp.asarray(emo), emt=jnp.asarray(emt),
            etrips=jnp.asarray(etrips), ecuts=jnp.asarray(ecuts),
            eboffs=jnp.asarray(eboffs), eends=jnp.asarray(eends),
            m1o=jnp.asarray(m1o), m1t=jnp.asarray(m1t),
            tier_masks=tuple(tms),
            j_cap=jc, j2_cap=j2, n_steps=ns, slots=ns * BLK,
        ))
    return out, apv_len


# --------------------------------------------------------------------------
# the stacked plan
# --------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistWindowPlan:
    """Stacked (leading device axis) normalized window plans."""

    plan: object               # SpgemmPlan pytree, arrays (D, ...)
    c_nnz_d: jax.Array         # (D, 1) true output nnz per shard
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    m_loc: int = dataclasses.field(metadata=dict(static=True))
    c_nnz: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    n_products: int = dataclasses.field(metadata=dict(static=True))

    @property
    def flops(self) -> int:
        return 2 * self.n_products

    @property
    def c_capacity(self) -> int:
        return int(self.plan.c_col.shape[1])


def spgemm_plan_dist_window(a: PartitionedCSR, b: CSR) -> DistWindowPlan:
    """Build per-shard fused-window plans (``dist=True``) and normalize
    them to one static geometry (module docstring)."""
    import dataclasses as dc

    from nsparse_tpu.ops.kernels.runcopy import build_runcopy_plan
    from nsparse_tpu.ops.spgemm_window import WindowStructure

    d_n = a.n_shards
    plans, extras = [], []
    for d in range(d_n):
        ex = {}
        p = spgemm_plan(
            _shard_csr(a, d), b, shuffle=True, layout="window",
            dist=True, extras_out=ex,
        )
        if p.win is None or not p.win.fused_expand:
            raise NotImplementedError(
                "spgemm_plan_dist_window requires fused-expand window "
                "plans on every shard (shard too small or bank too "
                "large); use spgemm_plan_dist for the scan path"
            )
        plans.append(p)
        extras.append(ex)

    # --- common geometry ------------------------------------------------
    widths = sorted({fp.w for p in plans for fp in p.win.fused})
    bank_rows_old = [p.win.bank_rows for p in plans]
    bank_rows = max(bank_rows_old)
    c_cap = max(p.c_capacity for p in plans)
    n_out = _round_up(c_cap, TILE) + 8 * TILE  # + sacrificial supertile
    fb_seg = max(ex["fb_seg"] for ex in extras)

    by_width = {
        w: [next((fp for fp in p.win.fused if fp.w == w), None)
            for p in plans]
        for w in widths
    }
    fused_norm = {}
    apv_lens = {}
    for w in widths:
        fused_norm[w], apv_lens[w] = _normalize_fused(
            by_width[w], bank_rows_old, bank_rows
        )
    # padded class arena bases (class order = ascending width, matching
    # the builder's class-major arena)
    new_base = {}
    cur = 0
    for w in widths:
        new_base[w] = cur
        cur += fused_norm[w][0].slots
    arena_len = cur

    # apv layout: per class, padded length; recompute lo/hi
    apv_off = {}
    cur = 0
    for w in widths:
        apv_off[w] = cur
        cur += apv_lens[w]
    apv_total = cur
    for w in widths:
        fused_norm[w] = [
            dc.replace(fp, apv_lo=apv_off[w], apv_hi=apv_off[w] + apv_lens[w])
            for fp in fused_norm[w]
        ]

    # --- per-shard rebuilds ----------------------------------------------
    from nsparse_tpu.ops.kernels.flat_gather import build_flat_gather_plan

    new_plans = []
    apv_gps, b8_gps, merges = [], [], []
    nnzb8_max = 0
    b8_idx_all = []
    for p, ex in zip(plans, extras):
        # padded eaidx per class -> common apv layout
        ea_parts = []
        for w in widths:
            fp_old = next(
                (fp for fp in p.win.fused if fp.w == w), None
            )
            if fp_old is None or fp_old.n_steps == 0:
                ea_parts.append(np.full(apv_lens[w], -1, np.int32))
                continue
            ci = [fp.w for fp in p.win.fused].index(w)
            ea = ex["eaidx_cls"][ci].reshape(fp_old.n_steps, fp_old.j2_cap)
            out = np.full(
                (apv_lens[w] // max(fused_norm[w][0].j2_cap, 1),
                 fused_norm[w][0].j2_cap), -1, np.int32,
            )
            out[: fp_old.n_steps, : fp_old.j2_cap] = ea
            ea_parts.append(out.reshape(-1))
        b8 = np.asarray(ex["b8_idx"], np.int32)
        b8_idx_all.append(b8)
        nnzb8_max = max(nnzb8_max, b8.shape[0])
        ea_cat = np.concatenate(ea_parts) if ea_parts else np.zeros(
            0, np.int32
        )
        apv_gps.append(build_flat_gather_plan(ea_cat))

        # merge rebuild against padded bases (classify on the UNSHIFTED
        # src: a shifted run must not match a later class's old range)
        src0 = np.asarray(ex["mrg_src"], np.int64)
        src = src0.copy()
        old_bases = ex["class_bases"]
        old_widths = ex["class_widths"]
        old_slots = [
            next(fp for fp in p.win.fused if fp.w == w).slots
            for w in old_widths
        ]
        fb_base_old = ex["arena_len"]
        in_fb = src0 >= fb_base_old
        for ob, w_, osl in zip(old_bases, old_widths, old_slots):
            sel = (~in_fb) & (src0 >= ob) & (src0 < ob + osl)
            src[sel] = src0[sel] + (new_base[w_] - ob)
        src[in_fb] = src0[in_fb] + (arena_len - fb_base_old)
        merge, _ = build_runcopy_plan(
            src, np.asarray(ex["mrg_len"], np.int64),
            arena_len + fb_seg,
            dst=np.asarray(ex["mrg_dst"], np.int64), n_out=n_out,
        )
        merges.append(merge)

    for b8 in b8_idx_all:
        b8_gps.append(
            build_flat_gather_plan(_pad1(b8, nnzb8_max, -1))
        )
    apv_gps = _stack_flat_gather(apv_gps)
    b8_gps = _stack_flat_gather(b8_gps)
    merges = _stack_runcopy(merges, n_out)

    # fb scan arrays to common shapes
    fb_lens = [
        (int(p.win.fb_scan[0].shape[0]) if p.win.fb_scan is not None else 0)
        for p in plans
    ]
    fb_p = max(fb_lens + [0])
    fb_e = max(
        (int(p.win.fb_scan[3].shape[0]) if p.win.fb_scan is not None
         else 0)
        for p in plans
    )
    any_fb = fb_p > 0 or fb_seg > 0

    n_products = sum(p.n_products for p in plans)
    for di, (p, apv_gp, b8_gp, merge) in enumerate(
        zip(plans, apv_gps, b8_gps, merges)
    ):
        w0 = p.win
        if any_fb:
            if w0.fb_scan is not None:
                fa, fbp, ff, fe, fpl = (np.asarray(x) for x in w0.fb_scan)
            else:
                fa = np.zeros(0, np.int32)
                fbp = np.zeros(0, np.int32)
                ff = np.zeros(0, bool)
                fe = np.zeros(0, np.int32)
                fpl = np.zeros(0, np.int32)
            fb_scan = tuple(jnp.asarray(x) for x in (
                _pad1(fa, fb_p, 0), _pad1(fbp, fb_p, 0),
                _pad1(ff, max(fb_p, 1), True),
                _pad1(fe, max(fb_e, 1), 0), _pad1(fpl, fb_seg, -1),
            ))
        else:
            fb_scan = None
        win = dataclasses.replace(
            w0,
            fused=tuple(fused_norm[w][di] for w in widths),
            merge=merge,
            b8_gp=b8_gp,
            apv_gp=apv_gp,
            fb_scan=fb_scan,
            fb_shuffle=None,
            fb_lvl_idx=(),
            fb_perm=None,
            class_geom=tuple(
                (new_base[w], fused_norm[w][0].slots, w, 3)
                for w in widths
            ),
            tier_geom=tuple(() for _ in widths),
            fb_levels=(),
            fb_off=0,
            fb_len=0,
            n_compact=arena_len,
            bank_rows=bank_rows,
        )
        new_plans.append(dc.replace(
            p,
            pw=None,
            cmp_masks=None,
            win=win,
            c_col=jnp.asarray(_pad1(np.asarray(p.c_col), c_cap, 0)),
            c_nnz=c_cap,          # common static; true nnz is dynamic
            n_products=n_products,
            shape=(a.m_loc, b.shape[1]),
        ))

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *new_plans)
    return DistWindowPlan(
        plan=stacked,
        c_nnz_d=jnp.asarray(
            np.array([[p.c_nnz] for p in plans], np.int32)
        ),
        shape=(a.shape[0], b.shape[1]),
        m_loc=a.m_loc,
        c_nnz=tuple(p.c_nnz for p in plans),
        n_products=n_products,
    )


def _stack_runcopy(merges, n_out):
    """Normalize fixed-destination RunCopyPlans: flat-idx plans pad with
    -1; class plans union the class ladder and pad per-class step lists
    onto the sacrificial trailing supertile."""
    import dataclasses as dc

    if any(m.flat_idx is not None for m in merges):
        fi_len = n_out
        out = []
        for m in merges:
            fi = (np.asarray(m.flat_idx) if m.flat_idx is not None
                  else np.zeros(0, np.int32))
            out.append(dc.replace(
                m,
                flat_idx=jnp.asarray(_pad1(fi, fi_len, -1)),
                ids=(), blk=(), off=(), cut=(), end=(), classes=(),
                fb_ids=jnp.zeros((0,), jnp.int32),
                fb_idx=jnp.zeros((0,), jnp.int32),
                n_out=n_out,
            ))
        return out

    classes = []
    for m in merges:
        for c in m.classes:
            if c not in classes:
                classes.append(c)
    dead_super = n_out // (8 * TILE) - 1  # the sacrificial supertile
    cnt = {c: 0 for c in classes}
    fbmax = 0
    for m in merges:
        for c, ids in zip(m.classes, m.ids):
            cnt[c] = max(cnt[c], int(np.asarray(ids).shape[0]))
        fbmax = max(fbmax, int(np.asarray(m.fb_ids).shape[0]))
    out = []
    for m in merges:
        by = dict(zip(m.classes, zip(m.ids, m.blk, m.off, m.cut, m.end)))
        ids_l, blk_l, off_l, cut_l, end_l = [], [], [], [], []
        for c in classes:
            n_c = cnt[c]
            if c in by:
                ids, blk, off, cut, end = (np.asarray(x) for x in by[c])
            else:
                ids = np.zeros((0,), np.int32)
                blk = off = cut = end = None
            idsp = _pad1(ids, n_c, dead_super)

            # per-step aux tables scale with the ids count on axis 0;
            # derive rows-per-step from a donor plan that has the class
            donor = next(m2 for m2 in merges if c in m2.classes
                         and int(np.asarray(dict(zip(
                             m2.classes, m2.ids))[c]).shape[0]))
            dby = dict(zip(donor.classes,
                           zip(donor.ids, donor.blk, donor.off,
                               donor.cut, donor.end)))
            d_ids, d_blk, d_off, d_cut, d_end = (
                np.asarray(x) for x in dby[c]
            )
            dn = d_ids.shape[0]

            def fit(x, d_x, fill):
                if x is None:
                    x = np.zeros((0,) + d_x.shape[1:], d_x.dtype) \
                        if d_x.ndim > 1 else np.zeros(0, d_x.dtype)
                x = np.asarray(x)
                rps = (d_x.shape[0] // dn) if dn else 1
                return _pad_rows(x, rps * n_c, fill)

            blk_l.append(jnp.asarray(fit(blk, d_blk, 0)))
            off_l.append(jnp.asarray(fit(off, d_off, 0)))
            cut_l.append(jnp.asarray(fit(cut, d_cut, TILE)))
            end_l.append(jnp.asarray(fit(end, d_end, TILE)))
            ids_l.append(jnp.asarray(idsp))
        out.append(dc.replace(
            m,
            ids=tuple(ids_l), blk=tuple(blk_l), off=tuple(off_l),
            cut=tuple(cut_l), end=tuple(end_l), classes=tuple(classes),
            fb_ids=jnp.asarray(_pad1(m.fb_ids, fbmax, dead_super * 8)),
            fb_idx=jnp.asarray(_pad1(
                m.fb_idx, fbmax * 8 * LANES, -1
            )) if fbmax else m.fb_idx,
            n_out=n_out,
        ))
    return out


def _steps_rows(x, n_old, n_new):
    rps = (np.asarray(x).shape[0] // n_old) if n_old else 1
    return rps * n_new


def spgemm_numeric_dist_window(
    dp: DistWindowPlan,
    a: PartitionedCSR,
    b: CSR,
    mesh: Mesh,
    axis: str = "x",
):
    """SPMD numeric: each device peels its normalized plan slice and runs
    the single-chip fused-window numeric; C comes out row-sharded."""

    def shard_fn(stk, c_nnz_d, a_rpt, a_col, a_val, b_rpt, b_col, b_val):
        local = jax.tree.map(lambda x: x[0], stk)
        a_loc = CSR(
            rpt=a_rpt[0], col=a_col[0], val=a_val[0],
            shape=(dp.m_loc, b.shape[0]),
            nnz=int(a.capacity),
        )
        b_loc = CSR(rpt=b_rpt, col=b_col, val=b_val, shape=b.shape,
                    nnz=b.nnz)
        c = spgemm_numeric(local, a_loc, b_loc)
        val = jnp.where(
            jnp.arange(c.val.shape[0], dtype=jnp.int32) < c_nnz_d[0, 0],
            c.val, 0,
        )
        return val[None]

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(), P(), P()),
        out_specs=P(axis),
        # pallas_call out_shapes carry no vma annotation; the body is
        # per-shard-local (no collectives), so the vma check adds nothing
        check_vma=False,
    )
    c_val = fn(dp.plan, dp.c_nnz_d, a.rpt, a.col, a.val,
               b.rpt, b.col, b.val)
    return PartitionedCSR(
        rpt=dp.plan.c_rpt,
        col=dp.plan.c_col,
        val=c_val,
        shape=dp.shape,
        m_loc=dp.m_loc,
        nnz=sum(dp.c_nnz),
    )
