"""Row-localized window arenas for the ESC SpGEMM numeric phase.

The round-2 slab pipeline moved every intermediate product through ONE
global slack-Clos/Benes network (~70 roll+select stages over a 2x-expanded
grid) — the measured 10 ms floor of the 22 ms R-MAT-14 numeric.  But the
products of one C row are CONTIGUOUS in the expansion (a row's A entries
are contiguous; each contributes one contiguous 8-aligned B run), so the
expansion->slab permutation FACTORIZES into independent per-row pieces.
This module bins rows by their arena footprint into power-of-two WINDOWS
(``ops/binning.bin_rows`` — the reference's per-row FLOP classes,
``kernel_spgemm_hash_template.cu:59-235``, driving execution), packs
several rows per window, and routes each window with a width-W Benes:
``2*log2(W)-1`` stages instead of ~70, no slack expansion, no global
transposes.  This is the TPU analog of the reference keeping each row's
hash table in one thread block's shared memory (``HashSpGEMM.hpp:509-700``)
— row locality is what made the GPU version fast.

Within a window, entry slabs (products of one C entry, padded to a power
of two) are laid out in DECREASING size order, which makes every slab base
aligned to its own size (the buddy property).  Unconditional pairwise
halving then computes a level pyramid (L1 = pairs of L0, ...) in ~2 passes
over the data; the total of a size-2^k slab sits at level k, position
base/2^k — garbage elsewhere is never read.  Totals of small slabs
(k <= 2) are contiguous per (window, level) and extracted by the
phase-matched run-copy kernel; larger slabs' level-3 partials (a few % of
products) join the fallback pool — rows too heavy for the largest window
— in the round-2 global-Clos slab machinery, now a small side channel.
One final global Clos assembles C values from the compact extraction
buffer plus the fallback results.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nsparse_tpu.formats.csr import CSR

LANES = 128
WIN_MIN = 512
N_WIN_CLASSES = 7     # widths WIN_MIN << j, j = 0..6 (max 32768)
GAP_CHUNK = 512       # zero-run chunking bounds in-kernel table reads
DEEP_E = 3            # slabs >= 2^DEEP_E reduce to level-3 partials


def _round_up(x: int, m: int) -> int:
    return -(-max(int(x), 0) // m) * m


def _exp_of(lens: np.ndarray) -> np.ndarray:
    """ceil(log2(len)) per entry (len >= 1)."""
    lens = np.maximum(lens, 1)
    e = np.frexp((lens - 1).astype(np.float64))[1]
    return np.where(lens <= 1, 0, e).astype(np.int64)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowStructure:
    """Device routing for the window-arena numeric phase.

    Attributes:
      benes: per active class, the window-local TileBenesPlan.
      extract: RunCopyPlan gathering [compact totals | deep staging] from
        the concatenated level pyramid.
      fb_shuffle: global Clos for the fallback pool ([fb expansion |
        deep staging] -> bin-padded slabs), or None when empty.
      fb_lvl_idx: fallback chunk-level gather indices (as in the round-2
        slab structure).
      asm_shuffle: global Clos assembling c_val from
        [compact | fb res_concat].
      class_geom: static ((base, slots, width, levels), ...) per active
        class — expansion offset, padded slot count, Benes width, pyramid
        depth (1..4).
      fb_levels: static fallback slab classes (((L, cnt), ...), ...).
      fb_off / fb_len: fallback expansion region (offset, length).
      n_compact: length of the compact prefix of the extraction output.
    """

    benes: Tuple
    extract: object
    fb_shuffle: object
    fb_lvl_idx: Tuple
    asm_shuffle: object
    class_geom: Tuple = dataclasses.field(metadata=dict(static=True))
    fb_levels: Tuple = dataclasses.field(metadata=dict(static=True))
    fb_off: int = dataclasses.field(metadata=dict(static=True))
    fb_len: int = dataclasses.field(metadata=dict(static=True))
    n_compact: int = dataclasses.field(metadata=dict(static=True))


def build_window_structure(
    rpt_a: np.ndarray,
    col_a: np.ndarray,
    deg_a: np.ndarray,
    rpt_b: np.ndarray,
    deg_b: np.ndarray,
    apos: np.ndarray,
    bpos: np.ndarray,
    out_pos: np.ndarray,
    ends: np.ndarray,
    c_rpt: np.ndarray,
    p_total: int,
    c_nnz: int,
    c_cap: int,
    m: int,
    nnz_a: int,
    force: bool = False,
):
    """Host-side: build the window structure + its piecewise expansion.

    Returns ``(WindowStructure, PiecewisePlan)`` or None when the layout
    is not applicable (no row fits a window).
    """
    from nsparse_tpu.ops.binning import bin_rows
    from nsparse_tpu.ops.kernels.piecewise import build_piecewise_plan
    from nsparse_tpu.ops.kernels.runcopy import build_runcopy_plan
    from nsparse_tpu.ops.kernels.shuffle_pallas import (
        build_shuffle_plan,
        build_tile_benes,
    )
    from nsparse_tpu.ops.spgemm import _build_slab_structure

    import os
    import time as _time

    _t0 = _time.time()
    _timing = bool(os.environ.get("NSPARSE_WIN_TIMING"))

    def _tick(stage):
        nonlocal _t0
        if _timing:
            now = _time.time()
            print(f"[winplan] {stage}: {now - _t0:.2f}s", flush=True)
            _t0 = now

    if not (p_total and c_nnz):
        return None
    apos = np.asarray(apos, dtype=np.int64)
    bpos = np.asarray(bpos, dtype=np.int64)
    out_pos = np.asarray(out_pos, dtype=np.int64)
    ends = np.asarray(ends[:c_nnz], dtype=np.int64)

    # --- per-entry / per-row stats ------------------------------------
    starts = np.concatenate([[0], ends[:-1] + 1])
    lens = ends - starts + 1
    e_exp = _exp_of(lens)
    slab = (np.int64(1) << e_exp)
    row_of_entry = np.repeat(
        np.arange(m, dtype=np.int64), np.diff(c_rpt).astype(np.int64)
    )
    seg_len = deg_b[col_a]                       # products per A entry
    seg8 = -(-seg_len // 8) * 8
    p8_row = np.bincount(
        np.repeat(np.arange(m, dtype=np.int64), deg_a), weights=seg8,
        minlength=m,
    ).astype(np.int64)
    slab_row = np.bincount(
        row_of_entry, weights=slab, minlength=m
    ).astype(np.int64)
    weight = np.maximum(p8_row, slab_row)

    # --- row classing + per-class packing -----------------------------
    _tick("stats")
    bins = bin_rows(weight, min_size=WIN_MIN, num_bins=N_WIN_CLASSES + 1)
    fb_rows = np.asarray(bins[-1], dtype=np.int64)
    any_window_row = any(
        np.any(weight[np.asarray(b, np.int64)] > 0) for b in bins[:-1]
    )
    if not any_window_row:
        return None

    cls_windows = []   # per class: list of row-id arrays (pack order)
    for j in range(N_WIN_CLASSES):
        W = WIN_MIN << j
        rows = np.asarray(bins[j], dtype=np.int64)
        rows = rows[weight[rows] > 0]
        order = np.argsort(-weight[rows], kind="stable")
        rows = rows[order]
        wins = []
        cur, cp8, csl = [], 0, 0
        for r in rows:
            if cur and (cp8 + p8_row[r] > W or csl + slab_row[r] > W):
                wins.append(np.asarray(cur, np.int64))
                cur, cp8, csl = [], 0, 0
            cur.append(r)
            cp8 += p8_row[r]
            csl += slab_row[r]
        if cur:
            wins.append(np.asarray(cur, np.int64))
        cls_windows.append(wins)

    _tick("packing")
    # --- class geometry (padded with identity windows) ----------------
    active = [j for j in range(N_WIN_CLASSES) if cls_windows[j]]
    class_base = {}
    class_slots = {}
    class_nw_real = {}
    class_nw = {}
    off = 0
    for j in active:
        W = WIN_MIN << j
        n_real = len(cls_windows[j])
        slots = _round_up(n_real * W, max(32768, W))
        class_base[j] = off
        class_slots[j] = slots
        class_nw_real[j] = n_real
        class_nw[j] = slots // W
        off += slots
    fb_base = off

    # window numbering (global, class-major, real windows only) + bases
    win_base = []       # global expansion slot base per real window
    win_width = []
    win_class = []
    win_of_row = np.full(m, -1, np.int64)
    wid = 0
    for j in active:
        W = WIN_MIN << j
        for wl, rows in enumerate(cls_windows[j]):
            win_base.append(class_base[j] + wl * W)
            win_width.append(W)
            win_class.append(j)
            win_of_row[rows] = wid
            wid += 1
    n_wins = wid
    win_base = np.asarray(win_base, np.int64)
    win_width = np.asarray(win_width, np.int64)
    win_class = np.asarray(win_class, np.int64)

    _tick("geometry")
    # --- expansion layout: run placement per A entry -------------------
    # rows in (window, pack) order, then fallback rows
    w_rows = (
        np.concatenate([r for j in active for r in cls_windows[j]])
        if n_wins else np.zeros(0, np.int64)
    )
    row_order = np.concatenate([w_rows, fb_rows])
    # per-row expansion base: within-window (resp. fb-region) running sum
    ord_p8 = p8_row[row_order]
    cse = np.concatenate([[0], np.cumsum(ord_p8)[:-1]])  # exclusive
    grp = np.concatenate([
        win_of_row[w_rows],
        np.full(fb_rows.size, n_wins, np.int64),  # fb pseudo-window
    ])
    gfirst = np.flatnonzero(
        np.diff(np.concatenate([[-1], grp])) != 0
    )
    gcounts = np.diff(np.concatenate([gfirst, [grp.size]]))
    base_of_grp = np.concatenate([win_base, [fb_base]])
    row_base_ord = (
        base_of_grp[grp] + cse - np.repeat(cse[gfirst], gcounts)
    )
    row_base = np.zeros(m, np.int64)
    row_base[row_order] = row_base_ord
    fb_len = int(p8_row[fb_rows].sum())

    # per-A-entry run starts: row base + within-row exclusive cumsum
    cs = np.cumsum(seg8)
    cs_excl = cs - seg8
    row_first = cs_excl[np.minimum(rpt_a[:-1], nnz_a - 1)] if nnz_a else (
        np.zeros(m, np.int64)
    )
    within = cs_excl - np.repeat(row_first, deg_a)
    run_start_ae = np.repeat(row_base, deg_a) + within

    # gap zero-runs: per real window the unused tail, per pad window all
    gap_starts, gap_lens = [], []
    used_w = np.zeros(n_wins, np.int64)
    np.add.at(used_w, win_of_row[w_rows], p8_row[w_rows])
    gs = win_base + used_w
    gl = win_width - used_w
    gap_starts.append(gs[gl > 0])
    gap_lens.append(gl[gl > 0])
    for j in active:  # identity pad windows
        W = WIN_MIN << j
        n_pad = class_nw[j] - class_nw_real[j]
        if n_pad:
            pb = (
                class_base[j]
                + (class_nw_real[j] + np.arange(n_pad, dtype=np.int64)) * W
            )
            gap_starts.append(pb)
            gap_lens.append(np.full(n_pad, W, np.int64))
    gap_starts = np.concatenate(gap_starts)
    gap_lens = np.concatenate(gap_lens)
    # chunk gaps so in-kernel table reads stay bounded
    nch = -(-gap_lens // GAP_CHUNK)
    gch = np.repeat(gap_starts, nch)
    cum = np.concatenate([[0], np.cumsum(nch)[:-1]])
    kin = np.arange(gch.size, dtype=np.int64) - np.repeat(cum, nch)
    gap_run_start = gch + kin * GAP_CHUNK

    _tick("run-placement")
    # --- piecewise expansion plan (aligned-bank mode) ------------------
    deg8 = -(-deg_b // 8) * 8
    rpt8 = np.zeros(deg8.size + 1, dtype=np.int64)
    np.cumsum(deg8, out=rpt8[1:])
    b8_len = int(rpt8[-1])
    rowb = np.repeat(np.arange(deg8.size, dtype=np.int64), deg8)
    off_in = np.arange(b8_len, dtype=np.int64) - rpt8[rowb]
    b8_idx = np.where(off_in < deg_b[rowb], rpt_b[rowb] + off_in, -1)

    # zero-length runs (empty B rows) would TIE with the next run at the
    # same start and can shadow it in the piece enumeration — drop them
    keep = seg8 > 0
    run_start = np.concatenate([run_start_ae[keep], gap_run_start])
    run_boff = np.concatenate([
        rpt8[col_a[keep]], np.zeros(gap_run_start.size, np.int64)
    ])
    run_aidx = np.concatenate([
        np.flatnonzero(keep).astype(np.int64),
        np.full(gap_run_start.size, nnz_a, np.int64),
    ])
    ordr = np.argsort(run_start, kind="stable")
    exp_n = fb_base + fb_len
    pw_plan = build_piecewise_plan(
        run_start[ordr], run_boff[ordr], run_aidx[ordr], exp_n, nnz_a,
        b8_len, b8_idx=b8_idx,
    )

    _tick("piecewise-plan")
    # --- slab layout (decreasing size per window) ----------------------
    win_of_entry = win_of_row[row_of_entry]
    went = np.flatnonzero(win_of_entry >= 0)
    we_win = win_of_entry[went]
    we_exp = e_exp[went]
    order_e = np.lexsort((-we_exp, we_win))
    sorted_ids = went[order_e]
    sizes_sorted = slab[sorted_ids]
    csl = np.cumsum(sizes_sorted) - sizes_sorted  # exclusive
    sw = we_win[order_e]
    sfirst = np.flatnonzero(np.diff(np.concatenate([[-1], sw])) != 0)
    scounts = np.diff(np.concatenate([sfirst, [sw.size]]))
    slab_base = np.full(c_nnz, -1, np.int64)
    slab_base[sorted_ids] = (
        win_base[sw] + csl - np.repeat(csl[sfirst], scounts)
    )
    # rank within the (window, e) group (asm position inside its run)
    ge = sw * 64 + we_exp[order_e]
    gefirst = np.flatnonzero(np.diff(np.concatenate([[-1], ge])) != 0)
    gecounts = np.diff(np.concatenate([gefirst, [ge.size]]))
    rank = np.arange(ge.size, dtype=np.int64) - np.repeat(
        gefirst, gecounts
    )
    rank_of_entry = np.full(c_nnz, -1, np.int64)
    rank_of_entry[sorted_ids] = rank

    _tick("slab-layout")
    # --- Benes permutations per class ----------------------------------
    delta = run_start_ae - rpt_b[col_a]
    exp_p = delta[apos] + bpos  # global expansion position per product
    k_p = out_pos
    sel = win_of_entry[k_p] >= 0
    slot_p = slab_base[k_p] + (np.arange(p_total, dtype=np.int64)
                               - starts[k_p])
    perm = np.full(fb_base, -1, np.int32)
    perm[slot_p[sel]] = exp_p[sel].astype(np.int32)
    used = np.zeros(fb_base, bool)
    used[exp_p[sel]] = True
    empty = np.flatnonzero(perm == -1)
    perm[empty] = np.flatnonzero(~used)  # per-window counts match
    benes = []
    class_geom = []
    win_counts_e = np.zeros((n_wins, 3), np.int64)
    np.add.at(
        win_counts_e,
        (we_win[we_exp <= 2], we_exp[we_exp <= 2]),
        1,
    )
    max_e_w = np.zeros(n_wins, np.int64)
    np.maximum.at(max_e_w, we_win, we_exp)
    for j in active:
        W = WIN_MIN << j
        base, slots = class_base[j], class_slots[j]
        local = (
            perm[base : base + slots].astype(np.int64) - base
        ) % W
        benes.append(build_tile_benes(local.astype(np.int32), W,
                                      force=force))
        cls_wins = np.flatnonzero(win_class == j)
        maxe = int(max_e_w[cls_wins].max()) if cls_wins.size else 0
        levels = 1 + min(3, maxe)
        class_geom.append((base, slots, W, levels))

    _tick("benes-route")
    # --- level pyramid geometry + extraction runs ----------------------
    level_off = {}
    src_off = 0
    for (base, slots, W, levels), j in zip(class_geom, active):
        offs = []
        for k in range(levels):
            offs.append(src_off)
            src_off += slots >> k
        level_off[j] = offs
    n_src = src_off

    slabsum_w = np.zeros(n_wins, np.int64)
    np.add.at(slabsum_w, we_win, slab[went])
    c0 = win_counts_e[:, 0]
    c1 = win_counts_e[:, 1]
    c2 = win_counts_e[:, 2]
    a_ge8 = slabsum_w - c0 - 2 * c1 - 4 * c2
    a_ge4 = a_ge8 + 4 * c2
    a_ge2 = a_ge4 + 2 * c1
    wl_base = win_base - np.array(
        [class_base[j] for j in win_class], np.int64
    )  # window base within its class region
    lv_off = lambda k: np.array(  # noqa: E731
        [level_off[j][k] if k < len(level_off[j]) else -1
         for j in win_class], np.int64
    )
    run_src_by_e = [
        lv_off(0) + wl_base + a_ge2,
        lv_off(1) + wl_base // 2 + a_ge4 // 2,
        lv_off(2) + wl_base // 4 + a_ge8 // 4,
    ]
    run_len_by_e = [c0, c1, c2]
    comp_src, comp_len, comp_we = [], [], []
    for e in range(3):
        sel_r = run_len_by_e[e] > 0
        comp_src.append(run_src_by_e[e][sel_r])
        comp_len.append(run_len_by_e[e][sel_r])
        comp_we.append(
            np.flatnonzero(sel_r) * 4 + e
        )
    deep_sel = a_ge8 > 0
    deep_wins = np.flatnonzero(deep_sel)
    deep_src = (lv_off(3) + wl_base // 8)[deep_wins]
    deep_len = (a_ge8 // 8)[deep_wins]
    comp_src = np.concatenate(comp_src) if comp_src else np.zeros(0,
                                                                  np.int64)
    comp_len = np.concatenate(comp_len)
    comp_we = np.concatenate(comp_we)
    # window-major ordering interleaves levels per window: better dst
    # locality for the assembly Clos is not needed (it is global), so
    # keep (e, window) order — long L0 runs lead, tiny L2 runs trail
    all_src = np.concatenate([comp_src, deep_src])
    all_len = np.concatenate([comp_len, deep_len])
    extract, dst = build_runcopy_plan(all_src, all_len, n_src)
    n_comp_runs = comp_src.size
    dst_comp = dst[:n_comp_runs]
    dst_deep = dst[n_comp_runs:]
    n_compact = int(dst_deep[0]) if dst_deep.size else int(extract.n_out)
    staging_len = int(extract.n_out) - n_compact

    # compact asm position per small (e <= 2) window entry
    run_dst_we = np.full((n_wins, 3), -1, np.int64)
    run_dst_we[comp_we // 4, comp_we % 4] = dst_comp
    small_ids = went[we_exp <= 2]
    asm_small = (
        run_dst_we[win_of_entry[small_ids], e_exp[small_ids]]
        + rank_of_entry[small_ids]
    )

    _tick("extraction")
    # --- fallback pool: fb rows' products + deep slabs' L3 partials ----
    deep_ids = went[we_exp >= DEEP_E]
    fb_entry_ids = np.flatnonzero(win_of_entry < 0)
    fb_shuffle = None
    fb_levels = ()
    fb_lvl_idx = ()
    res_off_fb = 0
    slab_fb = None
    if fb_entry_ids.size or deep_ids.size:
        items = np.concatenate([fb_entry_ids, deep_ids])
        item_lens = np.concatenate([
            lens[fb_entry_ids], np.int64(1) << (e_exp[deep_ids] - DEEP_E)
        ])
        ends_fb = np.cumsum(item_lens) - 1
        p_total_fb = int(item_lens.sum())
        # fb products are plan-order grouped by entry already
        src_fb_prod = (exp_p[~sel] - fb_base).astype(np.int64)
        # deep partials: staging offset + level-3 slab span
        if deep_ids.size:
            dwin = win_of_entry[deep_ids]
            stage_of_win = np.full(n_wins, -1, np.int64)
            stage_of_win[deep_wins] = dst_deep - n_compact
            dl = (np.int64(1) << (e_exp[deep_ids] - DEEP_E))
            dbase = (
                fb_len + stage_of_win[dwin]
                + (slab_base[deep_ids] - win_base[dwin]) // 8
            )
            cumd = np.concatenate([[0], np.cumsum(dl)[:-1]])
            di = np.arange(int(dl.sum()), dtype=np.int64) - np.repeat(
                cumd, dl
            )
            src_deep = np.repeat(dbase, dl) + di
        else:
            src_deep = np.zeros(0, np.int64)
        src_pos_fb = np.concatenate([src_fb_prod, src_deep])

        # zero pool: fb interior run pads + staging slack (runcopy zeroes
        # every non-run slot)
        fb_ae = np.flatnonzero(win_of_row[
            np.repeat(np.arange(m, dtype=np.int64), deg_a)
        ] < 0)
        padc = (seg8 - seg_len)[fb_ae]
        pr = np.repeat(np.arange(fb_ae.size, dtype=np.int64), padc)
        cump = np.concatenate([[0], np.cumsum(padc)[:-1]])
        ki = np.arange(pr.size, dtype=np.int64) - cump[pr]
        fb_interior = (
            run_start_ae[fb_ae[pr]] - fb_base + seg_len[fb_ae[pr]] + ki
        )
        stage_used = np.zeros(staging_len, bool)
        if deep_ids.size:
            su = src_deep - fb_len
            stage_used[su] = True
        pool = np.concatenate([
            fb_interior, fb_len + np.flatnonzero(~stage_used)
        ])
        src_len_fb = fb_len + staging_len
        slab_fb = _build_slab_structure(
            ends_fb, p_total_fb, src_pos_fb, pool, src_len_fb, c_cap,
            targets=items,
        )
        fb_shuffle = build_shuffle_plan(slab_fb["src"])
        fb_levels = slab_fb["levels"]
        fb_lvl_idx = tuple(jnp.asarray(i) for i in slab_fb["lvl_idx"])
        res_off_fb = slab_fb["res_off"]

    _tick("fb-structure")
    # --- assembly permutation ------------------------------------------
    n_res = n_compact + res_off_fb
    n_asm = max(n_res, c_cap)
    asm_src = np.full(n_asm, -1, np.int64)
    asm_src[small_ids] = asm_small
    if slab_fb is not None:
        asm_src[slab_fb["asm_entry"]] = n_compact + slab_fb["asm_pos"]
    used = np.zeros(n_asm, bool)
    used[asm_src[:c_nnz]] = True
    rest = np.flatnonzero(asm_src == -1)
    asm_src[rest] = np.flatnonzero(~used)[: rest.size]
    asm_shuffle = build_shuffle_plan(asm_src.astype(np.int32))

    _tick("asm-route")
    if __import__("os").environ.get("NSPARSE_WIN_DEBUG"):
        global _LAST_DEBUG
        _LAST_DEBUG = dict(
            run_start_ae=run_start_ae, exp_p=exp_p, slot_p=slot_p,
            sel=sel, slab_base=slab_base, win_base=win_base,
            win_of_entry=win_of_entry, e_exp=e_exp, lens=lens,
            starts=starts, dst=dst, n_comp_runs=n_comp_runs,
            comp_we=comp_we, rank_of_entry=rank_of_entry,
            run_dst_we=run_dst_we, fb_base=fb_base, level_off=level_off,
            a_ge2=a_ge2, a_ge4=a_ge4, a_ge8=a_ge8, win_class=win_class,
        )
    win = WindowStructure(
        benes=tuple(benes),
        extract=extract,
        fb_shuffle=fb_shuffle,
        fb_lvl_idx=fb_lvl_idx,
        asm_shuffle=asm_shuffle,
        class_geom=tuple(class_geom),
        fb_levels=fb_levels,
        fb_off=int(fb_base),
        fb_len=int(fb_len),
        n_compact=int(n_compact),
    )
    return win, pw_plan


def spgemm_numeric_window(plan, a: CSR, b: CSR) -> CSR:
    """Window-arena numeric phase (pure jit): expand -> per-window Benes
    -> pairwise level pyramid -> run-copy extraction -> fallback Clos +
    class reductions -> assembly Clos."""
    from nsparse_tpu.ops.kernels.piecewise import piecewise_expand
    from nsparse_tpu.ops.kernels.runcopy import runcopy
    from nsparse_tpu.ops.kernels.shuffle_pallas import (
        planned_shuffle,
        tile_benes_apply,
    )
    from nsparse_tpu.ops.spgemm import slab_class_reduce

    w: WindowStructure = plan.win
    prod = piecewise_expand(plan.pw, a.val, b.val)
    parts = []
    for bp, (base, slots, width, levels) in zip(w.benes, w.class_geom):
        x = tile_benes_apply(bp, prod[base : base + slots])
        parts.append(x)
        for _ in range(1, levels):
            x = x.reshape(-1, 2).sum(axis=1)
            parts.append(x)
    src = jnp.concatenate(parts)
    ext = runcopy(w.extract, src)
    res = ext[: w.n_compact]
    if w.fb_shuffle is not None:
        fb_in = jnp.concatenate(
            [prod[w.fb_off : w.fb_off + w.fb_len], ext[w.n_compact :]]
        )
        fbs = planned_shuffle(w.fb_shuffle, fb_in)
        fb_res = slab_class_reduce(fbs, w.fb_levels, w.fb_lvl_idx)
        res = jnp.concatenate([res, fb_res])
    c_val = planned_shuffle(w.asm_shuffle, res)[: plan.c_capacity]
    c_val = jnp.where(
        jnp.arange(plan.c_capacity) < plan.c_nnz, c_val, 0
    ).astype(a.val.dtype)
    return CSR(
        rpt=plan.c_rpt,
        col=plan.c_col,
        val=c_val,
        shape=plan.shape,
        nnz=plan.c_nnz,
    )
