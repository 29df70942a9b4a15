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

Within a window, entries are classed by product count into K in
{1, 2, 4, 8} (the reference's FLOP classes at output-entry granularity)
and each class region is laid out MEMBER-MINOR: element t of entry s at
``base + t*stride + s`` (stride = the class member count).  An entry's
total is then the sum of K lane-ALIGNED contiguous reads — the run-copy
kernel folds them with a handful of flat-aligned adds per piece, no lane
compaction, no strided lowering, no level pyramid.  Entries with more
than 8 products reduce the same way to ceil(len/8) level-3 partials that
join the fallback pool — rows too heavy for the largest window — in the
round-2 global-Clos slab machinery, now a small side channel.  One final
global Clos assembles C values from the compact extraction buffer plus
the fallback results.
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
GAP_CHUNK = 1024      # zero-run chunking bounds in-kernel table reads
# entry classes by product count: K-fold extraction classes + deep
CLS_K = (1, 2, 4)               # len 1 / 2 / 3..4
DEEP = 3                        # class code for len >= 5 (partials -> pool)
FF_WINDOW = 64                  # bounded first-fit lookback (packing)


def _round_up(x: int, m: int) -> int:
    return -(-max(int(x), 0) // m) * m


def _cls_of(lens: np.ndarray) -> np.ndarray:
    """Entry class code: 0..2 for K = 1/2/4, DEEP for len >= 5 (one
    8-fold partial per 8 products; a 5..8-product entry's single partial
    IS its total and flows through the pool as a unit item)."""
    return np.where(
        lens <= 1, 0,
        np.where(lens <= 2, 1, np.where(lens <= 4, 2, DEEP)),
    ).astype(np.int64)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowStructure:
    """Device routing for the window-arena numeric phase.

    Attributes:
      benes: per active class, the window-local TileBenesPlan.
      extract: K-fold reducing RunCopyPlan gathering [compact totals |
        deep staging] straight from the concatenated Benes outputs.
      fb_shuffle: global Clos for the fallback pool ([fb expansion |
        deep staging] -> bin-padded slabs), or None when empty.
      fb_lvl_idx: fallback chunk-level gather indices (as in the round-2
        slab structure).
      asm_shuffle: global Clos assembling c_val from
        [compact | fb res_concat].
      class_geom: static ((base, slots, width), ...) per active class —
        expansion offset, padded slot count, Benes width.
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
    ecls = _cls_of(lens)
    units = np.where(ecls == DEEP, -(-lens // 8), 1)  # deep: ceil(len/8)
    kfac_e = np.where(
        ecls == DEEP, 8, np.array(CLS_K)[np.minimum(ecls, 2)]
    )
    slot_cost = kfac_e * units                        # window slots used
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
        row_of_entry, weights=slot_cost, minlength=m
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
        # bounded first-fit decreasing: scan the last FF_WINDOW open
        # windows for space (next-fit leaves ~35% of slots dead when
        # weights span (W/2, W])
        wins, wp8, wsl = [], [], []
        p8v = p8_row[rows]
        slv = slab_row[rows]
        for i in range(rows.size):
            placed = False
            for wi in range(max(0, len(wins) - FF_WINDOW), len(wins)):
                if wp8[wi] + p8v[i] <= W and wsl[wi] + slv[i] <= W:
                    wins[wi].append(rows[i])
                    wp8[wi] += p8v[i]
                    wsl[wi] += slv[i]
                    placed = True
                    break
            if not placed:
                wins.append([rows[i]])
                wp8.append(p8v[i])
                wsl.append(slv[i])
        cls_windows.append([np.asarray(ws, np.int64) for ws in wins])

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

    win_base = []
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
    w_rows = (
        np.concatenate([r for j in active for r in cls_windows[j]])
        if n_wins else np.zeros(0, np.int64)
    )
    fb_len = int(p8_row[fb_rows].sum())
    # per-run placement, runs of a window sorted by DESCENDING length:
    # the expansion kernel's piece budget is a per-supertile class (one
    # run-dense subtile drags 8 subtiles to a high-J class), so
    # clustering short runs together concentrates the high-J cost on few
    # supertiles; the Benes absorbs any in-window order.  Fallback rows
    # keep A-entry-major order (the pool's padding math relies on it).
    row_of_ae = np.repeat(np.arange(m, dtype=np.int64), deg_a)
    g_ae = win_of_row[row_of_ae]
    g_ae = np.where(g_ae < 0, n_wins, g_ae)
    aeid = np.arange(nnz_a, dtype=np.int64)
    lkey = np.where(g_ae == n_wins, 0, -seg8)
    ordae = np.lexsort((aeid, lkey, g_ae))
    sg = seg8[ordae]
    cs2 = np.cumsum(sg) - sg
    gso = g_ae[ordae]
    gfirst = np.flatnonzero(np.diff(np.concatenate([[-1], gso])) != 0)
    gcounts = np.diff(np.concatenate([gfirst, [gso.size]]))
    base_of_grp = np.concatenate([win_base, [fb_base]])
    run_start_sorted = (
        base_of_grp[gso] + cs2 - np.repeat(cs2[gfirst], gcounts)
    )
    run_start_ae = np.empty(nnz_a, np.int64)
    run_start_ae[ordae] = run_start_sorted

    # gap zero-runs: per real window the unused tail, per pad window all
    gap_starts, gap_lens = [], []
    used_w = np.zeros(n_wins, np.int64)
    np.add.at(used_w, win_of_row[w_rows], p8_row[w_rows])
    gs = win_base + used_w
    gl = win_width - used_w
    gap_starts.append(gs[gl > 0])
    gap_lens.append(gl[gl > 0])
    for j in active:
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
    # --- fold-slot (sigma) allocation per (window, class) --------------
    # The Benes output folds in halves per window (F_{k+1}[i] = F_k[i] +
    # F_k[i + W/2^{k+1}], contiguous adds at memory speed); a K-class
    # entry allocated fold slot sigma at level log2(K) owns the F0
    # footprint {sigma + t*W/K} and its total appears at F_{log2 K}[sigma].
    # Slots allocate top-down (deep L3, K4 at L2, K2 at L1, singles L0):
    # each class gets at most 2^level ascending intervals per window, so
    # every total lands in a CONTIGUOUS run of its fold array.
    win_of_entry = win_of_row[row_of_entry]
    went = np.flatnonzero(win_of_entry >= 0)
    we_win = win_of_entry[went]
    we_cls = ecls[went]
    cnt_wc = np.zeros((n_wins, 4), np.int64)
    np.add.at(cnt_wc, (we_win, we_cls), units[went])
    c0w = cnt_wc[:, 0]
    c1w = cnt_wc[:, 1]
    c2w = cnt_wc[:, 2]
    uw = cnt_wc[:, DEEP]
    w8 = win_width // 8
    w4 = win_width // 4
    w2 = win_width // 2

    def _take(starts_, lens_, need):
        cum = np.cumsum(lens_, axis=1)
        prev = np.concatenate(
            [np.zeros((n_wins, 1), np.int64), cum[:, :-1]], axis=1
        )
        al = np.clip(need[:, None] - prev, 0, lens_)
        return al, prev, starts_ + al, lens_ - al

    def _by_capacity(starts_, lens_):
        # fill the largest interval first: most windows then use ONE
        # interval per class, and every interval is one extraction run —
        # run count (hence phase-slack, extraction subtiles, and the
        # assembly-Clos width) scales with it
        o = np.argsort(-lens_, axis=1, kind="stable")
        return (
            np.take_along_axis(starts_, o, 1),
            np.take_along_axis(lens_, o, 1),
        )

    # deep units END-PACKED at L3 ([w8-U, w8)): the free region below is
    # one contiguous interval instead of two fragments
    s2 = np.stack([np.zeros(n_wins, np.int64), w8], axis=1)
    l2 = np.stack([w8 - uw, w8 - uw], axis=1)
    a2, p2, rs2, rl2 = _take(s2, l2, c2w)
    s1, l1 = _by_capacity(
        np.concatenate([rs2, rs2 + w4[:, None]], axis=1),
        np.concatenate([rl2, rl2], axis=1),
    )
    a1, p1, rs1, rl1 = _take(s1, l1, c1w)
    s0, l0 = _by_capacity(
        np.concatenate([rs1, rs1 + w2[:, None]], axis=1),
        np.concatenate([rl1, rl1], axis=1),
    )
    a0, p0, rs0, rl0 = _take(s0, l0, c0w)
    cls_ivs = {0: (s0, a0, p0), 1: (s1, a1, p1), 2: (s2, a2, p2)}

    # member rank within the (window, class) group
    order_e = np.lexsort((we_cls, we_win))
    sorted_ids = went[order_e]
    gkey = we_win[order_e] * 4 + we_cls[order_e]
    gfirst2 = np.flatnonzero(np.diff(np.concatenate([[-1], gkey])) != 0)
    gcounts2 = np.diff(np.concatenate([gfirst2, [gkey.size]]))
    u_sorted = units[sorted_ids]
    ucum = np.cumsum(u_sorted) - u_sorted
    rank = ucum - np.repeat(ucum[gfirst2], gcounts2)
    rank_of_entry = np.full(c_nnz, -1, np.int64)
    rank_of_entry[sorted_ids] = rank

    # sigma + interval id per entry (rank mapped through the intervals):
    # pv_ rows are the ascending per-window allocation prefix, so the
    # interval id is one vectorized rank-vs-prefix comparison (the old
    # per-interval masked passes were ~half the slab-layout cost)
    sigma_of_entry = np.full(c_nnz, -1, np.int64)
    iv_of_entry = np.full(c_nnz, -1, np.int64)
    for cls in (0, 1, 2):
        ids = went[we_cls == cls]
        if not ids.size:
            continue
        wv_ = win_of_entry[ids]
        rr = rank_of_entry[ids]
        st_, al_, pv_ = cls_ivs[cls]
        iv = (rr[:, None] >= pv_[wv_]).sum(axis=1) - 1
        iv = np.minimum(iv, st_.shape[1] - 1)
        sigma_of_entry[ids] = st_[wv_, iv] + rr - pv_[wv_, iv]
        iv_of_entry[ids] = iv
    deep_ids0 = went[we_cls == DEEP]
    dwin0 = win_of_entry[deep_ids0]  # L3 end-packed: [w8 - U, w8)
    sigma_of_entry[deep_ids0] = (
        w8[dwin0] - uw[dwin0] + rank_of_entry[deep_ids0]
    )
    iv_of_entry[deep_ids0] = 0

    _tick("slab-layout")
    # --- Benes permutations per class ----------------------------------
    delta = run_start_ae - rpt_b[col_a]
    exp_p = delta[apos] + bpos  # global expansion position per product
    k_p = out_pos
    sel = win_of_entry[k_p] >= 0
    t_p = np.arange(p_total, dtype=np.int64) - starts[k_p]
    wv = np.maximum(win_of_entry[k_p], 0)
    cv = ecls[k_p]
    sig_p = sigma_of_entry[k_p]
    is_deep = cv == DEEP
    # fold stride W / K; deep: unit sigma + within-unit t over stride W/8
    fold_stride = win_width[wv] >> np.minimum(cv, 2).astype(np.int64)
    fold_stride = np.where(is_deep, win_width[wv] >> 3, fold_stride)
    tt = np.where(is_deep, t_p % 8, t_p)
    sig_full = np.where(is_deep, sig_p + t_p // 8, sig_p)
    slot_p = win_base[wv] + sig_full + tt * fold_stride
    perm = np.full(fb_base, -1, np.int32)
    perm[slot_p[sel]] = exp_p[sel].astype(np.int32)
    used = np.zeros(fb_base, bool)
    used[exp_p[sel]] = True
    empty = np.flatnonzero(perm == -1)
    perm[empty] = np.flatnonzero(~used)  # per-window counts match
    benes = []
    class_geom = []
    lvl_need = {}
    for j in active:
        W = WIN_MIN << j
        base, slots = class_base[j], class_slots[j]
        local = (
            perm[base : base + slots].astype(np.int64) - base
        ) % W
        benes.append(build_tile_benes(local.astype(np.int32), W,
                                      force=force))
        wins_j = np.flatnonzero(win_class == j)
        lv = 0
        if np.any(c1w[wins_j] > 0):
            lv = 1
        if np.any(c2w[wins_j] > 0):
            lv = 2
        if np.any(uw[wins_j] > 0):
            lv = 3
        lvl_need[j] = lv
        class_geom.append((base, slots, W, lv))

    _tick("benes-route")
    # --- extraction runs: contiguous K=1 reads of the fold arrays ------
    # fold-array concat layout: per class, [F0 | F1 | .. | F_lv]
    level_off = {}
    src_off = 0
    for (base, slots, W, lv), j in zip(class_geom, active):
        offs = []
        for k in range(lv + 1):
            offs.append(src_off)
            src_off += slots >> k
        level_off[j] = offs
    n_src = src_off
    wl_idx = win_base - np.array(
        [class_base[j] for j in win_class], np.int64
    )  # window slot base within its class region

    def _lvl_off(k):
        return np.array(
            [level_off[j][k] if k < len(level_off[j]) else -1
             for j in win_class], np.int64
        )

    run_src, run_len, run_key = [], [], []
    for cls, lvl in ((0, 0), (1, 1), (2, 2)):
        st_, al_, pv_ = cls_ivs[cls]
        base_l = _lvl_off(lvl) + (wl_idx >> lvl)
        for i in range(st_.shape[1]):
            wsel = np.flatnonzero(al_[:, i] > 0)
            run_src.append(base_l[wsel] + st_[wsel, i])
            run_len.append(al_[wsel, i])
            run_key.append((wsel * 4 + cls) * 16 + i)
    deep_wins = np.flatnonzero(uw > 0)
    n_comp_runs = sum(a.size for a in run_src)
    run_src.append(
        _lvl_off(3)[deep_wins] + (wl_idx[deep_wins] >> 3)
        + w8[deep_wins] - uw[deep_wins]
    )
    run_len.append(uw[deep_wins])
    all_src = np.concatenate(run_src)
    all_len = np.concatenate(run_len)
    # source-ascending run order (compact segment and deep tail sorted
    # independently; deep stays last so staging is a suffix): consecutive
    # destinations then SWEEP the fold arrays monotonically, which keeps
    # per-supertile source spans small enough for the runcopy span
    # classes (one sequential DMA pair per step instead of per-piece
    # scattered block pairs)
    ordc = np.argsort(all_src[:n_comp_runs], kind="stable")
    ordd = n_comp_runs + np.argsort(all_src[n_comp_runs:], kind="stable")
    ordall = np.concatenate([ordc, ordd])
    extract, dst_s = build_runcopy_plan(
        all_src[ordall], all_len[ordall], n_src
    )
    dst = np.empty_like(dst_s)
    dst[ordall] = dst_s
    dst_comp = dst[:n_comp_runs]
    dst_deep = dst[n_comp_runs:]
    n_compact = (
        int(dst_deep.min()) if dst_deep.size else int(extract.n_out)
    )
    staging_len = int(extract.n_out) - n_compact

    # compact asm position per small entry: its interval's dst + offset
    run_dst = np.full((n_wins, 3, 8), -1, np.int64)
    key_all = np.concatenate(run_key) if run_key else np.zeros(0, np.int64)
    run_dst[
        (key_all // 16) // 4, (key_all // 16) % 4, key_all % 16
    ] = dst_comp
    small_ids = went[we_cls <= 2]
    sw = win_of_entry[small_ids]
    sc = ecls[small_ids]
    siv = iv_of_entry[small_ids]
    _, al_0, pv_0 = cls_ivs[0]
    asm_small = np.empty(small_ids.size, np.int64)
    for cls in (0, 1, 2):
        m_ = sc == cls
        _, al_c, pv_c = cls_ivs[cls]
        asm_small[m_] = (
            run_dst[sw[m_], cls, siv[m_]]
            + rank_of_entry[small_ids[m_]]
            - pv_c[sw[m_], siv[m_]]
        )

    _tick("extraction")
    # --- fallback pool: fb rows' products + deep entries' partials -----
    deep_ids = went[we_cls == DEEP]
    fb_entry_ids = np.flatnonzero(win_of_entry < 0)
    fb_shuffle = None
    fb_levels = ()
    fb_lvl_idx = ()
    res_off_fb = 0
    slab_fb = None
    if fb_entry_ids.size or deep_ids.size:
        items = np.concatenate([fb_entry_ids, deep_ids])
        item_lens = np.concatenate([lens[fb_entry_ids], units[deep_ids]])
        ends_fb = np.cumsum(item_lens) - 1
        p_total_fb = int(item_lens.sum())
        src_fb_prod = (exp_p[~sel] - fb_base).astype(np.int64)
        if deep_ids.size:
            dwin = win_of_entry[deep_ids]
            stage_of_win = np.full(n_wins, -1, np.int64)
            stage_of_win[deep_wins] = dst_deep - n_compact
            dl = units[deep_ids]
            dbase = (
                fb_len + stage_of_win[dwin] + rank_of_entry[deep_ids]
            )
            cumd = np.concatenate([[0], np.cumsum(dl)[:-1]])
            di = np.arange(int(dl.sum()), dtype=np.int64) - np.repeat(
                cumd, dl
            )
            src_deep = np.repeat(dbase, dl) + di
        else:
            src_deep = np.zeros(0, np.int64)
        src_pos_fb = np.concatenate([src_fb_prod, src_deep])

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
            stage_used[src_deep - fb_len] = True
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
    assert (asm_src[:c_nnz] >= 0).all(), "uncovered output entry"
    used = np.zeros(n_asm, bool)
    used[asm_src[:c_nnz]] = True
    rest = np.flatnonzero(asm_src == -1)
    asm_src[rest] = np.flatnonzero(~used)[: rest.size]
    asm_shuffle = build_shuffle_plan(asm_src.astype(np.int32))

    _tick("asm-route")
    if os.environ.get("NSPARSE_WIN_DEBUG"):
        global _LAST_DEBUG
        _LAST_DEBUG = dict(
            run_start_ae=run_start_ae, exp_p=exp_p, slot_p=slot_p,
            sel=sel, win_base=win_base, win_of_entry=win_of_entry,
            lens=lens, starts=starts, dst=dst, fb_base=fb_base,
            cnt_wc=cnt_wc, sigma_of_entry=sigma_of_entry,
            rank_of_entry=rank_of_entry, all_src=all_src,
            all_len=all_len, n_comp_runs=n_comp_runs,
            win_width=win_width,
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
    -> K-fold run-copy extraction -> fallback Clos + class reductions
    -> assembly Clos."""
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
        cur = x.reshape(-1, width)
        for k in range(1, levels + 1):
            half = width >> k
            cur = cur[:, :half] + cur[:, half:]
            parts.append(cur.reshape(-1))
    src = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
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
