"""Row-localized window arenas for the ESC SpGEMM numeric phase.

The round-2 slab pipeline moved every intermediate product through ONE
global slack-Clos/Benes network (~70 roll+select stages over a 2x-expanded
grid) — the measured 10 ms floor of the 22 ms R-MAT-14 numeric.  But the
products of one C row are CONTIGUOUS in the expansion (a row's A entries
are contiguous; each contributes one contiguous 8-aligned B run), so the
expansion->slab permutation FACTORIZES into independent per-row pieces.
This module packs CONSECUTIVE rows into power-of-two WINDOWS (the
reference's per-row FLOP binning role,
``kernel_spgemm_hash_template.cu:59-235``, with locality instead of size
classes; ``ops/binning.bin_rows`` classes the finished windows into the
pow2 arena bins) and routes each window with a width-W Benes:
``2*log2(W)-1`` stages instead of ~70, no slack expansion, no global
transposes.  Consecutive rows make every window's entries one contiguous
C span, so after a per-window entry Benes (rotated to the C lane phase)
the final assembly is a monotone phase-matched run copy — no global
network anywhere on the main path.  This is the TPU analog of the
reference keeping each row's hash table in one thread block's shared
memory (``HashSpGEMM.hpp:509-700``) — row locality is what made the GPU
version fast.

Within a window, entries are classed by product count into fold LEVELS
0..3 (K = 2^level in {1, 2, 4, 8} — the reference's FLOP classes at
output-entry granularity).  An entry at level k owns the strided footprint
``{sigma + t * (W >> k)}`` of the window; the halving fold
``F_{l+1}[i] = F_l[i] + F_l[i + W >> (l+1)]`` (contiguous adds at memory
speed) leaves its total at ``F_k[sigma]``.  Entries with more than 8
products leave ``ceil(len/8)`` level-3 partials and recurse through
radix-8 FOLD TIERS *inside the same window*: tier t re-permutes the
previous tier's F3 array (width V/8, plus a zero half for footprint
tails) with another per-window Benes and folds three more levels, so an
entry of any length reduces fully in-window — no partial ever leaves for
a global pool.  Only whole rows too heavy for the largest window route
through the round-2 global-Clos slab machinery (a small side channel).
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
GAP_CHUNK = 1024      # zero-run chunking bounds in-kernel table reads
# entry classes: fold level 0..3 (K = 1/2/4/8) + deep (len >= 9)
CLS_K = (1, 2, 4, 8)
DEEP = 4                        # class code for len >= 9 (units -> tiers)
MAX_TIERS = 8                   # radix-8 recursion bound (W <= 8^8)


def _round_up(x: int, m: int) -> int:
    return -(-max(int(x), 0) // m) * m


def _cls_of(lens: np.ndarray) -> np.ndarray:
    """Entry class code: fold level 0..3 for len <= 8 (total lands at
    F_level[sigma]), DEEP for len >= 9 (one 8-fold L3 partial per 8
    products; partials reduce in-window through the radix-8 tiers).
    One searchsorted pass (class = #thresholds below len)."""
    return np.searchsorted(
        np.asarray([1, 2, 4, 8], dtype=lens.dtype), lens, side="left"
    ).astype(np.int8)


def _take(starts_, lens_, need):
    """Fill the per-window intervals (rows of starts_/lens_) left to right
    with `need` slots; returns (allocated, prefix, rest starts, rest
    lens)."""
    n = starts_.shape[0]
    cum = np.cumsum(lens_, axis=1)
    prev = np.concatenate([np.zeros((n, 1), np.int64), cum[:, :-1]], axis=1)
    al = np.clip(need[:, None] - prev, 0, lens_)
    return al, prev, starts_ + al, lens_ - al


def _by_capacity(starts_, lens_):
    """Sort each window's intervals descending by length: most windows
    then use ONE interval per level, and every interval is one extraction
    run — run count (hence extraction subtiles and piece budgets) scales
    with it."""
    o = np.argsort(-lens_, axis=1, kind="stable")
    return (
        np.take_along_axis(starts_, o, 1),
        np.take_along_axis(lens_, o, 1),
    )


def _alloc_levels(width, c0, c1, c2, c3, uw):
    """Top-down fold-slot (sigma) allocation over pow2 windows.

    An entry at level k owns F0 footprint ``{sigma + t * (width >> k)}``;
    free slots at level l map to interval PAIRS at level l-1, so the
    allocation walks levels 3 -> 0 with doubling interval tables.  Deep
    units (uw consecutive L3 slots) end-pack at the top of F3, level-3
    singles (c3) sit just below; the interval chain then serves levels
    2/1/0.  Because every footprint nests exactly, capacity is exact:
    any per-window demand ``sum 2^k * n_k + 8 * uw <= width`` succeeds.

    Returns ``(cls_ivs {level: (starts, alloc, prefix)}, g3, dstart)``
    with g3 = level-3 singles region start, dstart = deep region start.
    """
    n = width.size
    w8 = width >> 3
    w4 = width >> 2
    w2 = width >> 1
    dstart = w8 - uw
    g3 = dstart - c3
    if n and not (g3 >= 0).all():
        raise AssertionError("level-3 overcommit")
    z = np.zeros((n, 1), np.int64)
    s2 = np.concatenate([z, w8[:, None]], axis=1)
    l2 = np.concatenate([g3[:, None], g3[:, None]], axis=1)
    a2, p2, rs2, rl2 = _take(s2, l2, c2)
    s1, l1 = _by_capacity(
        np.concatenate([rs2, rs2 + w4[:, None]], axis=1),
        np.concatenate([rl2, rl2], axis=1),
    )
    a1, p1, rs1, rl1 = _take(s1, l1, c1)
    s0, l0 = _by_capacity(
        np.concatenate([rs1, rs1 + w2[:, None]], axis=1),
        np.concatenate([rl1, rl1], axis=1),
    )
    a0, p0, _, _ = _take(s0, l0, c0)
    # int32 tables: the per-entry interval searches gather (n_entries, k)
    # blocks from these — half the traffic of int64 on the 1-core host
    c32 = lambda *xs: tuple(x.astype(np.int32) for x in xs)  # noqa: E731
    return (
        {0: c32(s0, a0, p0), 1: c32(s1, a1, p1), 2: c32(s2, a2, p2)},
        g3.astype(np.int32), dstart.astype(np.int32),
    )


def _group_rank(keys_win, keys_cls, sizes):
    """Rank (size-weighted prefix) of each item within its (window,
    class) group, groups in input order (= entry id = C order).

    ``keys_win`` is NON-DECREASING at every call site (items arrive in C
    entry order and windows hold consecutive rows), so the rank is a
    per-class segmented weighted cumsum — no lexsort."""
    n = keys_win.size
    rank = np.empty(n, np.int32)
    for c in range(int(keys_cls.max(initial=0)) + 1):
        ids = np.flatnonzero(keys_cls == c)
        if not ids.size:
            continue
        kw = keys_win[ids]
        sz = sizes[ids].astype(np.int64)
        cs = np.cumsum(sz)
        f = np.flatnonzero(
            np.concatenate([[True], kw[1:] != kw[:-1]])
        )
        cnt = np.diff(np.concatenate([f, [kw.size]]))
        base = np.repeat(cs[f] - sz[f], cnt)
        rank[ids] = cs - sz - base
    return rank


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowStructure:
    """Device routing for the window-arena numeric phase.

    Attributes:
      benes: per active class, the window-local TileBenesPlan.
      tiers: per active class, tuple of radix-8 tier TileBenesPlans
        (tier t re-permutes the previous tier's F3 + a zero half).
      extract: run-copy plan gathering every entry total (all tiers)
        from the concatenated fold pyramids into the compact buffer.
      fb_shuffle: global Clos for the fallback-ROW pool (expansion ->
        bin-padded slabs), or None when no row falls back.
      fb_lvl_idx: fallback chunk-level gather indices.
      entry_benes: per pow2 arena bin, the batched per-window Benes that
        reorders each window's extracted totals into C-entry order,
        rotated by (C offset mod LANES) so the compaction reads every
        window phase-matched (replaces the round-2 global assembly Clos:
        the permutation factorizes per window, so 2*log2(P)-1 stages
        route it instead of a slack-Clos over the padded global width).
      merge: fixed-destination run-copy compacting c_val from the
        entry-ordered arena (+ the fallback segment) — one monotone
        phase-matched run per window (two on pow2 wrap) and one per
        fallback row.
      fb_perm: routed shuffle placing fallback results entry-sorted at
        per-row phase-matched cursors in the fb segment.
      class_geom: static ((base, slots, width, levels), ...) per class.
      ebin_geom: static ((base, slots, P), ...) per entry bin.
      tier_geom: static per class: ((V, n_slots, n_pad), ...) per tier —
        arena width (2x the previous F3), real slots, Benes-padded slots.
      fb_levels: static fallback slab classes (((L, cnt), ...), ...).
      fb_off / fb_len: fallback expansion region (offset, length).
      n_compact: length of the compact extraction output.
    """

    benes: Tuple
    tiers: Tuple
    extract: object
    fb_shuffle: object
    fb_lvl_idx: Tuple
    entry_benes: Tuple
    merge: object
    fb_perm: object
    class_geom: Tuple = dataclasses.field(metadata=dict(static=True))
    tier_geom: Tuple = dataclasses.field(metadata=dict(static=True))
    fb_levels: Tuple = dataclasses.field(metadata=dict(static=True))
    fb_off: int = dataclasses.field(metadata=dict(static=True))
    fb_len: int = dataclasses.field(metadata=dict(static=True))
    n_compact: int = dataclasses.field(metadata=dict(static=True))
    ebin_geom: Tuple = dataclasses.field(
        default=(), metadata=dict(static=True)
    )


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
    # int32 everywhere on the per-product / per-slot axes: every hot pass
    # below is memory-bound on a single host core, and all positions fit
    # (expansion slots = p8 total + window padding stays < 2^31; guarded
    # where fb_base is known)
    if p_total >= (1 << 31) - 1:
        raise ValueError("p_total exceeds int32 plan-build range")
    apos = np.asarray(apos, dtype=np.int32)
    bpos = np.asarray(bpos, dtype=np.int32)
    out_pos = np.asarray(out_pos, dtype=np.int32)
    ends = np.asarray(ends[:c_nnz], dtype=np.int32)

    # --- per-entry / per-row stats ------------------------------------
    starts = np.concatenate([np.zeros(1, np.int32), ends[:-1] + 1])
    lens = ends - starts + 1
    _tick("stats/ends-lens")
    ecls = _cls_of(lens)
    _tick("stats/cls")
    units = np.where(ecls == DEEP, -(-lens // 8), 1)  # deep: ceil(len/8)
    kfac_e = np.where(
        ecls == DEEP, 8, np.array(CLS_K, np.int32)[np.minimum(ecls, 3)]
    )
    slot_cost = kfac_e * units                        # window slots used
    _tick("stats/units")
    row_of_entry = np.repeat(
        np.arange(m, dtype=np.int32), np.diff(c_rpt).astype(np.int64)
    )
    _tick("stats/row-of-entry")
    seg_len = deg_b[col_a]                       # products per A entry
    seg8 = -(-seg_len // 8) * 8
    # per-row sums: entries/A-entries are row-sorted, so boundary
    # differences of one cumsum replace the bincount scatter passes
    cs8 = np.concatenate([[0], np.cumsum(seg8, dtype=np.int64)])
    p8_row = cs8[rpt_a[1:]] - cs8[rpt_a[:-1]]
    csc = np.concatenate([[0], np.cumsum(slot_cost, dtype=np.int64)])
    slab_row = csc[c_rpt[1:]] - csc[c_rpt[:-1]]
    weight = np.maximum(p8_row, slab_row)

    # --- consecutive-row packing -----------------------------------------
    # Windows hold CONSECUTIVE C rows, so each window's entries are one
    # contiguous C span: the final assembly becomes one monotone run per
    # window (plus wrap) instead of an element-granular merge, the
    # per-window entry rank is ``entry_id - first_entry``, and the row ->
    # window map follows the reference's row-binning role
    # (``template.cu:59-235``) with locality instead of size classes.
    # Rows accumulate into a W_TARGET window until it would overflow;
    # heavier rows get a solo next-pow2 window; rows beyond the largest
    # width fall back to the global slab pool.
    _tick("stats")
    W_MAX = WIN_MIN << (N_WIN_CLASSES - 1)
    W_TARGET = min(2048, W_MAX)
    live = weight > 0
    fb_mask = weight > W_MAX
    fb_rows = np.flatnonzero(fb_mask)
    if not np.any(live & ~fb_mask):
        return None

    # one greedy walk over all non-fallback rows (weight-0 rows join
    # their neighbors' window for free, so empty rows never split a
    # span).  A window's first row sets its allowance
    # max(W_TARGET, next_pow2(first need)): a heavy row opens a wide
    # window that subsequent rows then FILL (occupancy) without growing
    # it; runs break only at fallback rows.  One loop iteration per
    # WINDOW (searchsorted jumps), not per row.
    nf = np.flatnonzero(~fb_mask)
    cls_windows = [[] for _ in range(N_WIN_CLASSES)]
    if nf.size:
        p8s = p8_row[nf]
        sls = slab_row[nf]
        gapb = np.flatnonzero(np.diff(np.concatenate([[-2], nf])) != 1)
        seg_of = np.zeros(nf.size, np.int64)
        seg_of[gapb] = 1
        seg_of = np.cumsum(seg_of) - 1
        nsm = nf.size
        cp8 = np.concatenate([[0], np.cumsum(p8s)])
        csl = np.concatenate([[0], np.cumsum(sls)])
        run_end = np.concatenate([gapb[1:], [nsm]])
        run_end_of = run_end[seg_of]
        i = 0
        while i < nsm:
            hi = int(run_end_of[i])
            first_need = max(int(p8s[i]), int(sls[i]), WIN_MIN)
            w_allow = max(W_TARGET, 1 << (first_need - 1).bit_length())
            j_p8 = np.searchsorted(
                cp8, cp8[i] + w_allow, side="right"
            ) - 1
            j_sl = np.searchsorted(
                csl, csl[i] + w_allow, side="right"
            ) - 1
            j = max(i + 1, min(j_p8, j_sl, hi))
            need = max(int(cp8[j] - cp8[i]), int(csl[j] - csl[i]))
            if need > 0:
                W = 1 << (max(need, WIN_MIN) - 1).bit_length()
                jcls = (W // WIN_MIN).bit_length() - 1
                cls_windows[jcls].append(nf[i:j])
            i = j
    for j in range(N_WIN_CLASSES):
        cls_windows[j].sort(key=lambda a: int(a[0]))
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
    if fb_base + int(p8_row[fb_rows].sum()) >= (1 << 31) - 1:
        raise ValueError("expansion exceeds int32 plan-build range")

    win_base = []
    win_width = []
    win_class = []
    win_loc = []       # window index within its class (real windows)
    win_frow = []      # first (lowest) row id of the window
    win_lrow = []      # last row id (rows are consecutive)
    class_wid0 = {}    # first global window id of each class
    win_of_row = np.full(m, -1, np.int32)
    wid = 0
    for j in active:
        W = WIN_MIN << j
        class_wid0[j] = wid
        for wl, rows in enumerate(cls_windows[j]):
            win_base.append(class_base[j] + wl * W)
            win_width.append(W)
            win_class.append(j)
            win_loc.append(wl)
            win_frow.append(rows[0])
            win_lrow.append(rows[-1])
            win_of_row[rows] = wid
            wid += 1
    n_wins = wid
    win_base = np.asarray(win_base, np.int32)
    win_width = np.asarray(win_width, np.int32)
    win_class = np.asarray(win_class, np.int32)
    win_loc = np.asarray(win_loc, np.int32)
    win_frow = np.asarray(win_frow, np.int64)
    win_lrow = np.asarray(win_lrow, np.int64)

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
    used_w = np.bincount(
        win_of_row[w_rows], weights=p8_row[w_rows], minlength=n_wins
    ).astype(np.int64)
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
    # --- tier-1 fold-slot (sigma) allocation per (window, class) -------
    win_of_entry = win_of_row[row_of_entry]
    went = np.flatnonzero(win_of_entry >= 0)
    we_win = win_of_entry[went]
    we_cls = ecls[went]
    _tick("slab/went")
    cnt_wc = np.bincount(
        we_win.astype(np.int64) * 5 + we_cls, weights=units[went],
        minlength=n_wins * 5,
    ).astype(np.int64).reshape(n_wins, 5)
    _tick("slab/cnt")
    c0w = cnt_wc[:, 0]
    c1w = cnt_wc[:, 1]
    c2w = cnt_wc[:, 2]
    c3w = cnt_wc[:, 3]
    uw = cnt_wc[:, DEEP]
    cls_ivs, g3w, dstartw = _alloc_levels(
        win_width, c0w, c1w, c2w, c3w, uw
    )

    # member rank within the (window, class) group
    rank_went = _group_rank(we_win, we_cls, units[went])
    rank_of_entry = np.full(c_nnz, -1, np.int32)
    rank_of_entry[went] = rank_went
    _tick("slab/rank")

    # sigma + interval id per entry (rank mapped through the intervals):
    # pv_ rows are the ascending per-window allocation prefix, so the
    # interval id is one vectorized rank-vs-prefix comparison
    sigma_of_entry = np.full(c_nnz, -1, np.int32)
    iv_of_entry = np.full(c_nnz, -1, np.int32)
    for cls in (0, 1, 2):
        ids = went[we_cls == cls]
        if not ids.size:
            continue
        wv_ = win_of_entry[ids]
        rr = rank_of_entry[ids]
        st_, al_, pv_ = cls_ivs[cls]
        # interval 0 covers most entries (_by_capacity puts the largest
        # interval first): search the remaining columns only on the
        # minority past interval 0 — no (n, k) broadcast block
        iv = np.zeros(ids.size, np.int32)
        ncols = st_.shape[1]
        if ncols > 1:
            hi = np.flatnonzero(rr >= pv_[wv_, 1])
            if hi.size:
                rrh = rr[hi]
                wvh = wv_[hi]
                ivh = np.ones(hi.size, np.int32)
                for k in range(2, ncols):
                    ivh += rrh >= pv_[wvh, k]
                iv[hi] = np.minimum(ivh, ncols - 1)
        sigma_of_entry[ids] = st_[wv_, iv] + rr - pv_[wv_, iv]
        iv_of_entry[ids] = iv
    _tick("slab/ivs")
    ids3 = went[we_cls == 3]
    sigma_of_entry[ids3] = (
        g3w[win_of_entry[ids3]] + rank_of_entry[ids3]
    )
    iv_of_entry[ids3] = 0
    deep_ids0 = went[we_cls == DEEP]
    dwin0 = win_of_entry[deep_ids0]  # end-packed: [w8 - U, w8)
    sigma_of_entry[deep_ids0] = (
        dstartw[dwin0] + rank_of_entry[deep_ids0]
    )
    iv_of_entry[deep_ids0] = 0

    _tick("slab-layout")
    # --- tier-1 Benes permutations per class ----------------------------
    delta = (run_start_ae - rpt_b[col_a]).astype(np.int32)
    exp_p = delta[apos] + bpos  # global expansion position per product
    # per-product values expand per-ENTRY precomputes with np.repeat —
    # sequential writes at half the passes of gathering through out_pos
    wv_e = np.maximum(win_of_entry, 0)
    deep_e = ecls == DEEP
    stride_e = (
        win_width[wv_e] >> np.minimum(ecls, np.int8(3))
    ).astype(np.int32)
    base_e = win_base[wv_e] + sigma_of_entry
    lens64 = lens.astype(np.int64)
    sel = np.repeat(win_of_entry >= 0, lens64)
    t_p = np.arange(p_total, dtype=np.int32)
    t_p -= np.repeat(starts, lens64)
    is_deep = np.repeat(deep_e, lens64)
    _tick("benes/perm-gathers")
    # fold stride W >> level; deep: unit sigma + within-unit t, stride W/8
    tt = np.where(is_deep, t_p & 7, t_p)
    slot_p = np.repeat(base_e, lens64)
    slot_p += np.where(is_deep, t_p >> 3, 0)
    slot_p += tt * np.repeat(stride_e, lens64)
    _tick("benes/perm-slots")
    perm = np.full(fb_base, -1, np.int32)
    perm[slot_p[sel]] = exp_p[sel]
    used = np.zeros(fb_base, bool)
    used[exp_p[sel]] = True
    empty = np.flatnonzero(perm == -1)
    perm[empty] = np.flatnonzero(~used)  # per-window counts match
    _tick("benes/perm-fill")
    benes = []
    class_geom = []
    lvl_need = {}
    for j in active:
        W = WIN_MIN << j
        base, slots = class_base[j], class_slots[j]
        # sources stay inside their window, so the window-local index is a
        # pow2 mask of the class-local position (no modulo)
        local = (perm[base : base + slots] - np.int32(base)) & np.int32(
            W - 1
        )
        _tick(f"benes/local-W{W}")
        benes.append(build_tile_benes(local, W))
        _tick(f"benes/route-W{W}")
        wins_j = np.flatnonzero(win_class == j)
        lv = 0
        if np.any(c1w[wins_j] > 0):
            lv = 1
        if np.any(c2w[wins_j] > 0):
            lv = 2
        if np.any((c3w[wins_j] > 0) | (uw[wins_j] > 0)):
            lv = 3
        lvl_need[j] = lv
        class_geom.append((base, slots, W, lv))

    _tick("benes-route")
    # --- radix-8 fold tiers + unified extraction runs ------------------
    # Host mirror of the device parts sequence: per class j the tier-1
    # pyramid [F0 | F1 | .. | F_lv], then per tier t >= 2 its fold levels
    # [T_F1 | T_F2 | T_F3] (the tier's L0 arena is never extracted).
    lvloff = {}            # (class j, tier, level) -> src offset
    tier_plans = []        # per active class: [TileBenesPlan, ...]
    tier_geoms = []        # per active class: [(V, n_slots, n_pad), ...]
    run_src, run_len, run_win = [], [], []
    run_id = 0
    # per finished entry: run id + offset within the run
    ent_run = np.full(c_nnz, -1, np.int32)
    ent_off = np.zeros(c_nnz, np.int32)

    def _emit(srcs, lens_, wins_sel, tab, wid0=0):
        """Append one run per selected window; record run ids in tab.

        ``wid0``: offset mapping class-local window indices (tier runs)
        to global window ids."""
        nonlocal run_id
        run_src.append(srcs)
        run_len.append(lens_)
        run_win.append(np.asarray(wins_sel, np.int64) + wid0)
        tab[wins_sel] = run_id + np.arange(wins_sel.size)
        run_id += wins_sel.size

    # tier-1 runs: levels 0..2 intervals + the level-3 singles region.
    # The device lays the fold pyramid out WINDOW-major per class (one
    # axis-1 concat of [F0 | F1 | .. | F_lv] -> (n_w, Pc) blocks): every
    # window's totals then live in ONE contiguous Pc neighborhood, which
    # keeps the tight-arena extraction single-stream per output subtile.
    pyr_base_cls = {}
    pc_cls = {}
    src_off = 0
    for (base, slots, W, lv), j in zip(class_geom, active):
        pc = sum(W >> k for k in range(lv + 1))
        pyr_base_cls[j] = src_off
        pc_cls[j] = pc
        src_off += (slots // W) * pc
    pyrb_w = np.array([pyr_base_cls[j] for j in win_class], np.int64)
    pc_w = np.array([pc_cls[j] for j in win_class], np.int64)
    ww64 = win_width.astype(np.int64)
    wl64 = win_loc.astype(np.int64)

    def _lvl1(k):
        """Per-global-window flat offset of its F_k array start."""
        off_k = 0 if k == 0 else 2 * ww64 - (ww64 >> (k - 1))
        return pyrb_w + wl64 * pc_w + off_k

    # run-id tables for assembly-position recovery
    rid_iv = np.full((n_wins, 3, 8), -1, np.int64)
    rid_c3 = np.full(n_wins, -1, np.int64)
    for cls in (0, 1, 2):
        st_, al_, pv_ = cls_ivs[cls]
        base_l = _lvl1(cls)
        for i in range(st_.shape[1]):
            wsel = np.flatnonzero(al_[:, i] > 0)
            if not wsel.size:
                continue
            _emit(base_l[wsel] + st_[wsel, i], al_[wsel, i], wsel,
                  rid_iv[:, cls, i])
    w3 = np.flatnonzero(c3w > 0)
    if w3.size:
        _emit(_lvl1(3)[w3] + g3w[w3], c3w[w3], w3, rid_c3)

    # asm position references for tier-1 finished entries
    small_ids = went[we_cls <= 2]
    sw = win_of_entry[small_ids]
    sc = ecls[small_ids]
    siv = iv_of_entry[small_ids]
    ent_run[small_ids] = rid_iv[sw, sc, siv]
    for cls in (0, 1, 2):
        m_ = small_ids[sc == cls]
        _, _, pv_c = cls_ivs[cls]
        ent_off[m_] = (
            rank_of_entry[m_]
            - pv_c[win_of_entry[m_], iv_of_entry[m_]]
        )
    ent_run[ids3] = rid_c3[win_of_entry[ids3]]
    ent_off[ids3] = rank_of_entry[ids3]
    _tick("ext-runs/tier1-tables")

    # tiers: per class, recurse on the deep items
    for (base, slots, W, lv), j in zip(class_geom, active):
        plans_j, geoms_j = [], []
        wid0 = class_wid0[j]
        n_w_t = class_nw[j]           # includes identity pad windows
        d_sel = deep_ids0[win_class[win_of_entry[deep_ids0]] == j]
        items = d_sel                                  # global entry ids
        u = units[items]
        sprev = sigma_of_entry[items]   # F3-local slot of the 1st partial
        wloc = win_loc[win_of_entry[items]]
        v_in = W >> 3
        tier = 2
        while items.size:
            if tier > MAX_TIERS:
                raise AssertionError("tier recursion failed to terminate")
            V = 2 * v_in
            tile_w = max(256, V)
            n_slots = n_w_t * V
            n_pad = _round_up(n_slots, max(16384, tile_w))
            # classify items by partial count
            kk = np.where(u <= 2, 1,
                          np.where(u <= 4, 2,
                                   np.where(u <= 8, 3, DEEP))
                          ).astype(np.int8)
            un = np.where(kk == DEEP, -(-u // 8), 1).astype(np.int32)
            cnt = np.bincount(
                wloc.astype(np.int64) * 5 + kk, weights=un,
                minlength=n_w_t * 5,
            ).astype(np.int64).reshape(n_w_t, 5)
            wv_t = np.full(n_w_t, V, np.int64)
            civ, g3t, dstt = _alloc_levels(
                wv_t, cnt[:, 0], cnt[:, 1], cnt[:, 2], cnt[:, 3],
                cnt[:, DEEP],
            )
            rk = _group_rank(wloc, kk, un)
            sig_t = np.empty(items.size, np.int32)
            iv_t = np.zeros(items.size, np.int32)
            for cls in (1, 2):
                m_ = np.flatnonzero(kk == cls)
                if not m_.size:
                    continue
                st_, al_, pv_ = civ[cls]
                iv = (rk[m_][:, None] >= pv_[wloc[m_]]).sum(
                    axis=1, dtype=np.int32
                ) - 1
                iv = np.minimum(iv, st_.shape[1] - 1)
                sig_t[m_] = st_[wloc[m_], iv] + rk[m_] - pv_[wloc[m_], iv]
                iv_t[m_] = iv
            m3 = np.flatnonzero(kk == 3)
            sig_t[m3] = g3t[wloc[m3]] + rk[m3]
            md = np.flatnonzero(kk == DEEP)
            sig_t[md] = dstt[wloc[md]] + rk[md]

            # permutation: partial s of item i -> its footprint slot
            nper = u
            ii = np.repeat(np.arange(items.size, dtype=np.int32), nper)
            cumn = np.concatenate(
                [np.zeros(1, np.int32),
                 np.cumsum(nper, dtype=np.int32)[:-1]]
            )
            s = np.arange(int(nper.sum()), dtype=np.int32) - np.repeat(
                cumn, nper
            )
            kki = kk[ii]
            stride = np.int32(V) >> np.minimum(kki, 3).astype(np.int32)
            tts = np.where(kki == DEEP, s & 7, s)
            sgf = np.where(kki == DEEP, sig_t[ii] + (s >> 3), sig_t[ii])
            dstp = wloc[ii] * np.int32(V) + sgf + tts * stride
            srcp = wloc[ii] * np.int32(V) + sprev[ii] + s
            # footprint tails (slots beyond u) read the ZERO half
            fsz = np.where(kk == DEEP, 8 * un, 1 << np.minimum(kk, 3))
            tail = fsz - u
            ti = np.repeat(np.arange(items.size, dtype=np.int32), tail)
            cumt = np.concatenate(
                [np.zeros(1, np.int32),
                 np.cumsum(tail, dtype=np.int32)[:-1]]
            )
            st2 = u[ti] + (
                np.arange(int(tail.sum()), dtype=np.int32)
                - np.repeat(cumt, tail)
            )
            kkt = kk[ti]
            stridet = np.int32(V) >> np.minimum(kkt, 3).astype(np.int32)
            ttt = np.where(kkt == DEEP, st2 & 7, st2)
            sgt = np.where(kkt == DEEP, sig_t[ti] + (st2 >> 3), sig_t[ti])
            dstt_p = wloc[ti] * np.int32(V) + sgt + ttt * stridet
            # zero-half sources: per window, sequential from V/2
            zrank = _group_rank(
                wloc[ti], np.zeros(ti.size, np.int8),
                np.ones(ti.size, np.int32),
            )
            srct_p = wloc[ti] * np.int32(V) + np.int32(v_in) + zrank
            permt = np.full(n_pad, -1, np.int32)
            permt[dstp] = srcp
            permt[dstt_p] = srct_p
            usedt = np.zeros(n_pad, bool)
            usedt[srcp] = True
            usedt[srct_p] = True
            emptyt = np.flatnonzero(permt == -1)
            permt[emptyt] = np.flatnonzero(~usedt)
            # tile-local indices (windows nest within tiles, so the
            # source never leaves its tile: pow2 mask, no modulo)
            local = permt & np.int32(tile_w - 1)
            _tick(f"tiers/perm-V{V}")
            plans_j.append(build_tile_benes(local, tile_w))
            _tick(f"tiers/route-V{V}")
            geoms_j.append((int(V), int(n_slots), int(n_pad)))

            # parts offsets + extraction runs for levels 1..3
            for k in (1, 2, 3):
                lvloff[(j, tier, k)] = src_off
                src_off += n_slots >> k
            rid_t = np.full((n_w_t, 3, 8), -1, np.int64)
            rid_t3 = np.full(n_w_t, -1, np.int64)
            for cls in (1, 2):
                st_, al_, pv_ = civ[cls]
                bl = lvloff[(j, tier, cls)] + (
                    np.arange(n_w_t, dtype=np.int64) * (V >> cls)
                )
                for i in range(st_.shape[1]):
                    wsel = np.flatnonzero(al_[:, i] > 0)
                    if not wsel.size:
                        continue
                    _emit(bl[wsel] + st_[wsel, i], al_[wsel, i], wsel,
                          rid_t[:, cls, i], wid0=class_wid0[j])
            w3t = np.flatnonzero(cnt[:, 3] > 0)
            if w3t.size:
                _emit(
                    lvloff[(j, tier, 3)] + w3t * (V >> 3) + g3t[w3t],
                    cnt[w3t, 3], w3t, rid_t3, wid0=class_wid0[j],
                )
            fin = kk <= 3
            fi = items[fin]
            kf = kk[fin]
            ent_off[fi] = rk[fin]
            is3 = kf == 3
            ent_run[fi[is3]] = rid_t3[wloc[fin][is3]]
            for cls in (1, 2):
                mc = np.flatnonzero(kf == cls)
                if not mc.size:
                    continue
                _, _, pv_ = civ[cls]
                wl_ = wloc[fin][mc]
                ent_run[fi[mc]] = rid_t[wl_, cls, iv_t[fin][mc]]
                ent_off[fi[mc]] = rk[fin][mc] - pv_[wl_, iv_t[fin][mc]]

            nxt = kk == DEEP
            items = items[nxt]
            u = un[nxt]
            sprev = sig_t[nxt]
            wloc = wloc[nxt]
            v_in = V >> 3
            tier += 1
        tier_plans.append(tuple(plans_j))
        tier_geoms.append(tuple(geoms_j))

    n_src = src_off
    _tick("tiers")

    # --- extraction: window-major destinations into pow2 entry bins -----
    # Each window's runs land back-to-back (phase-matched cursor walk) in
    # its own pow2-sized block; consecutive windows of a bin read
    # consecutive positions of the same few level arrays, so the
    # fixed-dst run-copy's multi-stream span classes keep sequential DMA.
    all_src = np.concatenate(run_src) if run_src else np.zeros(0, np.int64)
    all_len = np.concatenate(run_len) if run_len else np.zeros(0, np.int64)
    all_win = np.concatenate(run_win) if run_win else np.zeros(0, np.int64)

    ordw = np.argsort(all_win, kind="stable")
    srt_w = all_win[ordw]
    srt_s = all_src[ordw]
    srt_l = all_len[ordw]
    wfirst = np.flatnonzero(np.diff(np.concatenate([[-1], srt_w])) != 0)
    wcnt = np.diff(np.concatenate([wfirst, [srt_w.size]]))
    wlist = srt_w[wfirst]

    # phase-chain the runs of each window: pick as next run one whose
    # START phase equals the cursor's END phase, so most inter-run
    # alignment gaps vanish (~30% of entries otherwise, 64 avg per run).
    # Greedy bucket matching; the Benes absorbs any in-window order.
    if srt_w.size:
        p_ph = (srt_s % LANES).astype(np.int64)
        q_ph = ((srt_s + srt_l) % LANES).astype(np.int64)
        chain = np.empty(srt_w.size, np.int64)
        pos = 0
        for k0, cnt in zip(wfirst, wcnt):
            k0 = int(k0)
            cnt = int(cnt)
            if cnt == 1:
                chain[pos] = k0
                pos += 1
                continue
            buckets = {}
            for i in range(k0 + cnt - 1, k0 - 1, -1):
                buckets.setdefault(int(p_ph[i]), []).append(i)
            taken = [False] * cnt
            cur = 0
            scan = 0
            for _ in range(cnt):
                i = -1
                lst = buckets.get(cur)
                while lst:
                    cand2 = lst.pop()
                    if not taken[cand2 - k0]:
                        i = cand2
                        break
                if i < 0:
                    while taken[scan]:
                        scan += 1
                    i = k0 + scan
                taken[i - k0] = True
                chain[pos] = i
                pos += 1
                cur = int(q_ph[i])
        ordw = ordw[chain]
        srt_w = all_win[ordw]
        srt_s = all_src[ordw]
        srt_l = all_len[ordw]
    # phase-matched cursor walk, vectorized: within a window the cursor
    # phase after run i is (s_i + l_i) mod LANES, so each run's alignment
    # gap depends only on its predecessor:
    #   gap_i = (s_i - s_{i-1} - l_{i-1}) mod LANES  (first run: s_i mod)
    #   d_i   = cumsum(gap + l)_i - l_i   (segmented per window)
    gap = np.empty(srt_w.size, np.int64)
    if srt_w.size:
        gap[0] = srt_s[0] % LANES
        gap[1:] = (srt_s[1:] - srt_s[:-1] - srt_l[:-1]) % LANES
        gap[wfirst] = srt_s[wfirst] % LANES
    csum = np.cumsum(gap + srt_l)
    seg0 = np.repeat(
        csum[wfirst] - (gap[wfirst] + srt_l[wfirst]), wcnt
    )
    d_loc = csum - seg0 - srt_l
    wlast = np.concatenate([wfirst[1:], [srt_w.size]]) - 1
    curw = csum[wlast] - seg0[wlast] if srt_w.size else np.zeros(
        0, np.int64
    )
    _tick("ext/walk")

    # --- arena tiles: windows share pow2 Benes tiles --------------------
    # Each Benes tile holds SEVERAL row-consecutive windows: a window
    # gets an INPUT region (extraction lands here, 128-aligned so run
    # phases stay matched) and an OUTPUT region (entry-sorted, at a
    # cursor congruent to its C offset mod LANES so the compaction reads
    # it phase-matched).  Both regions index the same tile; the tile's
    # Benes maps one onto the other.  Sharing replaces the per-window
    # next-pow2 block (~1.76x slack) with phase gaps only (~1.2x).
    # ``bin_rows`` (reference BIN role) classes the oversized windows
    # into their own pow2 tiles.
    cur_of_win = np.zeros(n_wins, np.int64)
    cur_of_win[wlist] = curw
    e0_w = c_rpt[win_frow].astype(np.int64)
    e1_w = c_rpt[win_lrow + 1].astype(np.int64)
    n_ent_w = e1_w - e0_w
    phi_w = e0_w % LANES
    T_SHARE = 16384
    span_w = np.maximum(cur_of_win, phi_w + n_ent_w)
    order_w = np.argsort(win_frow, kind="stable")
    is_big = span_w > T_SHARE
    assert int(span_w.max(initial=0)) <= 65536, "window span > 64k"

    in_rel = np.zeros(n_wins, np.int64)   # input region start in tile
    out_rel = np.zeros(n_wins, np.int64)  # output region start in tile
    tile_of = np.zeros(n_wins, np.int64)
    n_share = 0
    in_cur = out_cur = 0
    opened = False
    for w in order_w:
        if is_big[w]:
            continue
        io = _round_up(in_cur, LANES)
        oo = out_cur + (int(phi_w[w]) - out_cur) % LANES
        if not opened or max(
            io + int(cur_of_win[w]), oo + int(n_ent_w[w])
        ) > T_SHARE:
            n_share += 1
            opened = True
            io = 0
            oo = int(phi_w[w])
        tile_of[w] = n_share - 1
        in_rel[w] = io
        out_rel[w] = oo
        in_cur = io + int(cur_of_win[w])
        out_cur = oo + int(n_ent_w[w])

    # layout: the shared-tile region first, then oversized windows in
    # pow2 bins (largest first keeps every base max(16384, P)-aligned)
    ebin_meta = []  # (P, base, padded slots)
    arena_cur = 0
    tile_addr = np.zeros(max(n_share, 1), np.int64)
    if n_share:
        blen = _round_up(n_share * T_SHARE, max(16384, T_SHARE))
        tile_addr = np.arange(n_share, dtype=np.int64) * T_SHARE
        ebin_meta.append((T_SHARE, 0, int(blen)))
        arena_cur = blen
    big_ids = np.flatnonzero(is_big)
    block_base = np.zeros(n_wins, np.int64)
    if n_share:
        share_ids = np.flatnonzero(~is_big)
        block_base[share_ids] = tile_addr[tile_of[share_ids]]
    if big_ids.size:
        pbins = bin_rows(span_w[big_ids], min_size=256, num_bins=9)
        for jb in range(len(pbins) - 1, -1, -1):
            bsel = np.asarray(pbins[jb], np.int64)
            if not bsel.size:
                continue
            P = 256 << jb
            wsel = big_ids[bsel]
            wsel = wsel[np.argsort(win_frow[wsel], kind="stable")]
            blen = _round_up(int(wsel.size) * P, max(16384, P))
            block_base[wsel] = arena_cur + np.arange(wsel.size) * P
            ebin_meta.append((int(P), int(arena_cur), int(blen)))
            arena_cur += blen
        out_rel[big_ids] = phi_w[big_ids]  # input at 0, output at phi
    arena_len = int(arena_cur)
    in_base = block_base + in_rel
    out_base = block_base + out_rel
    if os.environ.get("NSPARSE_WIN_DEBUG"):
        print(
            f"[windbg] arena={arena_len} content={int(cur_of_win.sum())} "
            f"entries={int(n_ent_w.sum())} n_share={n_share} "
            f"big={big_ids.size} wins={n_wins}", flush=True,
        )

    d_emis = np.empty_like(d_loc)
    d_emis[ordw] = d_loc
    dst_abs = in_base[all_win] + d_emis
    ordd = np.argsort(dst_abs, kind="stable")
    _tick("ext/bins")
    extract, _ = build_runcopy_plan(
        all_src[ordd], all_len[ordd], n_src,
        dst=dst_abs[ordd], n_out=arena_len,
    )
    n_compact = arena_len
    _tick("extraction")

    # --- per-tile entry-order Benes (the factorized assembly) ----------
    # Consecutive rows make the window's entries one contiguous C span,
    # so the in-window rank is just ``entry_id - first_entry``.
    assert (ent_run[went] >= 0).all(), "uncovered window entry"
    pos_went = dst_abs[ent_run[went]] + ent_off[went]
    rank_c = went.astype(np.int64) - e0_w[we_win]
    target_went = out_base[we_win] + rank_c
    eperm = np.full(arena_len, -1, np.int64)
    eperm[target_went] = pos_went
    used_e = np.zeros(arena_len, bool)
    used_e[pos_went] = True
    empty_e = np.flatnonzero(eperm == -1)
    eperm[empty_e] = np.flatnonzero(~used_e)
    entry_benes = []
    ebin_geom = []
    for P, ebase, blen in ebin_meta:
        local = (eperm[ebase : ebase + blen] & np.int64(P - 1)).astype(
            np.int32
        )
        entry_benes.append(build_tile_benes(local, P))
        ebin_geom.append((ebase, blen, P))
    _tick("entry-benes")
    # --- fallback pool: whole rows too heavy for the largest window -----
    fb_entry_ids = np.flatnonzero(win_of_entry < 0)
    fb_shuffle = None
    fb_levels = ()
    fb_lvl_idx = ()
    res_off_fb = 0
    slab_fb = None
    if fb_entry_ids.size:
        ends_fb = np.cumsum(lens[fb_entry_ids]) - 1
        p_total_fb = int(lens[fb_entry_ids].sum())
        src_fb_prod = (exp_p[~sel] - fb_base).astype(np.int64)

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
        slab_fb = _build_slab_structure(
            ends_fb, p_total_fb, src_fb_prod, fb_interior, fb_len, c_cap,
            targets=fb_entry_ids,
        )
        fb_shuffle = build_shuffle_plan(slab_fb["src"])
        fb_levels = slab_fb["levels"]
        fb_lvl_idx = tuple(jnp.asarray(i) for i in slab_fb["lvl_idx"])
        res_off_fb = slab_fb["res_off"]

    _tick("fb-structure")
    # --- fallback segment: entry-sorted, phase-matched per fb row -------
    # The fb results land in a segment appended after the arena; each fb
    # row's entries sit at a cursor aligned to its C offset mod LANES, so
    # the compaction reads the segment on the sublane-slice classes too.
    fb_perm = None
    fb_seg = 0
    fb_drow = fb_rcnt = fb_rows_seg = None
    if slab_fb is not None:
        fb_ent = np.asarray(slab_fb["asm_entry"], np.int64)
        fb_pos = np.asarray(slab_fb["asm_pos"], np.int64)
        ofb = np.argsort(fb_ent, kind="stable")  # entry id = C order
        ent_sorted = fb_ent[ofb]
        rows_fb = row_of_entry[ent_sorted]
        rfirst = np.flatnonzero(
            np.diff(np.concatenate([[-1], rows_fb])) != 0
        )
        rcnt = np.diff(np.concatenate([rfirst, [rows_fb.size]]))
        c0r = c_rpt[rows_fb[rfirst]].astype(np.int64)
        gapf = np.empty(rfirst.size, np.int64)
        gapf[0] = c0r[0] % LANES
        gapf[1:] = (c0r[1:] - c0r[:-1] - rcnt[:-1]) % LANES
        csf = np.cumsum(gapf + rcnt)
        drow = csf - rcnt
        raw_seg = int(csf[-1])
        fb_seg = _round_up(max(raw_seg, res_off_fb), LANES)
        pos_in_seg = np.repeat(drow, rcnt) + (
            np.arange(rows_fb.size, dtype=np.int64)
            - np.repeat(rfirst, rcnt)
        )
        fb_src = np.full(fb_seg, -1, np.int64)
        fb_src[pos_in_seg] = fb_pos[ofb]
        used_f = np.zeros(fb_seg, bool)
        used_f[fb_pos] = True
        empty_f = np.flatnonzero(fb_src == -1)
        fb_src[empty_f] = np.flatnonzero(~used_f)
        fb_perm = build_shuffle_plan(fb_src.astype(np.int32))
        fb_drow = drow
        fb_rcnt = rcnt
        fb_rows_seg = rows_fb[rfirst]
    _tick("asm/fb-perm")

    # --- compaction runs: one per window plus one per fallback row;
    # sources are phase-matched by construction and monotone within each
    # arena region / the fb segment --------------------------------------
    wnz = np.flatnonzero(n_ent_w > 0)
    r_src = [out_base[wnz]]
    r_dst = [e0_w[wnz]]
    r_len = [n_ent_w[wnz]]
    if fb_drow is not None:
        r_src.append(arena_len + fb_drow)
        r_dst.append(c_rpt[fb_rows_seg].astype(np.int64))
        r_len.append(fb_rcnt)
    mrg_src = np.concatenate(r_src)
    mrg_dst = np.concatenate(r_dst)
    mrg_len = np.concatenate(r_len)
    ordm = np.argsort(mrg_dst, kind="stable")
    mrg_src, mrg_dst, mrg_len = (
        mrg_src[ordm], mrg_dst[ordm], mrg_len[ordm]
    )
    merge, _ = build_runcopy_plan(
        mrg_src, mrg_len, arena_len + fb_seg,
        dst=mrg_dst, n_out=_round_up(c_cap, 1024),
    )
    _tick("asm/merge")
    if os.environ.get("NSPARSE_WIN_DEBUG"):
        global _LAST_DEBUG
        _LAST_DEBUG = dict(
            run_start_ae=run_start_ae, exp_p=exp_p, slot_p=slot_p,
            sel=sel, win_base=win_base, win_of_entry=win_of_entry,
            lens=lens, starts=starts, dst=dst_abs, fb_base=fb_base,
            cnt_wc=cnt_wc, sigma_of_entry=sigma_of_entry,
            rank_of_entry=rank_of_entry, all_src=all_src,
            all_len=all_len, win_width=win_width,
            block_base=block_base, rank_c=rank_c,
            ext_dst=dst_abs, mrg_src=mrg_src, mrg_len=mrg_len,
            mrg_dst=mrg_dst,
        )
    win = WindowStructure(
        benes=tuple(benes),
        tiers=tuple(tier_plans),
        extract=extract,
        fb_shuffle=fb_shuffle,
        fb_lvl_idx=fb_lvl_idx,
        entry_benes=tuple(entry_benes),
        merge=merge,
        fb_perm=fb_perm,
        class_geom=tuple(class_geom),
        tier_geom=tuple(tier_geoms),
        fb_levels=fb_levels,
        fb_off=int(fb_base),
        fb_len=int(fb_len),
        n_compact=int(n_compact),
        ebin_geom=tuple(ebin_geom),
    )
    return win, pw_plan


def spgemm_numeric_window(plan, a: CSR, b: CSR) -> CSR:
    """Window-arena numeric phase (pure jit): expand -> per-window Benes
    -> fold pyramid (+ radix-8 tiers for deep entries) -> tight-arena
    run-copy extraction -> per-window entry Benes (phase-rotated C order)
    -> monotone run-copy compaction (+ fallback-row Clos side channel)."""
    from nsparse_tpu.ops.kernels.piecewise import piecewise_expand
    from nsparse_tpu.ops.kernels.runcopy import runcopy
    from nsparse_tpu.ops.kernels.shuffle_pallas import (
        planned_shuffle,
        tile_benes_apply,
    )
    from nsparse_tpu.ops.spgemm import slab_class_reduce

    w: WindowStructure = plan.win
    prod = piecewise_expand(plan.pw, a.val, b.val)
    # parts order mirrors the host lvloff walk: per class ONE window-major
    # pyramid block ([F0 | F1 | .. | F_lv] concatenated along the window
    # axis, so every window's totals are one contiguous neighborhood for
    # the extraction), then each class's tier folds (level-major)
    parts = []
    curs = []
    for bp, (base, slots, width, levels) in zip(w.benes, w.class_geom):
        x = tile_benes_apply(bp, prod[base : base + slots])
        levs = [x.reshape(-1, width)]
        cur = levs[0]
        for k in range(1, levels + 1):
            half = width >> k
            cur = cur[:, :half] + cur[:, half:]
            levs.append(cur)
        blk = levs[0] if levels == 0 else jnp.concatenate(levs, axis=1)
        parts.append(blk.reshape(-1))
        curs.append(cur)
    for tps, tgs, cur in zip(w.tiers, w.tier_geom, curs):
        for tp, (V, n_slots, n_pad) in zip(tps, tgs):
            arena = jnp.concatenate(
                [cur, jnp.zeros_like(cur)], axis=1
            ).reshape(-1)
            if n_pad > int(arena.shape[0]):
                arena = jnp.pad(arena, (0, n_pad - int(arena.shape[0])))
            tx = tile_benes_apply(tp, arena)[:n_slots]
            cur = tx.reshape(-1, V)
            for k in (1, 2, 3):
                half = V >> k
                cur = cur[:, :half] + cur[:, half:]
                parts.append(cur.reshape(-1))
    src = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    ext = runcopy(w.extract, src)
    segs = [
        tile_benes_apply(bp, ext[base : base + blen])
        for bp, (base, blen, _) in zip(w.entry_benes, w.ebin_geom)
    ]
    res = jnp.concatenate(segs) if len(segs) > 1 else segs[0]
    if w.fb_shuffle is not None:
        fb_in = prod[w.fb_off : w.fb_off + w.fb_len]
        fbs = planned_shuffle(w.fb_shuffle, fb_in)
        fb_res = slab_class_reduce(fbs, w.fb_levels, w.fb_lvl_idx)
        fb_seg = int(w.merge.n_src) - w.n_compact
        fb_res = jnp.pad(
            fb_res, (0, max(fb_seg - int(fb_res.shape[0]), 0))
        )
        fb_res = planned_shuffle(w.fb_perm, fb_res)
        res = jnp.concatenate([res, fb_res])
    c_val = runcopy(w.merge, res)[: plan.c_capacity]
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
