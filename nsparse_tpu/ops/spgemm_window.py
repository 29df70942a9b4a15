"""Row-localized window arenas for the ESC SpGEMM numeric phase.

The round-2 slab pipeline moved every intermediate product through ONE
global slack-Clos/Benes network; round 3 factorized it into per-window
Benes + fold pyramids, but still materialized the pyramid in HBM and
extracted totals with a run-copy over ~45M slots (measured ~7 ms of the
11.4 ms R-MAT-14 numeric).  Round 4 fuses everything after the tier-1
Benes into ONE Pallas kernel per width class
(``ops/kernels/window_fused.py``): folds, radix-8 tiers, extraction and
the per-window entry ordering all happen in VMEM; only the entry-ordered
class arena reaches HBM, and one fixed-destination run-copy (plus the
fallback-row side channel) assembles ``c_val``.

Windows hold CONSECUTIVE C rows (the reference's per-row FLOP binning
role, ``kernel_spgemm_hash_template.cu:59-235``, with locality instead of
size classes).  Within a window, entries are classed by product count
into fold LEVELS 0..3 (K = 2^level); an entry at level k owns the strided
footprint ``{sigma + t * (W >> k)}`` and its total lands at
``F_k[sigma]`` after k halving folds.  Entries with more than 8 products
recurse through radix-8 FOLD TIERS (tier arenas ``V = W / 4^(t-1)``,
supported while V >= 256 — the plan routes longer entries to wider
windows, and rows beyond every window capability to the global
slack-Clos fallback pool).  This is the TPU analog of the reference
keeping each row's hash table in one thread block's shared memory
(``HashSpGEMM.hpp:509-700``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nsparse_tpu.formats.csr import CSR

from nsparse_tpu.tune.kernelgen import kernel_config as _kernel_config
from nsparse_tpu.tune.kernelgen import plan_chip as _plan_chip

_CFG = _kernel_config(_plan_chip())

LANES = 128
WIN_MIN = _CFG.win_min          # chip-derived (tune/kernelgen.py)
N_WIN_CLASSES = _CFG.n_win_classes  # widths WIN_MIN << j (v5e: max 32768)
GAP_CHUNK = 1024      # zero-run chunking bounds in-kernel table reads
# entry classes: fold level 0..3 (K = 1/2/4/8) + deep (len >= 9)
CLS_K = (1, 2, 4, 8)
DEEP = 4                        # class code for len >= 9 (units -> tiers)
MAX_TIERS = 8                   # radix-8 recursion bound
BLK_MIN = 65536                 # fused-kernel slots per grid step
# in-kernel expansion needs the pre-rolled bank VMEM-resident next to
# the fused kernel's scratch; above this budget the plan falls back to
# the standalone piecewise expansion + explicit tier-1 Benes (v1)
FUSED_BANK_BUDGET = 11 * 2**20
# entry lengths coverable per width (tier arenas V = W/4^(t-1) >= 256)
#   W in {1024, 2048} -> len <= 64; {4096, 8192} -> 512;
#   {16384, 32768} -> 4096; longer entries -> fallback rows.
LEN_CAPS = ((64, 1024), (512, 4096), (4096, 16384))
LEN_MAX = 4096


def _round_up(x: int, m: int) -> int:
    return -(-max(int(x), 0) // m) * m


def _cls_of(lens: np.ndarray) -> np.ndarray:
    """Entry class code: fold level 0..3 for len <= 8, DEEP for len >= 9."""
    return np.searchsorted(
        np.asarray([1, 2, 4, 8], dtype=lens.dtype), lens, side="left"
    ).astype(np.int8)


def _w_need_len(maxlen: np.ndarray) -> np.ndarray:
    """Minimum window width whose tier ladder covers ``maxlen``-product
    entries (0 = any width; beyond LEN_MAX the row falls back)."""
    need = np.full(maxlen.shape, np.int64(1) << 62)
    for cap, w in reversed(LEN_CAPS):
        need = np.where(maxlen <= cap, w, need)
    return np.where(maxlen <= 8, 0, need)


def _take(starts_, lens_, need):
    """Fill the per-window intervals left to right with ``need`` slots."""
    n = starts_.shape[0]
    cum = np.cumsum(lens_, axis=1)
    prev = np.concatenate([np.zeros((n, 1), np.int64), cum[:, :-1]], axis=1)
    al = np.clip(need[:, None] - prev, 0, lens_)
    return al, prev, starts_ + al, lens_ - al


def _by_capacity(starts_, lens_):
    """Sort each window's intervals descending by length (fewest runs)."""
    o = np.argsort(-lens_, axis=1, kind="stable")
    return (
        np.take_along_axis(starts_, o, 1),
        np.take_along_axis(lens_, o, 1),
    )


def _alloc_levels(width, c0, c1, c2, c3, uw):
    """Top-down fold-slot (sigma) allocation over pow2 windows.

    An entry at level k owns F0 footprint ``{sigma + t * (width >> k)}``;
    free slots at level l map to interval PAIRS at level l-1.  Deep units
    (uw consecutive L3 slots) end-pack at the top of F3, level-3 singles
    (c3) sit just below; the interval chain then serves levels 2/1/0.
    Capacity is exact: any demand ``sum 2^k n_k + 8 uw <= width``
    succeeds.  Returns ``(cls_ivs {level: (starts, alloc, prefix)}, g3,
    dstart)``."""
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
    c32 = lambda *xs: tuple(x.astype(np.int32) for x in xs)  # noqa: E731
    return (
        {0: c32(s0, a0, p0), 1: c32(s1, a1, p1), 2: c32(s2, a2, p2)},
        g3.astype(np.int32), dstart.astype(np.int32),
    )


def _group_rank(keys_win, keys_cls, sizes):
    """Rank (size-weighted prefix) of each item within its (window,
    class) group; ``keys_win`` non-decreasing at every call site."""
    n = keys_win.size
    rank = np.empty(n, np.int32)
    for c in range(int(keys_cls.max(initial=0)) + 1):
        ids = np.flatnonzero(keys_cls == c)
        if not ids.size:
            continue
        kw = keys_win[ids]
        sz = sizes[ids].astype(np.int64)
        cs = np.cumsum(sz)
        f = np.flatnonzero(np.concatenate([[True], kw[1:] != kw[:-1]]))
        cnt = np.diff(np.concatenate([f, [kw.size]]))
        base = np.repeat(cs[f] - sz[f], cnt)
        rank[ids] = cs - sz - base
    return rank


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowStructure:
    """Device routing for the fused window-arena numeric phase.

    Attributes:
      benes: per active class, the window-local tier-1 TileBenesPlan
        (products -> fold slots).
      fused: per active class, the FusedClassPlan (folds + tiers +
        extraction + entry order, one kernel).
      merge: fixed-destination run-copy compacting ``c_val`` from the
        class-major entry-ordered arena (+ the fallback segment).
      fb_shuffle / fb_lvl_idx / fb_perm / fb_levels / fb_off / fb_len:
        global slack-Clos fallback pool for rows beyond every window
        capability (unchanged from round 3).
      class_geom: static ((base, slots, width, levels), ...) per class.
      tier_geom: static per class: ((V, n_slots, n_pad), ...) per tier
        (diagnostics; the device geometry lives in ``fused``).
      n_compact: total class-arena length (merge source prefix).
    """

    benes: Tuple
    fused: Tuple
    merge: object
    fb_shuffle: object
    fb_lvl_idx: Tuple
    fb_perm: object
    b8_gp: object = None       # fused-expansion bank gather plan
    apv_gp: object = None      # per-piece A-value gather plan (dist mode)
    # single-chip apv delivery: the per-piece A ids are contiguous RUNS
    # (one per A entry, destination-ordered), so a routed shuffle places
    # each a.val at its run's first piece slot and a log-pass forward
    # fill broadcasts it down the run.  The flat-gather route classed
    # 93% of piece tiles to XLA's elementwise gather (~1.4 ms on
    # R-MAT-14); this is ~0.1 ms.  apv_fill bit k = bit k of the
    # in-run offset; bit 30 = real (non-sentinel) piece.
    apv_shuffle: object = None
    apv_fill: object = None
    # dist mode: (apos, bpos, flags, ends, place) — fallback products in
    # entry order for the segmented-scan side channel (see the ``dist``
    # docstring on build_window_structure); None otherwise
    fb_scan: object = None
    class_geom: Tuple = dataclasses.field(
        default=(), metadata=dict(static=True)
    )
    tier_geom: Tuple = dataclasses.field(
        default=(), metadata=dict(static=True)
    )
    fb_levels: Tuple = dataclasses.field(
        default=(), metadata=dict(static=True)
    )
    fb_off: int = dataclasses.field(default=0, metadata=dict(static=True))
    fb_len: int = dataclasses.field(default=0, metadata=dict(static=True))
    n_compact: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )
    fused_expand: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    bank_rows: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )
    apv_k: int = dataclasses.field(default=0, metadata=dict(static=True))
    apv_len: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )

    @property
    def tiers(self):
        """Back-compat alias: per-class tier descriptors."""
        return self.tier_geom


def _build_apv_plan(eaidx_cat: np.ndarray, nnz_a: int):
    """Route the per-piece A values as shuffle + forward fill.

    Each A entry's pieces are CONTIGUOUS in the class-major piece order
    (an A entry belongs to one window; its expansion run walks
    consecutive destination subtiles), so the per-piece A-value gather
    factors into (a) a routed permutation placing ``a.val[aid]`` at the
    run's first piece slot and (b) a static log-pass forward fill.
    Sentinel pieces (gap runs, table padding) carry ``aid`` outside
    [0, nnz_a) and are zeroed by the real-flag bit.

    Returns (ShufflePlan, fill bits (P,) int32, n fill passes); the fill
    word's bit k is bit k of the in-run offset, bit 30 the real flag.
    """
    from nsparse_tpu.ops.kernels.shuffle_pallas import build_shuffle_plan

    p_n = int(eaidx_cat.size)
    aid = eaidx_cat.astype(np.int64)
    real = (aid >= 0) & (aid < nnz_a)
    prev = np.concatenate([[-2], aid[:-1]])
    isfirst = real & (aid != prev)
    firsts = np.flatnonzero(isfirst)
    n_univ = max(p_n, nnz_a)
    src = np.full(n_univ, -1, np.int64)
    src[firsts] = aid[firsts]
    used = np.zeros(n_univ, bool)
    used[aid[firsts]] = True
    empty = np.flatnonzero(src == -1)
    src[empty] = np.flatnonzero(~used)[: empty.size]
    shuf = build_shuffle_plan(src.astype(np.int32))
    # in-run offset per piece slot (sentinel slots clipped; masked off)
    last_first = np.maximum.accumulate(
        np.where(isfirst, np.arange(p_n, dtype=np.int64), -1)
    )
    off = np.arange(p_n, dtype=np.int64) - np.maximum(last_first, 0)
    k = int(off[real].max(initial=0)).bit_length()
    bits = (np.clip(off, 0, (1 << max(k, 1)) - 1)).astype(np.int32)
    bits |= real.astype(np.int32) << 30
    return shuf, jnp.asarray(bits), k


def apv_values(w: "WindowStructure", a_val: jax.Array) -> jax.Array:
    """Runtime per-piece A values for the fused-expansion kernel."""
    from nsparse_tpu.ops.kernels.shuffle_pallas import planned_shuffle

    pad = max(int(w.apv_shuffle.n) - int(a_val.shape[0]), 0)
    v = planned_shuffle(w.apv_shuffle, jnp.pad(a_val, (0, pad)))
    v = v[: w.apv_len]
    bits = w.apv_fill
    for k in range(w.apv_k):
        v = jnp.where((bits >> k) & 1 == 1, jnp.roll(v, 1 << k), v)
    return jnp.where((bits >> 30) & 1 == 1, v, 0).astype(a_val.dtype)


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
    dist: bool = False,
    extras_out: dict | None = None,
):
    """Host-side: build the fused window structure + its piecewise
    expansion.  Returns ``(WindowStructure, PiecewisePlan)`` or None.

    ``dist``: build for the SPMD stacked-plan path
    (``parallel/spgemm_window.py``): fold levels and tier ladders are
    forced to their width-maximal (data-independent) shapes so per-shard
    plans share static geometry, and the fallback pool becomes a
    segmented-scan side channel instead of the global slack-Clos plans
    (whose routed mask shapes cannot be padded across shards).
    ``extras_out``: when given, receives the raw merge runs and per-class
    tables the stacker needs to re-pad plans to common shapes."""
    from nsparse_tpu.ops.kernels.piecewise import build_piecewise_plan
    from nsparse_tpu.ops.kernels.runcopy import (
        _build_for_tpu,
        build_runcopy_plan,
    )
    from nsparse_tpu.ops.kernels.shuffle_pallas import (
        build_shuffle_plan,
        build_tile_benes,
    )
    from nsparse_tpu.ops.kernels.window_fused import (
        PYR_BIAS,
        FusedClassPlan,
        class_levels,
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
    if p_total >= (1 << 31) - 1:
        raise ValueError("p_total exceeds int32 plan-build range")
    apos = np.asarray(apos, dtype=np.int32)
    bpos = np.asarray(bpos, dtype=np.int32)
    out_pos = np.asarray(out_pos, dtype=np.int32)
    ends = np.asarray(ends[:c_nnz], dtype=np.int32)

    # dist plans always carry the routed masks: off-TPU the kernels run
    # in interpret mode, so one plan form serves the virtual-mesh dryrun
    # and the real chip (the reference-index form is not stackable)
    want_masks = (
        _build_for_tpu() or jax.default_backend() == "tpu" or dist
    )

    # --- per-entry / per-row stats ------------------------------------
    starts = np.concatenate([np.zeros(1, np.int32), ends[:-1] + 1])
    lens = ends - starts + 1
    ecls = _cls_of(lens)
    units = np.where(ecls == DEEP, -(-lens // 8), 1)
    kfac_e = np.where(
        ecls == DEEP, 8, np.array(CLS_K, np.int32)[np.minimum(ecls, 3)]
    )
    slot_cost = kfac_e * units
    row_of_entry = np.repeat(
        np.arange(m, dtype=np.int32), np.diff(c_rpt).astype(np.int64)
    )
    seg_len = deg_b[col_a]
    seg8 = -(-seg_len // 8) * 8
    cs8 = np.concatenate([[0], np.cumsum(seg8, dtype=np.int64)])
    p8_row = cs8[rpt_a[1:]] - cs8[rpt_a[:-1]]
    csc = np.concatenate([[0], np.cumsum(slot_cost, dtype=np.int64)])
    slab_row = csc[c_rpt[1:]] - csc[c_rpt[:-1]]
    weight = np.maximum(p8_row, slab_row)
    # per-row max entry length -> minimum tier-capable width
    maxlen_row = np.zeros(m, np.int64)
    nz_rows = np.flatnonzero(np.diff(c_rpt) > 0)
    if nz_rows.size:
        maxlen_row[nz_rows] = np.maximum.reduceat(
            lens.astype(np.int64), c_rpt[nz_rows].astype(np.int64)
        )
    w_need = _w_need_len(maxlen_row)
    _tick("stats")

    w_need = w_need.copy()
    for _attempt in range(8):
        # --- consecutive-row packing --------------------------------------
        W_MAX = WIN_MIN << (N_WIN_CLASSES - 1)
        W_TARGET = min(2048, W_MAX)
        live = weight > 0
        fb_mask = (weight > W_MAX) | (maxlen_row > LEN_MAX) | (w_need > W_MAX)
        fb_rows = np.flatnonzero(fb_mask)
        if not np.any(live & ~fb_mask):
            return None

        nf = np.flatnonzero(~fb_mask)
        cls_windows = [[] for _ in range(N_WIN_CLASSES)]
        if nf.size:
            p8s = p8_row[nf]
            sls = slab_row[nf]
            wns = w_need[nf]
            nes = np.diff(c_rpt).astype(np.int64)[nf]
            gapb = np.flatnonzero(np.diff(np.concatenate([[-2], nf])) != 1)
            seg_of = np.zeros(nf.size, np.int64)
            seg_of[gapb] = 1
            seg_of = np.cumsum(seg_of) - 1
            nsm = nf.size
            cp8 = np.concatenate([[0], np.cumsum(p8s)])
            csl = np.concatenate([[0], np.cumsum(sls)])
            # E-capacity pre-margin: the extraction cursor holds n_ent
            # totals plus <= 127 phase-gap slots per run; reserving
            # E_MARGIN entry slots up front kills most overflow retries
            # and binds only on entry-dense (all-level-0) windows
            E_MARGIN = 512
            cne = np.concatenate([[0], np.cumsum(nes)])
            run_end = np.concatenate([gapb[1:], [nsm]])
            run_end_of = run_end[seg_of]
            i = 0
            while i < nsm:
                hi = int(run_end_of[i])
                first_need = max(
                    int(p8s[i]), int(sls[i]), WIN_MIN, int(wns[i]),
                    int(nes[i]) + E_MARGIN,
                )
                w_allow = max(W_TARGET, 1 << (first_need - 1).bit_length())
                j_p8 = np.searchsorted(cp8, cp8[i] + w_allow, side="right") - 1
                j_sl = np.searchsorted(csl, csl[i] + w_allow, side="right") - 1
                j_ne = np.searchsorted(
                    cne, cne[i] + w_allow - E_MARGIN, side="right"
                ) - 1
                j = max(i + 1, min(j_p8, j_sl, j_ne, hi))
                # rows needing a wider tier ladder than this window allows
                # must start their own window
                over = np.flatnonzero(wns[i + 1 : j] > w_allow)
                if over.size:
                    j = i + 1 + int(over[0])
                need = max(int(cp8[j] - cp8[i]), int(csl[j] - csl[i]))
                if need > 0:
                    wseg = int(wns[i:j].max(initial=0))
                    W = 1 << (max(need, WIN_MIN, wseg) - 1).bit_length()
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
            slots = _round_up(n_real * W, max(BLK_MIN, W))
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
        win_loc = []
        win_frow = []
        win_lrow = []
        class_wid0 = {}
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

        # --- tier-1 fold-slot (sigma) allocation per (window, class) -------
        win_of_entry = win_of_row[row_of_entry]
        went = np.flatnonzero(win_of_entry >= 0)
        we_win = win_of_entry[went]
        we_cls = ecls[went]
        cnt_wc = np.bincount(
            we_win.astype(np.int64) * 5 + we_cls, weights=units[went],
            minlength=n_wins * 5,
        ).astype(np.int64).reshape(n_wins, 5)
        c0w = cnt_wc[:, 0]
        c1w = cnt_wc[:, 1]
        c2w = cnt_wc[:, 2]
        c3w = cnt_wc[:, 3]
        uw = cnt_wc[:, DEEP]
        cls_ivs, g3w, dstartw = _alloc_levels(win_width, c0w, c1w, c2w, c3w, uw)

        lens64 = lens.astype(np.int64)
        rank_went = _group_rank(we_win, we_cls, units[went])
        rank_of_entry = np.full(c_nnz, -1, np.int32)
        rank_of_entry[went] = rank_went
        _tick("slab/rank")

        sigma_of_entry = np.full(c_nnz, -1, np.int32)
        iv_of_entry = np.full(c_nnz, -1, np.int32)
        for cls in (0, 1, 2):
            ids = went[we_cls == cls]
            if not ids.size:
                continue
            wv_ = win_of_entry[ids]
            rr = rank_of_entry[ids]
            st_, al_, pv_ = cls_ivs[cls]
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
        ids3 = went[we_cls == 3]
        sigma_of_entry[ids3] = g3w[win_of_entry[ids3]] + rank_of_entry[ids3]
        iv_of_entry[ids3] = 0
        deep_ids0 = went[we_cls == DEEP]
        dwin0 = win_of_entry[deep_ids0]
        sigma_of_entry[deep_ids0] = dstartw[dwin0] + rank_of_entry[deep_ids0]
        iv_of_entry[deep_ids0] = 0
        _tick("slab-layout")

        # --- class fold-level table --------------------------------------
        class_geom = []
        lvl_need = {}
        for j in active:
            W = WIN_MIN << j
            wins_j = np.flatnonzero(win_class == j)
            lv = 0
            if np.any(c1w[wins_j] > 0):
                lv = 1
            if np.any(c2w[wins_j] > 0):
                lv = 2
            if np.any((c3w[wins_j] > 0) | (uw[wins_j] > 0)):
                lv = 3
            if dist:
                lv = 3  # data-independent PYR layout across shards
            lvl_need[j] = lv
            class_geom.append((class_base[j], class_slots[j], W, lv))

        # --- runs + entry positions (fused form) ---------------------------
        # Global run tables: (window, level_id, start, len); level_id indexes
        # the per-class PYR level layout (0 = F0, 1..lv = F_k, then 3 levels
        # per tier).  ``ent_run``/``ent_off`` give each finished entry its
        # run + offset; E positions follow from the per-window cursor walk.
        run_win_l, run_lvl_l, run_src_l, run_len_l = [], [], [], []
        run_id = 0
        ent_run = np.full(c_nnz, -1, np.int32)
        ent_off = np.zeros(c_nnz, np.int32)

        def _emit(wins_sel, lvl, srcs, lens_, tab, wid0=0):
            nonlocal run_id
            run_win_l.append(np.asarray(wins_sel, np.int64) + wid0)
            run_lvl_l.append(np.full(wins_sel.size, lvl, np.int32))
            run_src_l.append(np.asarray(srcs, np.int64))
            run_len_l.append(np.asarray(lens_, np.int64))
            tab[wins_sel] = run_id + np.arange(wins_sel.size)
            run_id += wins_sel.size

        rid_iv = np.full((n_wins, 3, 8), -1, np.int64)
        rid_c3 = np.full(n_wins, -1, np.int64)
        for cls in (0, 1, 2):
            st_, al_, pv_ = cls_ivs[cls]
            for i in range(st_.shape[1]):
                wsel = np.flatnonzero(al_[:, i] > 0)
                if not wsel.size:
                    continue
                _emit(wsel, cls, st_[wsel, i], al_[wsel, i], rid_iv[:, cls, i])
        w3 = np.flatnonzero(c3w > 0)
        if w3.size:
            _emit(w3, 3, g3w[w3], c3w[w3], rid_c3)

        small_ids = went[we_cls <= 2]
        sw = win_of_entry[small_ids]
        sc = ecls[small_ids]
        siv = iv_of_entry[small_ids]
        ent_run[small_ids] = rid_iv[sw, sc, siv]
        for cls in (0, 1, 2):
            m_ = small_ids[sc == cls]
            _, _, pv_c = cls_ivs[cls]
            ent_off[m_] = (
                rank_of_entry[m_] - pv_c[win_of_entry[m_], iv_of_entry[m_]]
            )
        ent_run[ids3] = rid_c3[win_of_entry[ids3]]
        ent_off[ids3] = rank_of_entry[ids3]
        _tick("runs/tier1")

        # --- radix-8 tiers (lite: allocation + runs; routing deferred) -----
        tier_perm_cls = []    # per active class: [(global perm, V, mode), ...]
        tier_meta_cls = []    # per active class: [(v_in, V, mode), ...]
        tier_geoms = []       # per active class: [(V, n_slots, n_pad), ...]
        for (base, slots, W, lv), j in zip(class_geom, active):
            BLK = max(BLK_MIN, W)
            NWB = BLK // W
            perms_j, meta_j, geoms_j = [], [], []
            wid0 = class_wid0[j]
            n_w_t = class_nw[j]
            d_sel = deep_ids0[win_class[win_of_entry[deep_ids0]] == j]
            items = d_sel
            u = units[items]
            sprev = sigma_of_entry[items]
            wloc = win_loc[win_of_entry[items]]
            v_in = W >> 3
            tier = 2
            lvl_next = lv + 1
            # width-maximal ladder: V_t = W >> (2t - 2), supported while
            # V >= 256 (dist forces it so the PYR layout is shard-
            # independent; see the ``dist`` docstring)
            n_full_tiers = 0
            vv = W >> 2
            while vv >= 256:
                n_full_tiers += 1
                vv >>= 2
            while items.size or (dist and len(meta_j) < n_full_tiers):
                if tier > MAX_TIERS:
                    raise AssertionError("tier recursion failed to terminate")
                V = 2 * v_in
                if V < 256:
                    raise AssertionError(
                        f"tier arena V={V} < 256 in class W={W} — "
                        "w_need routing should have prevented this"
                    )
                n_slots = n_w_t * V
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

                nper = u
                ii = np.repeat(np.arange(items.size, dtype=np.int32), nper)
                cumn = np.concatenate(
                    [np.zeros(1, np.int32),
                     np.cumsum(nper, dtype=np.int32)[:-1]]
                )[: items.size]  # items may be empty (dist forced tiers)
                s = np.arange(int(nper.sum()), dtype=np.int32) - np.repeat(
                    cumn, nper
                )
                kki = kk[ii]
                stride = np.int32(V) >> np.minimum(kki, 3).astype(np.int32)
                tts = np.where(kki == DEEP, s & 7, s)
                sgf = np.where(kki == DEEP, sig_t[ii] + (s >> 3), sig_t[ii])
                dstp = wloc[ii] * np.int64(V) + sgf + tts * stride
                srcp = wloc[ii] * np.int64(V) + sprev[ii] + s
                fsz = np.where(kk == DEEP, 8 * un, 1 << np.minimum(kk, 3))
                tail = fsz - u
                ti = np.repeat(np.arange(items.size, dtype=np.int32), tail)
                cumt = np.concatenate(
                    [np.zeros(1, np.int32),
                     np.cumsum(tail, dtype=np.int32)[:-1]]
                )[: items.size]
                st2 = u[ti] + (
                    np.arange(int(tail.sum()), dtype=np.int32)
                    - np.repeat(cumt, tail)
                )
                kkt = kk[ti]
                stridet = np.int32(V) >> np.minimum(kkt, 3).astype(np.int32)
                ttt = np.where(kkt == DEEP, st2 & 7, st2)
                sgt = np.where(kkt == DEEP, sig_t[ti] + (st2 >> 3), sig_t[ti])
                dstt_p = wloc[ti] * np.int64(V) + sgt + ttt * stridet
                zrank = _group_rank(
                    wloc[ti], np.zeros(ti.size, np.int8),
                    np.ones(ti.size, np.int32),
                )
                srct_p = wloc[ti] * np.int64(V) + np.int64(v_in) + zrank
                permt = np.full(n_slots, -1, np.int32)
                permt[dstp] = srcp
                permt[dstt_p] = srct_p
                usedt = np.zeros(n_slots, bool)
                usedt[srcp] = True
                usedt[srct_p] = True
                emptyt = np.flatnonzero(permt == -1)
                permt[emptyt] = np.flatnonzero(~usedt)
                t_rows_blk = NWB * V // LANES
                mode = "trans" if t_rows_blk % LANES == 0 else "lane"
                perms_j.append((permt, int(V), mode))
                meta_j.append((int(v_in), int(V), mode))
                geoms_j.append((int(V), int(n_slots), int(n_slots)))

                rid_t = np.full((n_w_t, 3, 8), -1, np.int64)
                rid_t3 = np.full(n_w_t, -1, np.int64)
                for cls in (1, 2):
                    st_, al_, pv_ = civ[cls]
                    for i in range(st_.shape[1]):
                        wsel = np.flatnonzero(al_[:, i] > 0)
                        if not wsel.size:
                            continue
                        _emit(
                            wsel, lvl_next + cls - 1, st_[wsel, i],
                            al_[wsel, i], rid_t[:, cls, i],
                            wid0=class_wid0[j],
                        )
                w3t = np.flatnonzero(cnt[:, 3] > 0)
                if w3t.size:
                    _emit(
                        w3t, lvl_next + 2, g3t[w3t], cnt[w3t, 3], rid_t3,
                        wid0=class_wid0[j],
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
                lvl_next += 3
            tier_perm_cls.append(perms_j)
            tier_meta_cls.append(meta_j)
            tier_geoms.append(tuple(geoms_j))
        _tick("tiers")

        # --- per-window run chain + phase-matched cursor -------------------
        all_win = np.concatenate(run_win_l) if run_win_l else np.zeros(
            0, np.int64
        )
        all_lvl = np.concatenate(run_lvl_l) if run_lvl_l else np.zeros(
            0, np.int32
        )
        all_src = np.concatenate(run_src_l) if run_src_l else np.zeros(
            0, np.int64
        )
        all_len = np.concatenate(run_len_l) if run_len_l else np.zeros(
            0, np.int64
        )

        # per-class level layouts (width, rows_per_win, base_rows_per_win)
        levels_cls = {}
        for (base, slots, W, lv), j, meta_j in zip(
            class_geom, active, tier_meta_cls
        ):
            levels_cls[j] = class_levels(W, lv, [V for _, V, _ in meta_j])

        # run source phase: levels are row-aligned per window, so the phase
        # is the in-level offset mod 128
        ordw = np.argsort(all_win, kind="stable")
        srt_w = all_win[ordw]
        srt_s = all_src[ordw]
        srt_l = all_len[ordw]
        wfirst = np.flatnonzero(np.diff(np.concatenate([[-1], srt_w])) != 0)
        wcnt = np.diff(np.concatenate([wfirst, [srt_w.size]]))
        wlist = srt_w[wfirst]

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
                for _ in range(cnt):
                    # minimum-gap next run: an exact phase match costs 0
                    # slots; on a miss, take the smallest forward phase
                    # step (the arbitrary-successor fallback this
                    # replaces overflowed E capacity on near-full
                    # windows, forcing a full repack pass)
                    i = -1
                    for g in range(LANES):
                        lst = buckets.get((cur + g) & (LANES - 1))
                        while lst:
                            cand2 = lst[-1]
                            if taken[cand2 - k0]:
                                lst.pop()
                                continue
                            i = lst.pop()
                            break
                        if i >= 0:
                            break
                    taken[i - k0] = True
                    chain[pos] = i
                    pos += 1
                    cur = int(q_ph[i])
            ordw = ordw[chain]
            srt_w = all_win[ordw]
            srt_s = all_src[ordw]
            srt_l = all_len[ordw]
        gap = np.empty(srt_w.size, np.int64)
        if srt_w.size:
            gap[0] = srt_s[0] % LANES
            gap[1:] = (srt_s[1:] - srt_s[:-1] - srt_l[:-1]) % LANES
            gap[wfirst] = srt_s[wfirst] % LANES
        csum = np.cumsum(gap + srt_l)
        seg0 = np.repeat(csum[wfirst] - (gap[wfirst] + srt_l[wfirst]), wcnt)
        d_loc = csum - seg0 - srt_l
        wlast = np.concatenate([wfirst[1:], [srt_w.size]]) - 1
        curw = csum[wlast] - seg0[wlast] if srt_w.size else np.zeros(
            0, np.int64
        )
        cur_of_win = np.zeros(n_wins, np.int64)
        cur_of_win[wlist] = curw
        bad = np.flatnonzero(cur_of_win > win_width)
        if bad.size:
            # phase gaps overflowed the E arena: force the rows of each
            # offending window into the next width class and repack (rows
            # forced beyond W_MAX fall back to the global pool)
            for wbad in bad:
                lo, hi = int(win_frow[wbad]), int(win_lrow[wbad])
                w_need[lo : hi + 1] = np.maximum(
                    w_need[lo : hi + 1], 2 * int(win_width[wbad])
                )
            _tick(f"cursor-retry({bad.size})")
            continue
        d_run = np.empty_like(d_loc)
        d_run[ordw] = d_loc
        _tick("cursor")
        break

    else:
        raise AssertionError("window packing failed to converge")

    # --- expansion layout: run placement per A entry -------------------
    w_rows = (
        np.concatenate([r for j in active for r in cls_windows[j]])
        if n_wins else np.zeros(0, np.int64)
    )
    fb_len = int(p8_row[fb_rows].sum())
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
    rs_s = run_start[ordr]
    rb_s = run_boff[ordr]
    ra_s = run_aidx[ordr]
    from nsparse_tpu.ops.kernels.piecewise import (
        BIAS as _PW_BIAS,
        BANK_ROWS_MAX as _BANK_MAX,
        bank_rows_for,
    )

    bank_rows = bank_rows_for(b8_len)
    # in-kernel expansion needs the pre-rolled bank resident next to the
    # fused kernel's scratch: cap it below the standalone path's budget
    fused_expand = (
        want_masks and bank_rows * 16 * 512 <= FUSED_BANK_BUDGET
    )
    if fused_expand:
        fsel = rs_s >= fb_base
        if fsel.any():
            pw_plan = build_piecewise_plan(
                rs_s[fsel] - fb_base, rb_s[fsel], ra_s[fsel], fb_len,
                nnz_a, b8_len, b8_idx=b8_idx,
            )
        else:
            pw_plan = None
    else:
        pw_plan = build_piecewise_plan(
            rs_s, rb_s, ra_s, exp_n, nnz_a, b8_len, b8_idx=b8_idx,
        )
    _tick("piecewise-plan")

    # --- tier-1 Benes permutations per class ---------------------------
    delta = (run_start_ae - rpt_b[col_a]).astype(np.int32)
    exp_p = delta[apos] + bpos
    wv_e = np.maximum(win_of_entry, 0)
    deep_e = ecls == DEEP
    stride_e = (
        win_width[wv_e] >> np.minimum(ecls, np.int8(3))
    ).astype(np.int32)
    base_e = win_base[wv_e] + sigma_of_entry
    sel = np.repeat(win_of_entry >= 0, lens64)
    t_p = np.arange(p_total, dtype=np.int32)
    t_p -= np.repeat(starts, lens64)
    is_deep = np.repeat(deep_e, lens64)
    tt = np.where(is_deep, t_p & 7, t_p)
    slot_p = np.repeat(base_e, lens64)
    slot_p += np.where(is_deep, t_p >> 3, 0)
    slot_p += tt * np.repeat(stride_e, lens64)
    perm = np.full(fb_base, -1, np.int32)
    perm[slot_p[sel]] = exp_p[sel]
    used = np.zeros(fb_base, bool)
    used[exp_p[sel]] = True
    empty = np.flatnonzero(perm == -1)
    perm[empty] = np.flatnonzero(~used)
    _tick("benes/perm")
    benes = []
    m1_masks = {}
    for j in active:
        W = WIN_MIN << j
        base, slots = class_base[j], class_slots[j]
        local = (perm[base : base + slots] - np.int32(base)) & np.int32(
            W - 1
        )
        if fused_expand:
            from nsparse_tpu.native import benes_route_split as _brs

            mo1, mt1 = _brs(local, W)
            m1_masks[j] = (
                jnp.asarray(mo1.reshape(-1, LANES)),
                jnp.asarray(mt1.reshape(-1, LANES)),
            )
        else:
            benes.append(build_tile_benes(local, W))
    _tick("benes-route")

    # --- tier mask routing (deferred past the packing loop) ------------
    from nsparse_tpu.native import benes_route, benes_route_split, get_lib

    tier_masks_cls = []
    ref_tier_cls = []
    for perms_j in tier_perm_cls:
        masks_j, ref_j = [], []
        for local_t, V, mode in perms_j:
            if want_masks:
                if get_lib() is None:
                    raise RuntimeError(
                        "native benes router required for fused window "
                        "plans (NSPARSE_PLAN_TARGET=tpu)"
                    )
                if mode == "trans":
                    mo, mt = benes_route_split(local_t & np.int32(V - 1), V)
                    masks_j.append((
                        jnp.asarray(mo.reshape(-1, LANES)),
                        jnp.asarray(mt.reshape(-1, LANES)),
                    ))
                else:
                    mfull = benes_route(local_t & np.int32(V - 1), V)
                    masks_j.append(
                        (jnp.asarray(mfull.reshape(-1, LANES)),)
                    )
                ref_j.append(None)
            else:
                masks_j.append((jnp.zeros((1, LANES), jnp.int32),))
                ref_j.append(jnp.asarray(local_t))
        tier_masks_cls.append(masks_j)
        ref_tier_cls.append(ref_j)
    _tick("tier-route")

    # --- entry E positions + per-class fused plans ---------------------
    assert (ent_run[went] >= 0).all(), "uncovered window entry"
    e0_w = c_rpt[win_frow].astype(np.int64)
    e1_w = c_rpt[win_lrow + 1].astype(np.int64)
    n_ent_w = e1_w - e0_w
    phi_w = e0_w % LANES
    pos_in_E = d_run[ent_run[went]] + ent_off[went]  # window-local
    rank_c = went.astype(np.int64) - e0_w[we_win]

    fused_plans = []
    class_arena_base = {}
    arena_cur = 0
    eaidx_all = []
    eaidx_splits = []
    eaidx_off = 0
    from nsparse_tpu.ops.kernels.window_fused import TILE as _FTILE

    for ci, ((base, slots, W, lv), j) in enumerate(
        zip(class_geom, active)
    ):
        BLK = max(BLK_MIN, W)
        NWB = BLK // W
        n_steps = slots // BLK
        SUBS = BLK // _FTILE
        n_w = class_nw[j]
        levels = levels_cls[j]
        class_arena_base[j] = arena_cur

        wins_j = np.flatnonzero(win_class == j)          # global win ids
        wl_j = win_loc[wins_j].astype(np.int64)           # == arange

        # E destination (class-local) per run of this class
        rsel = np.flatnonzero(win_class[all_win] == j)
        r_win = all_win[rsel]
        r_wl = win_loc[r_win].astype(np.int64)
        r_lvl = all_lvl[rsel]
        r_src = all_src[rsel]
        r_len = all_len[rsel]
        r_d = d_run[rsel]
        dst_cls = r_wl * W + r_d                          # class-local E

        # PYR block-local source flat position per run
        lw = np.asarray([l[0] for l in levels], np.int64)
        lr = np.asarray([l[1] for l in levels], np.int64)
        lb = np.asarray([l[2] for l in levels], np.int64)
        wl_b = r_wl % NWB
        src_flat = (
            (PYR_BIAS + lb[r_lvl] * NWB + wl_b * lr[r_lvl]) * LANES
            + r_src
        )
        # block-local destination
        dst_blk = (r_wl % NWB) * W + r_d

        # piece tables per E-subtile (block-local subtiles, all steps)
        n_sub = n_steps * SUBS
        ordd = np.argsort(dst_cls, kind="stable")
        ds_ = dst_cls[ordd]
        sl_ = r_len[ordd]
        sf_ = src_flat[ordd]
        db_ = dst_blk[ordd]
        sub_base = np.arange(n_sub, dtype=np.int64) * _FTILE
        first = np.searchsorted(ds_, sub_base, side="right") - 1
        ends_abs = ds_ + sl_
        has_cont = (first >= 0) & (
            ends_abs[np.maximum(first, 0)] > sub_base
        )
        first = np.where(has_cont, first, first + 1)
        nxt = np.searchsorted(ds_, sub_base + _FTILE, side="left")
        count = np.maximum(nxt - first, 0)
        j_cap = max(8, _round_up(int(count.max(initial=0)), 8))
        kkr = np.arange(j_cap, dtype=np.int64)
        rr = first[:, None] + kkr[None, :]
        validp = (kkr[None, :] < count[:, None]) & (rr < ds_.size) & (
            rr >= 0
        )
        rc = np.clip(rr, 0, max(ds_.size - 1, 0))
        sb = sub_base[:, None]
        sub_in_blk = (np.arange(n_sub, dtype=np.int64) % SUBS)[:, None]
        cut = np.where(validp, np.maximum(ds_[rc] - sb, 0), _FTILE)
        endp = np.where(
            validp, np.minimum(ends_abs[rc] - sb, _FTILE), _FTILE
        )
        # phase-matched: src_flat - dst_blk is a multiple of 128
        sub_base_blk = sub_in_blk * _FTILE
        srow = np.where(
            validp,
            (sf_[rc] + sub_base_blk - db_[rc]) // LANES,
            0,
        )
        if validp.any():
            chkoff = (sf_[rc] - db_[rc]) % LANES
            assert not np.any(chkoff[validp]), "phase mismatch in pieces"
            assert srow[validp].min(initial=0) >= 0, "negative piece row"
        cuts = cut.astype(np.int32)
        endsp = endp.astype(np.int32)
        srows = srow.astype(np.int32)
        tripsp = np.zeros((n_sub, 8), np.int32)
        tripsp[:, 0] = np.minimum(count, j_cap)

        # expansion piece tables (flat per step; in-kernel aligned-bank
        # pieces replace the standalone piecewise kernel)
        ecuts = eboffs = eends = etrips = None
        eaidx_cls = None
        j2_cap = 8
        if fused_expand:
            esel_r = (rs_s >= base) & (rs_s < base + slots)
            ers = rs_s[esel_r] - base
            erb = rb_s[esel_r]
            era = ra_s[esel_r]
            sub_b = np.arange(n_sub, dtype=np.int64) * _FTILE
            efirst = np.searchsorted(ers, sub_b, side="right") - 1
            starts_in = np.bincount(
                np.minimum(ers // _FTILE, n_sub - 1), minlength=n_sub
            )
            at_base = np.zeros(n_sub, dtype=bool)
            rb0 = ers[(ers % _FTILE == 0)] // _FTILE
            at_base[rb0] = True
            ecount = starts_in + (~at_base).astype(np.int64)
            # flat per-step piece regions
            cnt_step = ecount.reshape(n_steps, SUBS)
            pieces_step = cnt_step.sum(axis=1)
            pstep_w = max(
                128,
                1 << (max(int(pieces_step.max(initial=0)), 1) - 1)
                .bit_length(),
            )
            j2_cap = pstep_w
            ecuts = np.zeros((n_steps, pstep_w), np.int32)
            eboffs = np.zeros((n_steps, pstep_w), np.int32)
            eaidx_cls = np.full((n_steps, pstep_w), nnz_a, np.int64)
            etrips = np.zeros((n_sub, 8), np.int32)
            # per-subtile [start, end) within the step's flat region
            off_in_step = np.concatenate([
                np.zeros((n_steps, 1), np.int64),
                np.cumsum(cnt_step, axis=1)[:, :-1],
            ], axis=1).reshape(-1)
            etrips[:, 0] = off_in_step
            etrips[:, 1] = off_in_step + ecount
            # piece k of subtile t is run efirst[t] + k
            tsub = np.repeat(np.arange(n_sub, dtype=np.int64), ecount)
            kk2 = np.arange(int(ecount.sum()), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(ecount)[:-1]]), ecount
            )
            rr2 = np.minimum(efirst[tsub] + kk2, ers.size - 1)
            cut2 = np.clip(ers[rr2] - sub_b[tsub], 0, _FTILE)
            eff = erb[rr2] - ers[rr2] + sub_b[tsub] + _PW_BIAS
            code = (eff % LANES) // 8 * bank_rows + eff // LANES
            stp = tsub // SUBS
            pj = off_in_step[tsub] + kk2
            ecuts[stp, pj] = cut2
            eboffs[stp, pj] = code
            eaidx_cls[stp, pj] = era[rr2]
            # piece ends (next piece's cut within the subtile): pieces
            # cover disjoint [cut, end) ranges, so the kernel can split
            # the expansion into independent accumulator chains instead
            # of a sequential overwrite chain
            eends = np.full((n_steps, pstep_w), _FTILE, np.int32)
            eend2 = np.full(cut2.shape, _FTILE, np.int64)
            same2 = tsub[1:] == tsub[:-1]
            eend2[:-1][same2] = cut2[1:][same2]
            eends[stp, pj] = eend2
            # SMEM blocks: 8 rows per step (Pallas last-two-dims rule)
            ecuts = ecuts.reshape(n_steps * 8, pstep_w // 8)
            eboffs = eboffs.reshape(n_steps * 8, pstep_w // 8)
            eends = eends.reshape(n_steps * 8, pstep_w // 8)

        # entry permutation per window: out[(phi + rank) % W] = E[pos]
        eids = went[win_class[we_win] == j]
        ew = win_of_entry[eids]
        ewl = win_loc[ew].astype(np.int64)
        msk = win_class[we_win] == j
        src_e = ewl * W + pos_in_E[msk]
        tgt_e = ewl * W + (phi_w[ew] + rank_c[msk]) % W
        eperm = np.full(slots, -1, np.int64)
        eperm[tgt_e] = src_e
        used_e = np.zeros(slots, bool)
        used_e[src_e] = True
        empty_e = np.flatnonzero(eperm == -1)
        eperm[empty_e] = np.flatnonzero(~used_e)
        elocal = (eperm & np.int64(W - 1)).astype(np.int32)

        _tick(f"fp/tables-W{W}")
        if want_masks:
            if get_lib() is None:
                raise RuntimeError(
                    "native benes router required for fused window plans"
                )
            emo, emt = benes_route_split(elocal, W)
            _tick(f"fp/eroute-W{W}")
            emo = jnp.asarray(emo.reshape(-1, LANES))
            emt = jnp.asarray(emt.reshape(-1, LANES))
            ref_ext = None
            ref_entry = None
            ref_tiers = ()
        else:
            emo = jnp.zeros((1, LANES), jnp.int32)
            emt = jnp.zeros((1, LANES), jnp.int32)
            # reference: E slot -> virtual level-concat index
            vbase = np.concatenate([[0], np.cumsum(lw * n_w)])[:-1]
            ref_ext_np = np.full(slots, -1, np.int64)
            pr_ = np.repeat(np.arange(rsel.size, dtype=np.int64), r_len)
            cuml = np.concatenate([[0], np.cumsum(r_len)[:-1]])
            kin = np.arange(pr_.size, dtype=np.int64) - cuml[pr_]
            ref_ext_np[dst_cls[pr_] + kin] = (
                vbase[r_lvl[pr_]] + r_wl[pr_] * lw[r_lvl[pr_]]
                + r_src[pr_] + kin
            )
            ref_ext = jnp.asarray(ref_ext_np.astype(np.int32))
            ref_entry = jnp.asarray(eperm.astype(np.int32))
            ref_tiers = tuple(ref_tier_cls[ci])

        if fused_expand:
            eaidx_all.append(eaidx_cls.reshape(-1).astype(np.int32))
            eaidx_splits.append(
                (eaidx_off, eaidx_off + eaidx_cls.size)
            )
            eaidx_off += eaidx_cls.size
        else:
            eaidx_splits.append((0, 0))
        fused_plans.append(FusedClassPlan(
            trips=jnp.asarray(tripsp),
            cuts=jnp.asarray(cuts),
            ends=jnp.asarray(endsp),
            srows=jnp.asarray(srows),
            emo=emo,
            emt=emt,
            etrips=jnp.asarray(etrips) if fused_expand else None,
            ecuts=jnp.asarray(ecuts) if fused_expand else None,
            eboffs=jnp.asarray(eboffs) if fused_expand else None,
            eends=jnp.asarray(eends) if fused_expand else None,
            m1o=m1_masks[j][0] if fused_expand else None,
            m1t=m1_masks[j][1] if fused_expand else None,
            expand=bool(fused_expand),
            j2_cap=int(j2_cap),
            apv_lo=int(eaidx_splits[-1][0]),
            apv_hi=int(eaidx_splits[-1][1]),
            tier_masks=tuple(
                tuple(t) for t in tier_masks_cls[ci]
            ) if want_masks else tuple(
                (jnp.zeros((1, LANES), jnp.int32),)
                for _ in tier_masks_cls[ci]
            ),
            ref_ext_idx=ref_ext,
            ref_entry_idx=ref_entry,
            ref_tier_idx=ref_tiers,
            w=int(W),
            blk=int(BLK),
            lv=int(lv),
            levels=levels,
            tier_meta=tuple(tier_meta_cls[ci]),
            j_cap=int(j_cap),
            n_steps=int(n_steps),
            slots=int(slots),
        ))
        arena_cur += slots
    arena_len = int(arena_cur)
    _tick("fused-plans")

    # --- fallback pool: whole rows beyond window capability -------------
    fb_entry_ids = np.flatnonzero(win_of_entry < 0)
    fb_shuffle = None
    fb_levels = ()
    fb_lvl_idx = ()
    res_off_fb = 0
    slab_fb = None
    fb_scan = None
    fb_drow = fb_rcnt = fb_rows_seg = None
    fb_seg = 0
    if dist and fb_entry_ids.size:
        # scan side channel (``dist`` docstring): fallback products in
        # entry order + a plan-known placement into the phase-matched fb
        # merge segment — shard-uniform shapes, no routed shuffle plans
        l_fb = lens[fb_entry_ids].astype(np.int64)
        pr = np.repeat(fb_entry_ids.astype(np.int64), l_fb)
        cum = np.concatenate([[0], np.cumsum(l_fb)[:-1]])
        kin = np.arange(pr.size, dtype=np.int64) - np.repeat(cum, l_fb)
        ii = starts[pr].astype(np.int64) + kin
        flags = np.zeros(pr.size, bool)
        flags[cum] = True
        rows_fb = row_of_entry[fb_entry_ids]
        rfirst = np.flatnonzero(
            np.diff(np.concatenate([[-1], rows_fb])) != 0
        )
        rcnt = np.diff(np.concatenate([rfirst, [rows_fb.size]]))
        c0r = c_rpt[rows_fb[rfirst]].astype(np.int64)
        gapf = np.empty(rfirst.size, np.int64)
        gapf[0] = c0r[0] % LANES
        gapf[1:] = (c0r[1:] - c0r[:-1] - rcnt[:-1]) % LANES
        csf = np.cumsum(gapf + rcnt)
        fb_drow = csf - rcnt
        fb_seg = _round_up(int(csf[-1]), LANES)
        pos_in_seg = np.repeat(fb_drow, rcnt) + (
            np.arange(rows_fb.size, dtype=np.int64)
            - np.repeat(rfirst, rcnt)
        )
        place = np.full(fb_seg, -1, np.int64)
        place[pos_in_seg] = np.arange(rows_fb.size, dtype=np.int64)
        fb_scan = tuple(jnp.asarray(x) for x in (
            apos[ii].astype(np.int32), bpos[ii].astype(np.int32),
            flags, (cum + l_fb - 1).astype(np.int32),
            place.astype(np.int32),
        ))
        fb_rcnt = rcnt
        fb_rows_seg = rows_fb[rfirst]
    elif fb_entry_ids.size:
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
    fb_perm = None
    if slab_fb is not None:
        fb_ent = np.asarray(slab_fb["asm_entry"], np.int64)
        fb_pos = np.asarray(slab_fb["asm_pos"], np.int64)
        ofb = np.argsort(fb_ent, kind="stable")
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

    # --- merge: per-window entry runs (wrap-aware) + fallback rows ------
    out_base_w = np.array(
        [class_arena_base[win_class[w]] for w in range(n_wins)], np.int64
    ) + win_loc.astype(np.int64) * win_width
    wnz = np.flatnonzero(n_ent_w > 0)
    n1 = np.minimum(n_ent_w[wnz], win_width[wnz] - phi_w[wnz])
    n2 = n_ent_w[wnz] - n1
    r_src = [out_base_w[wnz] + phi_w[wnz]]
    r_dst = [e0_w[wnz]]
    r_len = [n1]
    wrap = np.flatnonzero(n2 > 0)
    if wrap.size:
        r_src.append(out_base_w[wnz[wrap]])
        r_dst.append(e0_w[wnz[wrap]] + n1[wrap])
        r_len.append(n2[wrap])
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
    if extras_out is not None:
        # raw tables for the SPMD stacker (parallel/spgemm_window.py):
        # merge runs in shard-local arena coordinates + the per-class
        # bases the stacker rebases against after step padding
        extras_out.update(
            mrg_src=mrg_src, mrg_dst=mrg_dst, mrg_len=mrg_len,
            class_bases=[int(b) for b, _, _, _ in class_geom],
            class_widths=[int(W) for _, _, W, _ in class_geom],
            arena_len=int(arena_len), fb_seg=int(fb_seg),
            c_cap=int(c_cap),
            eaidx_cls=[np.asarray(e) for e in eaidx_all],
        )

    b8_gp_top = None
    apv_gp_top = None
    apv_shuffle = apv_fill = None
    apv_k = 0
    apv_len = 0
    if fused_expand:
        from nsparse_tpu.ops.kernels.flat_gather import (
            build_flat_gather_plan,
        )

        eaidx_cat = (
            np.concatenate(eaidx_all) if eaidx_all
            else np.zeros(0, np.int32)
        )
        if dist:
            # stacked-plan SPMD path: per-shard plans are normalized and
            # tree-stacked, so keep the shard-uniform flat-gather route
            # (a routed shuffle's geometry is shard-dependent)
            apv_gp_top = build_flat_gather_plan(eaidx_cat)
        else:
            apv_shuffle, apv_fill, apv_k = _build_apv_plan(
                eaidx_cat, nnz_a
            )
            apv_len = int(eaidx_cat.size)
        b8_gp_top = build_flat_gather_plan(
            np.asarray(b8_idx, dtype=np.int32)
        )
        if extras_out is not None:
            extras_out["b8_idx"] = np.asarray(b8_idx, dtype=np.int32)
        _tick("apv-gp")
    win = WindowStructure(
        benes=tuple(benes),
        fused=tuple(fused_plans),
        merge=merge,
        fb_shuffle=fb_shuffle,
        fb_lvl_idx=fb_lvl_idx,
        fb_perm=fb_perm,
        b8_gp=b8_gp_top,
        apv_gp=apv_gp_top,
        apv_shuffle=apv_shuffle,
        apv_fill=apv_fill,
        apv_k=int(apv_k),
        apv_len=int(apv_len),
        fb_scan=fb_scan,
        class_geom=tuple(class_geom),
        tier_geom=tuple(tier_geoms),
        fb_levels=fb_levels,
        fb_off=0 if fused_expand else int(fb_base),
        fb_len=int(fb_len),
        n_compact=int(arena_len),
        fused_expand=bool(fused_expand),
        bank_rows=int(bank_rows),
    )
    return win, pw_plan


def spgemm_numeric_window(plan, a: CSR, b: CSR) -> CSR:
    """Fused window-arena numeric phase (pure jit): expand -> per-class
    tier-1 Benes -> fused [folds + tiers + extraction + entry order]
    kernel -> monotone run-copy compaction (+ fallback-row side
    channel)."""
    from nsparse_tpu.ops.kernels.piecewise import piecewise_expand
    from nsparse_tpu.ops.kernels.runcopy import runcopy
    from nsparse_tpu.ops.kernels.shuffle_pallas import (
        planned_shuffle,
        tile_benes_apply,
    )
    from nsparse_tpu.ops.kernels.window_fused import fused_class_apply
    from nsparse_tpu.ops.spgemm import slab_class_reduce

    w: WindowStructure = plan.win
    segs = []
    if w.fused_expand:
        from nsparse_tpu.ops.kernels.piecewise import build_bank

        bank = build_bank(w.b8_gp, w.bank_rows, b.val)
        if w.apv_shuffle is not None:
            apv_cat = apv_values(w, a.val)
        else:  # dist-stacked plans keep the flat-gather route
            from nsparse_tpu.ops.kernels.flat_gather import flat_gather

            a_pad = jnp.concatenate([a.val, jnp.zeros(1, a.val.dtype)])
            apv_cat = flat_gather(w.apv_gp, a_pad)
        for fp in w.fused:
            segs.append(fused_class_apply(
                fp, bank=bank, apv=apv_cat[fp.apv_lo : fp.apv_hi]
            ))
        prod = None
    else:
        prod = piecewise_expand(plan.pw, a.val, b.val)
        for bp, fp, (base, slots, width, levels) in zip(
            w.benes, w.fused, w.class_geom
        ):
            x = tile_benes_apply(bp, prod[base : base + slots])
            segs.append(fused_class_apply(fp, x))
    res = jnp.concatenate(segs) if len(segs) > 1 else segs[0]
    if w.fb_scan is not None:
        # dist-mode fallback side channel: gathers + segmented scan are
        # shard-uniform XLA (f64-capable); placement is plan-known
        from nsparse_tpu.ops.spgemm import _segmented_inclusive_scan

        fb_apos, fb_bpos, fb_flags, fb_ends, fb_place = w.fb_scan
        prod_fb = a.val[fb_apos] * b.val[fb_bpos]
        ss = _segmented_inclusive_scan(prod_fb, fb_flags)
        totals = ss[fb_ends]
        fb_res = jnp.where(
            fb_place >= 0, totals[jnp.clip(fb_place, 0)], 0
        ).astype(res.dtype)
        fb_seg = int(w.merge.n_src) - w.n_compact
        fb_res = jnp.pad(
            fb_res, (0, max(fb_seg - int(fb_res.shape[0]), 0))
        )
        res = jnp.concatenate([res, fb_res])
    elif w.fb_shuffle is not None:
        if prod is None:
            bank_arg = bank if w.fused_expand else None
            prod = piecewise_expand(plan.pw, a.val, b.val, bank=bank_arg)
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
