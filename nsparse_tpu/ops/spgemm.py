"""SpGEMM C = A @ B via expand / sort / compress (ESC) with a reusable plan.

TPU-native redesign of the reference's two-phase hash SpGEMM
(``cuda-c/src/kernel/kernel_spgemm_hash_template.cu``): shared-memory hash
tables with atomicCAS insert + atomicAdd accumulate do not map to TPU (no
scatter atomics, vector units want contiguous work), so the same two phases
are recast on sort/scan primitives:

- **symbolic** (analog of ``set_row_nnz``): expand every intermediate
  product (a_ik, b_kj), sort by (i, j), count segment boundaries — on the
  host (C++/numpy planner) or fully on device (``spgemm_plan_device``,
  ``jax.lax.sort``); deterministic and race-free by construction.
- **numeric** (analog of ``calculate_value_col_bin``), all under one jit:
  A-values ride the planned banded/windowed gather kernels (product order
  is row-sorted, so apos stays inside each row's slice); B-values are a
  forward fill in bpos-sorted order (window-class fill indices) followed
  by one ``lax.sort`` back to plan order; accumulation is a manual
  Hillis-Steele segmented inclusive scan plus segment-end extraction.
  Plain-XLA gathers remain as the fp64 / off-TPU / device-plan fallback
  (``spgemm_numeric_segsum`` keeps the reference-shaped semantics oracle).

The captured :class:`SpgemmPlan` is the analog of both the reference's
symbolic output *and* its ``SpGEMM_Hash_Numeric`` re-run API
(``cuda-cpp/inc/HashSpGEMM.hpp:1014-1027``): for a fixed sparsity pattern,
new values of A/B re-run the numeric phase only.

Static-shape policy: the total intermediate-product count P must be known
to size the expansion, and the output nnz must be known to size C.  Both
require one device->host sync each — mirroring the reference's single
unavoidable sync after the symbolic phase
(``kernel_spgemm_hash_d.cu:1183-1184``).  Output columns are sorted
ascending within each row, matching the reference's sorted output used for
exact-structure comparison (``template.cu:805-815``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nsparse_tpu.formats.csr import CSR

LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((max(x, 1)) + m - 1) // m * m


# ---------------------------------------------------------------------------
# FLOP counting (analog of get_spgemm_flop, kernel_spgemm_cu_csr.cu:35-57)
# ---------------------------------------------------------------------------


@jax.jit
def _intprod_per_row(a: CSR, b: CSR) -> jax.Array:
    """Per-row intermediate product counts: sum_k in row(i) nnz(B[k, :])."""
    b_deg = b.rpt[1:] - b.rpt[:-1]
    cnt = jnp.where(a.valid_mask(), b_deg[a.col], 0)
    per_row = jax.ops.segment_sum(
        cnt, a.row_ids(), num_segments=a.shape[0] + 1, indices_are_sorted=True
    )
    return per_row[: a.shape[0]]


def spgemm_flops(a: CSR, b: CSR) -> int:
    """Total FLOPs = 2 * total intermediate products (host int)."""
    return 2 * int(jnp.sum(_intprod_per_row(a, b)))


# ---------------------------------------------------------------------------
# Plan
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpgemmPlan:
    """Captured sparsity computation of C = A @ B.

    Attributes:
      apos: (P_pad,) gather index into A's padded nnz arrays, sorted order.
      bpos: (P_pad,) gather index into B's padded nnz arrays, sorted order.
      out_pos: (P_pad,) output slot per product; invalid slots -> c_cap.
      ends: (c_cap,) index of the LAST product of each output entry (pad
        slots point at P_pad - 1; their extracted value is masked off).
      av_gp: windowed-gather routing for ``a.val[apos]`` (or None when the
        plan was built on device).
      ends_gp: windowed-gather routing for the segment-end extraction (or
        None when the plan was built on device).
      cmp_masks: (n_passes, P_pad // 32) int32 bit-packed move masks for the
        log-shift compaction that extracts segment totals: pass b moves the
        value at position p + 2^b into p wherever bit p is set.  Monotone
        compaction by LSB-first conditional shifts is collision-free (two
        live elements can never meet: their distance difference is bounded
        by the unmarked slots strictly between them).
      uniq_bpos: (u_cap,) sorted unique b-entry indices (B-value sort path).
      bv_gp: windowed-gather routing for the B-value expansion in
        bpos-sorted product order: the expansion there is a forward fill,
        whose fill indices advance ~1 per duplicate group — window-class
        by construction (or None).
      bp_rank: (P_pad,) the sorted-order position of each bpos-ordered
        product; one ``lax.sort`` by this key restores plan order (the
        fallback when no routed shuffle is available).
      bv_shuffle: routed planned-shuffle (bpos order -> plan order,
        ``ops/kernels/shuffle_pallas.py``) replacing that ``lax.sort``
        at a fraction of its cost; or None.
      slab_shuffle: routed planned-shuffle (A-entry-major product order ->
        bin-padded slab order).  The slab path replaces the segmented scan
        + compaction with per-class padded reductions — the repo's
        realization of the reference's FLOP binning driving execution
        (``kernel_spgemm_hash_d.cu:1077-1185``); or None.
      pw: PiecewisePlan forming the A-entry-major products (both value
        streams are piecewise trivial there: constant a.val per run,
        contiguous b.val slices — ``ops/kernels/piecewise.py``).
      lvl_idx: per level >= 2, gather indices (sentinel -1 = zero) from the
        previous level's chunk-class sums into this level's slab.
      asm_shuffle: routed planned-shuffle assembling c_val from the
        concatenation of every level's class sums.
      slab_levels: static ((L, count), ...) per level.
      c_rpt: (M+1,) output row pointers.
      c_col: (c_cap,) output column indices (sorted within rows).
      shape: static (M, N) of C.
      c_nnz: static output nnz.
      n_products: static total intermediate products P (flop = 2 * P).
    """

    apos: jax.Array
    bpos: jax.Array
    out_pos: jax.Array
    ends: jax.Array
    av_gp: object  # Optional[FlatGatherPlan]
    ends_gp: object  # Optional[FlatGatherPlan]
    cmp_masks: object  # Optional[jax.Array]
    uniq_bpos: object  # Optional[jax.Array]
    bv_gp: object  # Optional[FlatGatherPlan]
    bp_rank: object  # Optional[jax.Array]
    bv_shuffle: object  # Optional[ShufflePlan]
    slab_shuffle: object  # Optional[ShufflePlan]
    pw: object  # Optional[PiecewisePlan]
    lvl_idx: object  # Tuple[jax.Array, ...]
    asm_shuffle: object  # Optional[ShufflePlan]
    c_rpt: jax.Array
    c_col: jax.Array
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    c_nnz: int = dataclasses.field(metadata=dict(static=True))
    n_products: int = dataclasses.field(metadata=dict(static=True))
    slab_levels: Tuple = dataclasses.field(
        default=(), metadata=dict(static=True)
    )
    # row-localized window arenas (ops/spgemm_window.py); when set, the
    # numeric phase routes per-window Benes + run-copy extraction instead
    # of the global slab shuffle
    win: object = None  # Optional[WindowStructure]

    @property
    def c_capacity(self) -> int:
        return int(self.c_col.shape[0])

    @property
    def flops(self) -> int:
        return 2 * self.n_products


def _expand_sort(a: CSR, b: CSR, p_pad: int):
    """Expand all intermediate products and sort by (row, col).

    Returns sorted (row, col, apos, bpos) plus boundary flags. Shapes are
    (p_pad,); slots beyond the true product count carry row == M.
    """
    m = a.shape[0]
    cap_a = a.capacity

    n = b.shape[1]
    b_deg = b.rpt[1:] - b.rpt[:-1]
    cnt = jnp.where(a.valid_mask(), b_deg[a.col], 0)
    off = jnp.cumsum(cnt)  # inclusive prefix; off[-1] == P
    total = off[cap_a - 1] if cap_a > 0 else jnp.int32(0)

    t = jnp.arange(p_pad, dtype=jnp.int32)
    # Which A-entry does product t come from?  searchsorted lowers to
    # ~log2(P) gather rounds (minutes-scale at 17M on TPU); a scatter of
    # ones at the nnz_a segment starts + one cumsum does the same job at
    # memory speed.
    starts_k = off - cnt  # exclusive prefix per A entry
    seg_marks = jnp.zeros(p_pad + 1, jnp.int32).at[
        jnp.minimum(starts_k, p_pad)
    ].add(jnp.where(jnp.arange(cap_a) > 0, 1, 0))
    k = jnp.cumsum(seg_marks[:p_pad]).astype(jnp.int32)
    k = jnp.minimum(k, cap_a - 1)
    start = (off - cnt)[k]
    valid = t < total

    acol = a.col[k]
    bpos = b.rpt[acol] + (t - start)
    bpos = jnp.where(valid, bpos, 0)
    a_rows = a.row_ids()
    row = jnp.where(valid, a_rows[k], m)
    ccol = jnp.where(valid, b.col[bpos], 0)

    # one packed (row, col) key halves the sort's operand traffic;
    # row * n + col < 2^31 is enforced by the caller
    key = row * jnp.int32(n) + ccol
    key = jnp.where(valid, key, jnp.int32(2**31 - 1))
    key_s, apos_s, bpos_s = jax.lax.sort((key, k, bpos), num_keys=1)
    row_s = jnp.where(
        key_s == 2**31 - 1, m, key_s // jnp.int32(n)
    )
    col_s = jnp.where(key_s == 2**31 - 1, 0, key_s % jnp.int32(n))

    prev_row = jnp.concatenate([jnp.full((1,), -1, row_s.dtype), row_s[:-1]])
    prev_col = jnp.concatenate([jnp.full((1,), -1, col_s.dtype), col_s[:-1]])
    is_new = (row_s != prev_row) | (col_s != prev_col)
    flags = is_new & (row_s < m)
    return row_s, col_s, apos_s, bpos_s, flags


_expand_sort_jit = jax.jit(_expand_sort, static_argnums=2)


CHUNK = 512  # slab chunk width: entries with more products are split


def _ceil_pow2(x: np.ndarray) -> np.ndarray:
    """Elementwise next power of two (>= 1) via the float exponent."""
    x = np.maximum(x, 1)
    e = np.frexp((x - 1).astype(np.float64))[1]  # ceil(log2(x)) for x>1
    return np.where(x <= 1, 1, np.int64(1) << e).astype(x.dtype)


def _build_slab_structure(
    ends: np.ndarray,
    p_total: int,
    src_pos: np.ndarray,
    zero_pool: np.ndarray,
    src_len: int,
    c_cap: int,
    targets: np.ndarray | None = None,
):
    """Bin-padded slab layout for the ESC accumulation.

    Entries (and, recursively, their 512-product chunks) are binned by
    geometric product-count classes; each class-(L) member occupies L slab
    slots.  Returns everything the numeric slab path needs: the shuffle
    source (``src_pos[plan-order product]`` = its position in the source
    product array, pads -> zero sources), per-level class tables,
    level >= 2 gather indices, and the per-(level, class) assembly index
    arrays.

    ``targets``: optional GLOBAL output-entry id per item (default
    ``arange(len(ends))``) — the window-arena path feeds a SUBSET of
    entries (fallback rows + deep window slabs) through this structure and
    composes the assembly permutation itself from the returned raw
    (``asm_entry``, ``asm_pos``, ``res_off``) values.

    The binning realizes the reference's per-row FLOP classes
    (``set_max_bin``/``set_min_bin``, kernel_spgemm_hash_template.cu:59-235)
    at output-entry granularity: every class is a rectangular reduction the
    VPU executes without a scan.
    """
    c_nnz = ends.size
    starts = np.empty(c_nnz, dtype=np.int64)
    if c_nnz:
        starts[0] = 0
        starts[1:] = ends[:-1] + 1
    lens = ends.astype(np.int64) - starts + 1

    levels = []          # static ((L, count), ...) per level
    lvl_idx = []         # per level >= 2: int32 gather (sentinel -1)
    asm_entry = []       # entry ids whose final sum lives in res_concat
    asm_pos = []         # ... at these positions
    res_off = 0          # running offset into the concatenated res arrays
    slab_idx1 = None     # level-1: plan-order product index per slab slot

    item_target = (
        np.asarray(targets, dtype=np.int64)
        if targets is not None
        else np.arange(c_nnz, dtype=np.int64)
    )
    item_start, item_len = starts, lens
    level_i = 0
    while item_start.size:
        nch = -(-item_len // CHUNK)
        big = nch > 1
        rep = np.where(big, nch, 1)
        n_rows = int(rep.sum())
        row_item = np.repeat(np.arange(item_len.size, dtype=np.int64), rep)
        cum = np.zeros(item_len.size + 1, dtype=np.int64)
        np.cumsum(rep, out=cum[1:])
        j_in = np.arange(n_rows, dtype=np.int64) - cum[row_item]
        # int32 from here on: slab positions < 2^31 and the (L, cnt_pad)
        # class mats total ~p_slab slots — half the memory traffic matters
        row_start = (item_start[row_item] + j_in * CHUNK).astype(np.int32)
        row_len = np.minimum(
            item_len[row_item] - j_in * CHUNK, CHUNK
        ).astype(np.int32)
        row_is_chunk = big[row_item]
        row_cls = np.where(row_is_chunk, CHUNK, _ceil_pow2(row_len))

        class_sizes = sorted(set(np.unique(row_cls).tolist()))
        cls_code = np.searchsorted(class_sizes, row_cls)
        order = np.argsort(cls_code, kind="stable")
        rank_of_row = np.empty(n_rows, dtype=np.int64)
        rank_of_row[order] = np.arange(n_rows)
        # class boundaries in the sorted order: O(1) per-class slicing
        cls_bounds = np.searchsorted(
            cls_code[order], np.arange(len(class_sizes) + 1)
        )

        classes = []
        idx_parts = []
        chunk_rank0 = None  # rank offset of the CHUNK class
        rank_base = 0
        for ci, L in enumerate(class_sizes):
            rows_l = order[cls_bounds[ci] : cls_bounds[ci + 1]]
            cnt = rows_l.size
            # pad the member count to the lane width so the numeric phase's
            # halving adds stay 128-aligned (pad columns are sentinel-only)
            cnt_pad = _round_up(cnt, LANES)
            classes.append((int(L), int(cnt_pad)))
            # slab gather indices, member-minor (L, cnt_pad): the class
            # reduction is then log2(L) contiguous half + half adds
            mat = np.full((L, cnt_pad), -1, dtype=np.int32)
            larange = np.arange(L, dtype=np.int32)[:, None]
            np.add(row_start[rows_l][None, :], larange, out=mat[:, :cnt])
            np.copyto(
                mat[:, :cnt], -1,
                where=larange >= row_len[rows_l][None, :],
            )
            idx_parts.append(mat.reshape(-1))
            if L == CHUNK:
                chunk_rank0 = rank_base
            # assembly source for final rows of this class: entry ->
            # (global res offset + rank)
            fin = ~row_is_chunk[rows_l]
            if fin.any():
                asm_entry.append(item_target[row_item[rows_l[fin]]])
                asm_pos.append(res_off + np.flatnonzero(fin))
            res_off += cnt_pad
            rank_base += cnt
        levels.append(tuple(classes))
        this_idx = np.concatenate(idx_parts) if idx_parts else np.zeros(
            0, np.int32
        )
        if level_i == 0:
            slab_idx1 = this_idx
        else:
            lvl_idx.append(this_idx)

        # items surviving to the next level: big items; their new products
        # are their chunk ranks within this level's CHUNK class
        if big.any():
            bi = np.flatnonzero(big)
            # rank (within class CHUNK) of each big item's first chunk
            first_row = cum[bi]
            item_start = rank_of_row[first_row] - chunk_rank0
            item_len = nch[bi]
            item_target = item_target[bi]
        else:
            item_start = np.zeros(0, np.int64)
            item_len = np.zeros(0, np.int64)
            item_target = np.zeros(0, np.int64)
        level_i += 1

    # level-1 arrays: the shuffle source.  Pads draw zeros from the pool of
    # unreferenced source positions (interior run pads + the tail); the
    # pool's leftovers become extra dummy targets so the full src stays a
    # permutation (the Clos router needs injectivity and the completion
    # step assumes values < the padded grid).
    p_slab = slab_idx1.size
    valid = slab_idx1 >= 0
    n_pads = int((~valid).sum())
    n_total = max(p_slab, src_len)
    pool = np.concatenate([
        zero_pool.astype(np.int64),
        np.arange(src_len, n_total, dtype=np.int64),
    ])
    # |pool| = n_total - p_total == n_pads + (n_total - p_slab): exact
    if pool.size < n_pads:
        raise AssertionError("zero-source pool too small")  # cannot happen
    src = np.empty(n_total, dtype=np.int32)
    src[:p_slab][valid] = src_pos[slab_idx1[valid]]
    src[:p_slab][~valid] = pool[:n_pads]
    src[p_slab:] = pool[n_pads:]

    e_all = np.concatenate(asm_entry) if asm_entry else np.zeros(0, np.int64)
    p_all = np.concatenate(asm_pos) if asm_pos else np.zeros(0, np.int64)
    out = dict(
        src=src,
        levels=tuple(levels),
        lvl_idx=tuple(lvl_idx),
        asm_entry=e_all,
        asm_pos=p_all,
        res_off=res_off,
        p_slab=p_slab,
    )
    if targets is not None:  # caller composes the assembly permutation
        return out

    # assembly permutation: c_val[e] = res_concat[asm_src[e]]; pad targets
    # absorb the leftover res positions so the map is a full permutation
    n_asm = max(res_off, c_cap)
    asm_src = np.empty(n_asm, dtype=np.int32)
    used = np.zeros(n_asm, dtype=bool)
    asm_src[e_all] = p_all
    used[p_all] = True
    asm_src[c_nnz:] = np.flatnonzero(~used)[: n_asm - c_nnz]
    out["asm_src"] = asm_src
    return out


def spgemm_plan(
    a: CSR,
    b: CSR,
    shuffle: bool | None = None,
    layout: str | None = None,
    dist: bool = False,
    extras_out: dict | None = None,
) -> SpgemmPlan:
    """Symbolic phase: build the reusable plan on the host.

    Host-side numpy (optionally the C++ planner, see ``nsparse_tpu.native``):
    planning is one-time precompute per sparsity pattern, exactly like the
    reference's symbolic phase whose result must reach the host anyway to
    size C (``kernel_spgemm_hash_d.cu:1183-1184``).  The expansion is
    segmented-sort-by-column *within* rows only — expansion order is already
    row-major, so the key is the product column alone, sorted stably.

    ``layout``: "window" forces the row-localized window arenas
    (``ops/spgemm_window.py``), "global" forces the round-2 global
    slack-Clos slab pipeline, None picks windows when applicable.
    """
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"shape mismatch {a.shape} @ {b.shape}")
    m, n = a.shape[0], b.shape[1]

    import os as _os
    import time as _time
    _t0 = _time.time()
    _timing = bool(_os.environ.get("NSPARSE_WIN_TIMING"))

    def _tick(stage):
        nonlocal _t0
        if _timing:
            now = _time.time()
            print(f"[plan] {stage}: {now - _t0:.2f}s", flush=True)
            _t0 = now

    rpt_a, col_a, _ = a.host_arrays()
    rpt_b, col_b, _ = b.host_arrays()
    nnz_a = a.nnz
    col_a = col_a[:nnz_a].astype(np.int64)
    deg_a = np.diff(rpt_a).astype(np.int64)
    deg_b = np.diff(rpt_b).astype(np.int64)

    from nsparse_tpu.native import spgemm_plan_host

    (apos, bpos, out_pos, c_rpt, c_col, p_total, c_nnz) = spgemm_plan_host(
        rpt_a, col_a, deg_a, rpt_b, col_b, deg_b, m, n, nnz_a
    )

    _tick("host-symbolic")
    p_pad = _round_up(p_total, LANES)
    c_cap = _round_up(c_nnz, LANES)

    def _pad(x, length, fill):
        out = np.full(length, fill, dtype=np.int32)
        out[: x.size] = x
        return out

    # last product of each output entry: starts are where out_pos changes
    if c_nnz:
        neq = np.empty(out_pos.size, bool)
        neq[0] = True
        np.not_equal(out_pos[1:], out_pos[:-1], out=neq[1:])
        starts = np.flatnonzero(neq)
        ends = np.concatenate(
            [starts[1:] - 1, [p_total - 1]]
        ).astype(np.int32)
    else:
        ends = np.zeros(0, dtype=np.int32)

    from nsparse_tpu.ops.kernels.flat_gather import build_flat_gather_plan

    _tick("ends")
    apos_p = _pad(apos, p_pad, int(apos[-1]) if apos.size else 0)
    ends_p = _pad(ends, c_cap, p_pad - 1)

    # Slab path (the default at scale): products are formed in A-entry-
    # major order by the piecewise-run kernel (both value streams are
    # piecewise trivial there, ``ops/kernels/piecewise.py``), routed once
    # into the bin-padded slab layout, and reduced per class — no sort, no
    # scan.  Plans are reusable across value re-runs (the
    # SpGEMM_Hash_Numeric amortization model).
    bv_shuffle = None
    slab = None
    pw_plan = None
    win = None
    if (layout is None and jax.default_backend() == "tpu"
            and a.val.dtype == jnp.float64):
        # f64 route: the global slab pipeline separates movement (planes-
        # capable Pallas shuffles) from arithmetic (XLA f64 adds); the
        # fused window kernels fold in-kernel and are f32-only
        layout = "global"
    if shuffle is None:
        shuffle = p_total >= (1 << 20)
    if shuffle and p_total and c_nnz and layout in (None, "window"):
        from nsparse_tpu.ops.spgemm_window import build_window_structure

        wres = build_window_structure(
            rpt_a, col_a, deg_a, rpt_b, deg_b,
            apos, bpos, out_pos, ends, c_rpt,
            p_total, c_nnz, c_cap, m, nnz_a,
            force=(layout == "window"),
            dist=dist, extras_out=extras_out,
        )
        _tick("window-structure")
        if wres is not None:
            win, pw_plan = wres
        elif layout == "window":
            raise ValueError(
                "layout='window' requested but no row fits a window arena"
            )
    if shuffle and p_total and c_nnz and win is None:
        from nsparse_tpu.ops.kernels.piecewise import build_piecewise_plan
        from nsparse_tpu.ops.kernels.shuffle_pallas import (
            build_shuffle_plan,
        )

        # runs of the A-entry-major expansion: one per A entry (its B row
        # is a contiguous slice of the 8-aligned B table).  Both run
        # starts and table offsets are 8-aligned so the device kernel
        # reads every piece as a pure dynamic sublane slice from the
        # pre-rolled bank (lane rolls cost ~8 cyc/vreg; slices are free).
        deg8 = -(-deg_b // 8) * 8
        rpt8 = np.zeros(deg8.size + 1, dtype=np.int64)
        np.cumsum(deg8, out=rpt8[1:])
        b8_len = int(rpt8[-1])
        row_of = np.repeat(np.arange(deg8.size, dtype=np.int64), deg8)
        off_in = np.arange(b8_len, dtype=np.int64) - rpt8[row_of]
        b8_idx = np.where(
            off_in < deg_b[row_of], rpt_b[row_of] + off_in, -1
        )
        seg_len = deg_b[col_a]
        seg8 = deg8[col_a]
        run_start = np.zeros(nnz_a, dtype=np.int64)
        np.cumsum(seg8[:-1], out=run_start[1:])
        p_total8 = int(seg8.sum())
        run_boff = rpt8[col_a]
        run_aidx = np.arange(nnz_a, dtype=np.int64)
        pw_plan = build_piecewise_plan(
            run_start, run_boff, run_aidx, p_total8, nnz_a, b8_len,
            b8_idx=b8_idx,
        )
        # closed-form position of each plan-order product in aem order:
        # per-A-entry delta keeps the p_total-sized temporaries int32
        delta = (run_start - rpt_b[col_a]).astype(np.int32)
        aem_pos = delta[apos] + np.asarray(bpos, np.int32)
        # unreferenced aem positions (interior run pads) are the zero pool
        pad_cnt = seg8 - seg_len
        pr = np.repeat(np.arange(nnz_a, dtype=np.int64), pad_cnt)
        cum = np.zeros(nnz_a + 1, dtype=np.int64)
        np.cumsum(pad_cnt, out=cum[1:])
        k_in = np.arange(pr.size, dtype=np.int64) - cum[pr]
        interior = run_start[pr] + seg_len[pr] + k_in
        slab = _build_slab_structure(
            ends, p_total, aem_pos, interior, p_total8, c_cap
        )
        slab["shuffle"] = build_shuffle_plan(slab["src"])
        slab["asm_shuffle"] = build_shuffle_plan(slab["asm_src"])

    # B-value sort path (non-slab fallback): in bpos-sorted product order
    # the expansion is a forward fill of the (sorted unique) B entries —
    # its fill indices advance by one per duplicate group, so the gather is
    # window-class by construction; one device sort by the saved rank
    # restores plan order.
    if p_total and slab is None and win is None:
        order_bp = np.argsort(bpos, kind="stable")
        sorted_bpos = bpos[order_bp]
        starts = np.empty(p_total, dtype=bool)
        starts[0] = True
        np.not_equal(sorted_bpos[1:], sorted_bpos[:-1], out=starts[1:])
        fill_idx = (np.cumsum(starts) - 1).astype(np.int32)
        uniq = sorted_bpos[starts].astype(np.int32)
    else:
        order_bp = np.zeros(0, np.int64)
        fill_idx = np.zeros(0, np.int32)
        uniq = np.zeros(0, np.int32)
    u_cap = _round_up(uniq.size, LANES)

    # scan + compaction structures only serve the non-slab fallback; their
    # build (a ~24-pass python/packbits loop) and device upload are skipped
    # when the slab path owns the numeric phase
    cmp_masks = None
    if slab is None and win is None:
        if c_nnz:
            ends64 = ends.astype(np.int64)
            dist = ends64 - np.arange(c_nnz, dtype=np.int64)
            n_passes = max(int(dist.max()).bit_length(), 1)
            nbits = (p_pad // 32 + 1) * 32
            cmp_masks = np.zeros((n_passes, nbits // 32), dtype=np.uint32)
            for bbit in range(n_passes):
                sel = (dist >> bbit) & 1 == 1
                tgt = (
                    ends64[sel] - (dist[sel] & ((1 << bbit) - 1))
                    - (1 << bbit)
                )
                bits = np.zeros(nbits, dtype=np.uint8)
                bits[tgt] = 1  # targets strictly increase: no duplicates
                cmp_masks[bbit] = np.packbits(
                    bits, bitorder="little"
                ).view(np.uint32)
        else:
            cmp_masks = np.zeros((1, p_pad // 32 + 1), dtype=np.uint32)

    _tick("pre-push")
    # window plans never read the product-granular arrays (the window
    # numeric is pw + win only): keep them empty instead of shipping
    # ~16 bytes/product to the device (4 x 68 MB on R-MAT-14 — dominant
    # plan-phase H2D traffic on tunnel-attached chips, and re-transferred
    # on every jit call that takes the plan as an argument)
    _empty = np.zeros(0, np.int32)
    _win_built = win is not None
    return SpgemmPlan(
        apos=jnp.asarray(_empty if _win_built else apos_p),
        bpos=jnp.asarray(
            _empty if _win_built else _pad(bpos, p_pad, 0)
        ),
        out_pos=jnp.asarray(
            _empty if _win_built else _pad(out_pos, p_pad, c_cap)
        ),
        ends=jnp.asarray(_empty if _win_built else ends_p),
        av_gp=(
            build_flat_gather_plan(apos_p, window=1024)
            if slab is None and win is None else None
        ),
        ends_gp=None,  # superseded by cmp_masks (log-shift compaction)
        cmp_masks=(
            jnp.asarray(cmp_masks.view(np.int32))
            if cmp_masks is not None else None
        ),
        uniq_bpos=jnp.asarray(
            _empty if _win_built else _pad(uniq, u_cap, 0)
        ),
        bv_gp=(
            build_flat_gather_plan(
                # -1 sentinels: pad slots come out as ZEROS
                _pad(fill_idx, p_pad, -1)
            )
            if slab is None and win is None else None
        ),
        bp_rank=(
            jnp.asarray(_pad(order_bp.astype(np.int32), p_pad, p_pad - 1))
            if slab is None and win is None else None
        ),
        bv_shuffle=bv_shuffle,
        slab_shuffle=slab["shuffle"] if slab else None,
        pw=pw_plan,
        lvl_idx=tuple(jnp.asarray(i) for i in slab["lvl_idx"]) if slab
        else (),
        asm_shuffle=slab["asm_shuffle"] if slab else None,
        slab_levels=slab["levels"] if slab else (),
        c_rpt=jnp.asarray(c_rpt),
        c_col=jnp.asarray(_pad(c_col, c_cap, 0)),
        shape=(m, n),
        c_nnz=c_nnz,
        n_products=p_total,
        win=win,
    )


def spgemm_plan_device(a: CSR, b: CSR) -> SpgemmPlan:
    """Symbolic phase fully on device (``jax.lax.sort`` ESC) — same result
    as :func:`spgemm_plan`; two device->host size syncs, everything else
    stays on the accelerator.  Used when the matrix already lives on device
    (e.g. produced by a previous device-side SpGEMM)."""
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"shape mismatch {a.shape} @ {b.shape}")
    m, n = a.shape[0], b.shape[1]

    if a.shape[0] * b.shape[1] >= 2**31:
        raise ValueError(
            "device planner requires M * N < 2^31 (packed sort key); "
            "use spgemm_plan for larger shapes"
        )
    per_row = _intprod_per_row(a, b)
    p_total = int(jnp.sum(per_row))  # sync 1 (sizes the expansion)
    p_pad = _round_up(p_total, LANES)

    row_s, col_s, apos_s, bpos_s, flags = _expand_sort_jit(a, b, p_pad)

    flags_i = flags.astype(jnp.int32)
    out_pos_valid = jnp.cumsum(flags_i) - 1
    valid = row_s < m
    c_nnz = int(jnp.sum(flags_i))  # sync 2 (sizes C)
    c_cap = _round_up(c_nnz, LANES)

    out_pos = jnp.where(valid, jnp.minimum(out_pos_valid, c_cap - 1), c_cap)

    # Output structure: scatter boundary (row, col) to their output slot.
    tgt = jnp.where(flags, out_pos_valid, c_cap)
    c_col = jnp.zeros(c_cap + 1, dtype=jnp.int32).at[tgt].set(col_s)[:c_cap]
    row_counts = jax.ops.segment_sum(
        flags_i, row_s, num_segments=m + 1, indices_are_sorted=True
    )[:m]
    c_rpt = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(row_counts).astype(jnp.int32)]
    )
    # segment ends: scatter each boundary position to its entry, then
    # the next entry's start - 1 (searchsorted over 17M keys costs
    # seconds on TPU; one scatter + slice is memory-speed)
    tpos = jnp.arange(p_pad, dtype=jnp.int32)
    starts_e = jnp.zeros(c_cap + 2, jnp.int32).at[
        jnp.where(flags, jnp.minimum(out_pos_valid, c_cap), c_cap + 1)
    ].set(tpos, mode="drop")
    # entries past c_nnz have zero starts; give them end p_total - 1
    idx_e = jnp.arange(c_cap, dtype=jnp.int32)
    ends = jnp.where(
        idx_e < c_nnz - 1, starts_e[idx_e + 1] - 1, p_total - 1
    )
    ends = jnp.clip(ends, 0, p_pad - 1)

    return SpgemmPlan(
        apos=apos_s,
        bpos=bpos_s,
        out_pos=out_pos,
        ends=ends,
        av_gp=None,
        ends_gp=None,
        cmp_masks=None,
        uniq_bpos=None,
        bv_gp=None,
        bp_rank=None,
        bv_shuffle=None,
        slab_shuffle=None,
        pw=None,
        lvl_idx=(),
        asm_shuffle=None,
        c_rpt=c_rpt,
        c_col=c_col,
        shape=(m, n),
        c_nnz=c_nnz,
        n_products=p_total,
    )


def _segmented_inclusive_scan(v: jax.Array, f: jax.Array) -> jax.Array:
    """Hillis-Steele segmented inclusive sum scan (flags mark segment
    starts).  Written as ~log2(P) explicit shift+select steps: XLA compiles
    this trivially, whereas ``jax.lax.associative_scan`` on multi-operand
    carries degenerates at tens-of-millions of elements.  Within-segment
    error matches a tree reduction (no cross-segment cancellation, unlike
    a global cumsum + difference)."""
    n = int(v.shape[0])
    d = 1
    while d < n:
        vs = jnp.concatenate([jnp.zeros((d,), v.dtype), v[:-d]])
        fs = jnp.concatenate([jnp.ones((d,), bool), f[:-d]])
        v = v + jnp.where(f, jnp.zeros_like(v), vs)
        f = f | fs
        d *= 2
    return v


def _masked_compaction(v: jax.Array, masks: jax.Array) -> jax.Array:
    """Move marked elements of ``v`` left to their ranks via LSB-first
    conditional shifts — a plan-precomputed monotone stream compaction.

    ``masks``: (n_passes, words) int32 bit-packs; pass b's bit p means
    "position p takes the value from p + 2^b".  Pure shifted streams — no
    gather/scatter (XLA's gather runs ~0.13 G elem/s on TPU; this runs at
    memory speed).
    """
    n = int(v.shape[0])
    for b in range(int(masks.shape[0])):
        w = masks[b].astype(jnp.uint32)
        bits = (
            (w[:, None] >> jnp.arange(32, dtype=jnp.uint32)[None, :]) & 1
        ).reshape(-1)[:n]
        step = 1 << b
        if step >= n:
            break  # no element can move this far
        shifted = jnp.concatenate([v[step:], jnp.zeros((step,), v.dtype)])
        v = jnp.where(bits == 1, shifted, v)
    return v


def slab_class_reduce(lvl_in, slab_levels, lvl_idx):
    """Reduce bin-padded slab data to per-entry totals (device, in-jit).

    ``lvl_in``: the shuffled slab array; ``slab_levels``: static
    ((L, cnt), ...) per level; ``lvl_idx``: per level >= 2, gather indices
    from the previous level's CHUNK-class sums.  Each member-minor
    (L, cnt) class reduces by contiguous halving adds (elementwise-speed;
    XLA's reduce op is ~10x slower).  Returns the concatenated per-class
    result arrays (`res_concat`)."""
    res_parts = []
    for li, classes in enumerate(slab_levels):
        res_chunk = None
        off = 0
        for L, cnt in classes:
            seg = lvl_in[off : off + cnt * L]
            ll = L
            while ll > 1:
                half = (ll // 2) * cnt
                seg = seg[:half] + seg[half : 2 * half]
                ll //= 2
            off += cnt * L
            res_parts.append(seg)
            if L == CHUNK:
                res_chunk = seg
        if li + 1 < len(slab_levels):
            idx = lvl_idx[li]
            lvl_in = jnp.where(
                idx >= 0, res_chunk[jnp.clip(idx, 0)], 0
            ).astype(lvl_in.dtype)
    return (
        jnp.concatenate(res_parts) if len(res_parts) > 1 else res_parts[0]
    )


def _spgemm_numeric_slab(plan: SpgemmPlan, a: CSR, b: CSR) -> CSR:
    """Slab numeric: form products in A-entry-major order (piecewise-run
    kernel: constant a.val per run times contiguous b.val slices),
    routed-shuffle them into the bin-padded slab layout, reduce each class
    rectangularly, and assemble C.  No sort, no scan, no compaction — the
    FLOP-binned analog of the reference's per-bin numeric kernels
    (``calculate_value_col_bin``)."""
    from nsparse_tpu.ops.kernels.piecewise import piecewise_expand
    from nsparse_tpu.ops.kernels.shuffle_pallas import planned_shuffle

    prod_aem = piecewise_expand(plan.pw, a.val, b.val)
    prod = planned_shuffle(plan.slab_shuffle, prod_aem)
    res_concat = slab_class_reduce(prod, plan.slab_levels, plan.lvl_idx)
    c_val = planned_shuffle(plan.asm_shuffle, res_concat)[
        : plan.c_capacity
    ]
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


def spgemm_numeric(plan: SpgemmPlan, a: CSR, b: CSR) -> CSR:
    """Numeric phase (the ``SpGEMM_Hash_Numeric`` analog: same pattern, new
    values).  Pure jit path, TPU-tuned:

    - ``a.val`` expansion rides the windowed roll-scan gather (products are
      row-sorted, so apos stays inside each row's slice — small windows);
    - ``b.val`` expansion is XLA's gather (power-law columns defeat
      windowing; measured fastest general choice);
    - accumulation is a segmented inclusive scan (``associative_scan``)
      + extraction at segment ends — scan replaces the scatter-add that
      ``segment_sum`` lowers to (TPU has no fast scatter).  The segmented
      scan also avoids the catastrophic cancellation a plain cumsum-diff
      would hit at fp32.
    """
    from nsparse_tpu.ops.kernels import flat_gather as _fg

    on_tpu = _fg.FORCE_PALLAS or jax.default_backend() == "tpu"
    # f64 rides the movement kernels as two uint32 bit planes
    # (ops/kernels/planes.py); arithmetic stays in XLA f64.  Only the
    # fused window kernels (in-kernel folds) are f32-only.
    hot = on_tpu and b.val.dtype in (jnp.float32, jnp.float64)
    if plan.win is not None:
        # window plans carry no product-granular arrays (see spgemm_plan),
        # so the window kernels are the only numeric path for them —
        # interpret-mode Pallas off-TPU
        if (jax.default_backend() == "tpu"
                and b.val.dtype == jnp.float64):
            raise NotImplementedError(
                "the fused window kernels fold in-kernel and cannot "
                "carry f64 on TPU; build the plan with layout='global' "
                "(spgemm_plan does this automatically for f64 inputs)"
            )
        from nsparse_tpu.ops.spgemm_window import spgemm_numeric_window

        return spgemm_numeric_window(plan, a, b)
    if plan.slab_shuffle is not None and hot:
        return _spgemm_numeric_slab(plan, a, b)
    use_sort_path = plan.bv_gp is not None and hot
    if use_sort_path:
        from nsparse_tpu.ops.kernels.flat_gather import flat_gather

        # B-value path: small gather of the unique entries, windowed
        # forward-fill expansion in bpos order, then back to plan order via
        # the routed shuffle (or the lax.sort fallback)
        bu = b.val[plan.uniq_bpos]
        bv_bp = flat_gather(plan.bv_gp, bu)
        pad = plan.bp_rank.shape[0] - bv_bp.shape[0]
        if pad:
            bv_bp = jnp.pad(bv_bp, (0, pad))
        if plan.bv_shuffle is not None:
            from nsparse_tpu.ops.kernels.shuffle_pallas import (
                planned_shuffle,
            )

            bv = planned_shuffle(plan.bv_shuffle, bv_bp)
        else:
            _, bv = jax.lax.sort((plan.bp_rank, bv_bp), num_keys=1)
    else:
        bv = b.val[plan.bpos]
    if plan.av_gp is not None:
        from nsparse_tpu.ops.kernels.flat_gather import flat_gather

        prod = flat_gather(plan.av_gp, a.val, other=bv)
    else:
        prod = a.val[plan.apos] * bv

    flags = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            plan.out_pos[1:] != plan.out_pos[:-1],
        ]
    )
    ss = _segmented_inclusive_scan(prod, flags)
    if plan.cmp_masks is not None:
        c_val = _masked_compaction(ss, plan.cmp_masks)[: plan.c_capacity]
    elif plan.ends_gp is not None:
        from nsparse_tpu.ops.kernels.flat_gather import flat_gather

        c_val = flat_gather(plan.ends_gp, ss)[: plan.c_capacity]
    else:
        c_val = ss[plan.ends]
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


def spgemm_numeric_segsum(plan: SpgemmPlan, a: CSR, b: CSR) -> CSR:
    """Reference-style numeric phase (plain gathers + sorted segment_sum);
    kept as the semantics oracle and CPU fast path."""
    prod = a.val[plan.apos] * b.val[plan.bpos]
    c_val = jax.ops.segment_sum(
        prod,
        plan.out_pos,
        num_segments=plan.c_capacity + 1,
        indices_are_sorted=True,
    )[: plan.c_capacity]
    return CSR(
        rpt=plan.c_rpt,
        col=plan.c_col,
        val=c_val.astype(a.val.dtype),
        shape=plan.shape,
        nnz=plan.c_nnz,
    )


def spgemm(a: CSR, b: CSR, plan: SpgemmPlan | None = None,
           method: str = "esc", planner: str = "auto") -> CSR:
    """C = A @ B (the ``spgemm_kernel_hash`` / ``SpGEMM_Hash`` analog).

    ``method``: "esc" (general sort/scan path), "bsr" (dense-tile MXU path
    for block-clustered matrices), or "auto" (cost-model dispatch).

    ``planner`` (plan-less calls only): "device" runs the symbolic phase
    on the accelerator (``spgemm_plan_device``: two size syncs, one
    ``lax.sort``) so a ONE-SHOT product costs fractions of a second — the
    reference's model, where binning + symbolic + numeric run per call
    (``kernel_spgemm_hash_template.cu:1024-1064``); "host" builds the
    reusable routed plan (seconds of host time, the fastest re-run
    numeric — the ``SpGEMM_Hash_Numeric`` amortization model); "auto"
    picks "device" for one-shot ergonomics.  Callers who re-multiply the
    same structure should build ``spgemm_plan`` once and pass it.
    """
    if method == "auto":
        from nsparse_tpu.ops.spgemm_bsr import choose_spgemm_path

        method = choose_spgemm_path(a, b) if plan is None else "esc"
    if method == "bsr":
        if plan is not None:
            raise ValueError(
                "a precomputed ESC plan was supplied with method='bsr'; "
                "use method='esc' (or 'auto') to reuse it"
            )
        from nsparse_tpu.ops.spgemm_bsr import spgemm_bsr

        return spgemm_bsr(a, b)
    if plan is None:
        if planner not in ("auto", "device", "host"):
            raise ValueError(f"unknown planner {planner!r}")
        if planner in ("auto", "device"):
            plan = spgemm_plan_device(a, b)
        else:
            plan = spgemm_plan(a, b)
    return jax.jit(spgemm_numeric)(plan, a, b)


def spgemm_symbolic_nnz(a: CSR, b: CSR) -> int:
    """Output nnz only (the ``set_row_nnz`` + scan readback analog)."""
    return spgemm_plan(a, b).c_nnz
