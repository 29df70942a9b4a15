"""Planned run-copy: gather plan-known contiguous runs at memory speed.

The row-localized SpGEMM arenas leave every needed total in a CONTIGUOUS
8-aligned range per (window, level) of the reduction pyramid (see
``ops/spgemm_window.py``).  Extracting those ranges is a gather whose
index stream is piecewise slope-1 — but the jumps between runs span the
whole pyramid, so neither the banded/windowed roll-scan classes nor a
routed permutation (domain would be the full pyramid) apply.

Instead the destination of every run is PHASE-MATCHED at plan time
(``dst ≡ src  (mod 128)``, costing < 128 slack slots per run), which makes
each piece a pure dynamic *sublane* slice of a dynamically-selected
(16, 128) source block — no lane rolls (8 cyc/vreg on this VPU), just a
slice plus two selects per piece.  Source blocks arrive via scalar-
prefetched BlockSpec index maps, one per (subtile, piece) slot, so the
kernel streams straight from HBM without a VMEM-resident table (the
pyramid is tens of MB).

Slack and inter-run gap slots are explicitly zeroed (each piece carries an
``end``; ``[end_j, cut_{j+1})`` is set to zero), so downstream consumers
can treat every non-run slot as a structural zero.

Role analog: the reference's per-bin shared-memory table readout
(``kernel_spgemm_hash_template.cu:700-760``) — each block copies its
row's accumulated values out of scratch into the CSR value array.
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

from nsparse_tpu.ops.kernels.gather_pallas import _flat_align

LANES = 128
TILE_ROWS = 8
TILE = TILE_ROWS * LANES          # 1024-element subtiles
SRC_BIAS = 8 * TILE               # zero prefix (negative piece bases)
# classes: (K, J, SUB) — K = sub-runs summed per output element (the
# member-minor slab fold of the window arenas: out[p] = sum_t src[S +
# t*stride + p]); J = pieces per subtile; SUB = subtiles per grid step.
# K = 1 keeps the phase-matched fast path (pure sublane slices).
# (K, J, SUB, span_rows): span_rows > 0 = SPAN class — the whole grid
# step reads ONE pair of big consecutive (span_rows, 128) blocks and every
# piece slices it at a sublane offset (phase-matched K=1 only).  The
# per-piece block-pair classes (span_rows == 0) issue 2 small scattered
# DMAs per piece slot — measured ~17x read amplification at ~1.5 us/step —
# and remain only for steps whose source span exceeds the big buckets.
# Span buckets / LCM are chip-derived (tune/kernelgen.py, the reference
# generator's committed-table analog, spgemm_hash_kernel_gen.c:40-95);
# the (K, J, SUB) shape columns are VPU vreg-shape constants.
from nsparse_tpu.tune.kernelgen import kernel_config as _kernel_config
from nsparse_tpu.tune.kernelgen import plan_chip as _plan_chip

_CFG = _kernel_config(_plan_chip())
_SPAN_S, _SPAN_B = _CFG.runcopy_spans
CLASS_LIST = (
    (1, 8, 8, _SPAN_S),
    (1, 8, 8, _SPAN_B),
    (1, 2, 8, 0), (1, 8, 2, 0),
    (2, 4, 2, 0),
    (4, 4, 2, 0),
    (8, 4, 1, 0),
)
J_MAX = {1: 8, 2: 4, 4: 4, 8: 4}
K_FACTORS = (1, 2, 4, 8)
SPAN_LCM = _CFG.runcopy_span_lcm  # lcm of the span_rows buckets (and 16)

# fixed-destination mode classes (see ``build_runcopy_plan(dst=...)``):
#   ("mspan", S, R, J): S independent source STREAMS per supertile, each
#     staged as a pair of consecutive (R, 128) blocks into one scratch —
#     phase-matched pieces are sublane slices of the scratch.  Recovers
#     sequential DMA when the supertile's reads interleave a few
#     sequentially-advancing cursors (window-major arena extraction).
#   ("ualign", J, SUB): per-piece block-pair reads with full lane+sublane
#     alignment (``_flat_align``) — destinations are forced (e.g. exact
#     CSR positions), so dst/src phases don't match.
#   Subtiles denser than every budget fall back to an element gather
#   (plan.fb_ids / fb_idx), applied via ``scatter_tiles``.
CLASS_LIST_FIXED = _CFG.runcopy_fixed_classes


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _build_for_tpu() -> bool:
    """Plan-build target: TPU-style routing even when building off-TPU.

    Plans are serializable (``tune/spgemm_cache.py``) and often built in a
    host/CPU process for a TPU consumer; ``NSPARSE_PLAN_TARGET=tpu`` forces
    the mask/DMA class machinery instead of the interpret-mode gather
    shortcuts."""
    import os

    return os.environ.get("NSPARSE_PLAN_TARGET", "").lower() == "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-max(int(x), 0) // m) * m


def _pad_len(n_src: int) -> int:
    """Padded source length (elements) shared by builder and kernel: the
    row count is a multiple of every span bucket (so (span,128) BlockSpecs
    tile exactly) plus one full SPAN_LCM chunk of tail slack (so B+1 span
    blocks stay in bounds for any eligible supertile)."""
    base = _round_up(SRC_BIAS + n_src, TILE) + 3 * TILE
    return _round_up(base, SPAN_LCM * LANES) + SPAN_LCM * LANES


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RunCopyPlan:
    """Routing for the planned (optionally K-fold reducing) run gather.

    Per class in CLASS_LIST order:

    Attributes:
      ids: grid-step output tile indices (units of SUB subtiles).
      blk: (n_steps, SUB*J*K) int32 sub-run source-block ids (units of
        TILE elements; inert sub-runs point at block 0).
      off: (n_steps, SUB*J*K) int32 in-block element offsets (0..TILE);
        for K == 1 classes the second half of each (blk, off) pair is the
        sublane row (phase-matched path).
      cut / end: (n_steps, SUB*J) int32 piece bounds within the subtile,
        OUTPUT coordinates (TILE/TILE = inert; [end_j, cut_{j+1}) zeroed).
      n_src: source length the plan was built for (pre-BIAS).
      n_out: output length (multiple of TILE).
    """

    ids: Tuple
    blk: Tuple
    off: Tuple
    cut: Tuple
    end: Tuple
    fb_ids: object = None   # element-fallback subtile ids (fixed mode)
    fb_idx: object = None   # per-element source index (-1 = zero)
    n_src: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )
    n_out: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )
    # class descriptors aligned with ids/blk/...: auto mode uses
    # (K, J, SUB, span_rows) tuples, fixed mode ("mspan", S, R, J) /
    # ("ualign", J, SUB).  None = legacy auto CLASS_LIST.
    classes: object = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    # interpret-mode shortcut (CPU tests): per-output source index
    # (-1 = zero).  One gather instead of dozens of per-class pallas
    # compilations — the mask/DMA kernels are TPU-validated separately.
    flat_idx: object = None


def _empty_plan(n_src: int):
    return (
        RunCopyPlan(
            ids=tuple(jnp.zeros((0,), jnp.int32) for _ in CLASS_LIST),
            blk=tuple(
                jnp.zeros((0, 1 if R else K * J * S), jnp.int32)
                for K, J, S, R in CLASS_LIST
            ),
            off=tuple(
                jnp.zeros((0, J * S), jnp.int32)
                if R else jnp.zeros((0, K * J * S), jnp.int32)
                for K, J, S, R in CLASS_LIST
            ),
            cut=tuple(
                jnp.zeros((0, J * S), jnp.int32)
                for K, J, S, R in CLASS_LIST
            ),
            end=tuple(
                jnp.zeros((0, J * S), jnp.int32)
                for K, J, S, R in CLASS_LIST
            ),
            n_src=n_src, n_out=0,
        ),
        np.zeros(0, np.int64),
    )


def build_runcopy_plan(
    src_off: np.ndarray,
    lens: np.ndarray,
    n_src: int,
    kfac: np.ndarray | None = None,
    stride: np.ndarray | None = None,
    dst: np.ndarray | None = None,
    n_out: int | None = None,
) -> Tuple[RunCopyPlan, np.ndarray]:
    """Assign destinations to runs and route the pieces.

    ``src_off``: per-run source starts; ``lens``: per-run OUTPUT lengths;
    ``kfac``: per-run fold factor in {1, 2, 4, 8} (default 1); ``stride``:
    per-run sub-run stride (run r emits ``out[p] = sum_{t<K} src[S +
    t*stride + p]``).  Runs must be grouped by kfac (group transitions
    start a fresh supertile).  Returns (plan, dst_off); destinations are
    builder-chosen ascending, phase-matched for K == 1.

    ``dst``: FIXED per-run destinations (ascending, non-overlapping;
    kfac/stride unsupported).  The fixed-mode classes (CLASS_LIST_FIXED)
    handle arbitrary src/dst phase via lane-aligned reads, and recover
    sequential DMA through multi-stream span staging when the piece
    sources cluster into a few advancing cursors.
    """
    if dst is not None:
        assert kfac is None and stride is None
        return _build_fixed(src_off, lens, n_src, dst, n_out)
    src_off = np.asarray(src_off, dtype=np.int64).reshape(-1)
    lens = np.asarray(lens, dtype=np.int64).reshape(-1)
    n_runs = src_off.size
    kfac = (
        np.ones(n_runs, dtype=np.int64) if kfac is None
        else np.asarray(kfac, dtype=np.int64).reshape(-1)
    )
    stride = (
        np.zeros(n_runs, dtype=np.int64) if stride is None
        else np.asarray(stride, dtype=np.int64).reshape(-1)
    )
    if n_runs == 0:
        return _empty_plan(n_src)

    # --- destination assignment ---------------------------------------
    dst = np.empty(n_runs, dtype=np.int64)
    cursor = 0
    tile_cnt = 0
    tile_id = 0
    prev_k = int(kfac[0])
    for r in range(n_runs):
        K = int(kfac[r])
        if K != prev_k:  # fresh supertile: uniform K per grid step
            cursor = _round_up(cursor, 8 * TILE)
            tile_id = cursor // TILE
            tile_cnt = 0
            prev_k = K
        d = (
            cursor + (src_off[r] - cursor) % LANES if K == 1 else cursor
        )
        t = d // TILE
        cnt = tile_cnt if t == tile_id else 0
        if cnt >= J_MAX[K]:  # subtile full: skip to the next
            d = (t + 1) * TILE + (src_off[r] % LANES if K == 1 else 0)
            t = d // TILE
            cnt = 0
        dst[r] = d
        cursor = d + lens[r]
        tile_id = cursor // TILE
        tile_cnt = (cnt + 1) if tile_id == t else 1
    n_out = _round_up(cursor, TILE)

    # --- piece table ----------------------------------------------------
    n_sub = n_out // TILE
    sub_base = np.arange(n_sub, dtype=np.int64) * TILE
    first = np.searchsorted(dst, sub_base, side="right") - 1
    ends_abs = dst + lens
    has_cont = (first >= 0) & (ends_abs[np.maximum(first, 0)] > sub_base)
    first = np.where(has_cont, first, first + 1)
    nxt = np.searchsorted(dst, sub_base + TILE, side="left")
    count = nxt - first
    jmax_by_sub = count
    k_by_sub = np.ones(n_sub, dtype=np.int64)
    live = count > 0
    k_by_sub[live] = kfac[np.minimum(first[live], n_runs - 1)]

    def pieces_for(subs: np.ndarray, K: int, J: int):
        k = np.arange(J, dtype=np.int64)
        r = first[subs][:, None] + k[None, :]
        valid = (k[None, :] < count[subs][:, None]) & (r < n_runs)
        rc = np.minimum(np.maximum(r, 0), n_runs - 1)
        base = sub_base[subs][:, None]
        cut = np.where(valid, np.maximum(dst[rc] - base, 0), TILE)
        end = np.where(valid, np.minimum(ends_abs[rc] - base, TILE), TILE)
        if K == 1:
            # phase-matched: aligned base, (block, sublane-row) pair
            aligned = SRC_BIAS + src_off[rc] + base - dst[rc]
            blk = np.where(valid, aligned // TILE, 0)
            off = np.where(valid, (aligned % TILE) // LANES, 0)
            blk = blk[:, :, None]
            off = off[:, :, None]
        else:
            t = np.arange(K, dtype=np.int64)[None, None, :]
            a = (
                SRC_BIAS + src_off[rc][:, :, None] + t * stride[rc][:, :, None]
                + (base - dst[rc])[:, :, None]
            )
            blk = np.where(valid[:, :, None], a // TILE, 0)
            off = np.where(valid[:, :, None], a % TILE, 0)
        return (
            cut.astype(np.int32), end.astype(np.int32),
            blk.astype(np.int32), off.astype(np.int32),
        )

    ids_l, blk_l, off_l, cut_l, end_l = [], [], [], [], []
    n_super = (n_sub + 7) // 8
    padded_sub = _round_up(n_sub, 8)
    cnt_pad = np.zeros(padded_sub, dtype=np.int64)
    cnt_pad[:n_sub] = jmax_by_sub
    jmax_super = cnt_pad.reshape(-1, 8).max(axis=1)
    k_pad = np.ones(padded_sub, dtype=np.int64)
    k_pad[:n_sub] = k_by_sub
    k_super = k_pad.reshape(-1, 8).max(axis=1)

    # per-supertile source-row span (K = 1 phase-matched pieces only):
    # a span class of R rows fits iff all piece reads land inside the
    # block pair [B*R, (B+2)*R) anchored at B = min_row // R
    pad_rows = _pad_len(n_src) // LANES
    INT_MAX = np.iinfo(np.int64).max
    k8 = np.arange(8, dtype=np.int64)
    r8 = first[:, None] + k8[None, :]
    v8 = (k8[None, :] < count[:, None]) & (r8 < n_runs) & (r8 >= 0)
    rc8 = np.clip(r8, 0, n_runs - 1)
    row8 = (SRC_BIAS + src_off[rc8] + sub_base[:, None] - dst[rc8]) // LANES
    row_lo = np.where(v8, row8, INT_MAX).min(axis=1)
    row_hi = np.where(v8, row8, -1).max(axis=1)
    lo_pad = np.full(padded_sub, INT_MAX, np.int64)
    lo_pad[:n_sub] = row_lo
    hi_pad = np.full(padded_sub, -1, np.int64)
    hi_pad[:n_sub] = row_hi
    lo_super = lo_pad.reshape(-1, 8).min(axis=1)
    hi_super = hi_pad.reshape(-1, 8).max(axis=1)

    assigned = np.zeros(n_super, dtype=bool)
    for ci, (K, J, SUBC, R) in enumerate(CLASS_LIST):
        if R:
            fin = lo_super < INT_MAX
            anchor = np.where(fin, lo_super // R, 0)
            fit = (
                fin
                & (hi_super + TILE_ROWS <= (anchor + 2) * R)
                & ((anchor + 2) * R <= pad_rows)
            )
            ok = (~assigned) & (k_super == 1) & (jmax_super <= J) & fit
            if ci == 0:
                ok |= (~assigned) & (jmax_super == 0)  # empty supertiles
        else:
            ok = (~assigned) & (jmax_super <= J) & (k_super == K)
            anchor = None
        assigned |= ok
        sids = np.nonzero(ok)[0].astype(np.int64)
        per = 8 // SUBC
        steps = (
            sids[:, None] * per + np.arange(per)[None, :]
        ).reshape(-1)
        # fully-dead steps must not run: their zero writes would land on
        # an out-of-range output block (a runtime crash on TPU)
        steps = steps[steps * SUBC < n_sub]
        subs = (
            steps[:, None] * SUBC + np.arange(SUBC)[None, :]
        ).reshape(-1)
        live_s = subs < n_sub
        subs = np.minimum(subs, padded_sub - 1)
        cut, end, blk, off = pieces_for(
            np.minimum(subs, n_sub - 1), 1 if R else K, J
        )
        cut[~live_s] = TILE
        end[~live_s] = TILE
        blk[~live_s] = 0
        off[~live_s] = 0
        n_steps = steps.size
        ids_l.append(jnp.asarray(steps.astype(np.int32)))
        if R:
            # span class: per-step anchor block B, per-piece sublane row
            # rel within the (2R, 128) pair window
            bv = (
                anchor[steps // per] if steps.size
                else np.zeros(0, np.int64)
            )
            abs_row = blk[:, :, 0] * TILE_ROWS + off[:, :, 0]
            rel = np.where(
                cut < TILE, abs_row - np.repeat(bv, SUBC)[:, None] * R, 0
            )
            blk_l.append(jnp.asarray(
                bv.reshape(n_steps, 1).astype(np.int32)
            ))
            off_l.append(jnp.asarray(
                rel.reshape(n_steps, SUBC * J).astype(np.int32)
            ))
        else:
            blk_l.append(jnp.asarray(
                blk.reshape(n_steps, SUBC * J * (K if K > 1 else 1))
                if K > 1 else blk.reshape(n_steps, SUBC * J)
            ))
            off_l.append(jnp.asarray(
                off.reshape(n_steps, SUBC * J * (K if K > 1 else 1))
                if K > 1 else off.reshape(n_steps, SUBC * J)
            ))
        cut_l.append(jnp.asarray(cut.reshape(n_steps, SUBC * J)))
        end_l.append(jnp.asarray(end.reshape(n_steps, SUBC * J)))

    if not np.all(assigned[: (n_sub + 7) // 8]):
        raise AssertionError("unassigned supertile (mixed K?)")

    plan = RunCopyPlan(
        ids=tuple(ids_l), blk=tuple(blk_l), off=tuple(off_l),
        cut=tuple(cut_l), end=tuple(end_l), n_src=n_src, n_out=int(n_out),
    )
    return plan, dst


def _build_fixed(src_off, lens, n_src, dst, n_out):
    """Fixed-destination routing (CLASS_LIST_FIXED; see the class notes)."""
    src_off = np.asarray(src_off, dtype=np.int64).reshape(-1)
    lens = np.asarray(lens, dtype=np.int64).reshape(-1)
    dst = np.asarray(dst, dtype=np.int64).reshape(-1)
    n_runs = src_off.size
    if n_out is None:
        n_out = int((dst + lens).max()) if n_runs else 0
    n_out = _round_up(n_out, TILE)
    if not (n_runs and n_out):
        return (
            RunCopyPlan(
                ids=(), blk=(), off=(), cut=(), end=(),
                fb_ids=jnp.zeros((0,), jnp.int32),
                fb_idx=jnp.zeros((0,), jnp.int32),
                n_src=n_src, n_out=n_out, classes=(),
            ),
            dst,
        )
    assert (np.diff(dst) >= lens[:-1]).all(), "fixed dst must be ascending"

    if _interpret() and not _build_for_tpu():
        # CPU tests: one gather replaces the whole class machinery (and
        # its dozens of per-class pallas interpret compilations)
        fi = np.full(n_out, -1, np.int64)
        pr = np.repeat(np.arange(n_runs, dtype=np.int64), lens)
        cum = np.concatenate([[0], np.cumsum(lens)[:-1]])
        kin = np.arange(pr.size, dtype=np.int64) - cum[pr]
        fi[dst[pr] + kin] = src_off[pr] + kin
        return (
            RunCopyPlan(
                ids=(), blk=(), off=(), cut=(), end=(),
                fb_ids=jnp.zeros((0,), jnp.int32),
                fb_idx=jnp.zeros((0,), jnp.int32),
                n_src=n_src, n_out=n_out, classes=(),
                flat_idx=jnp.asarray(fi.astype(np.int32)),
            ),
            dst,
        )

    n_sub = n_out // TILE
    sub_base = np.arange(n_sub, dtype=np.int64) * TILE
    first = np.searchsorted(dst, sub_base, side="right") - 1
    ends_abs = dst + lens
    has_cont = (first >= 0) & (ends_abs[np.maximum(first, 0)] > sub_base)
    first = np.where(has_cont, first, first + 1)
    nxt = np.searchsorted(dst, sub_base + TILE, side="left")
    count = nxt - first

    # per-(subtile, piece) source element and phase
    KMAX = max(j for kind, *p in CLASS_LIST_FIXED for j in [
        p[2] if kind == "mspan" else p[0]
    ])
    kk = np.arange(KMAX, dtype=np.int64)
    r_sk = first[:, None] + kk[None, :]
    v_sk = (kk[None, :] < count[:, None]) & (r_sk < n_runs) & (r_sk >= 0)
    rc_sk = np.clip(r_sk, 0, n_runs - 1)
    a_sk = SRC_BIAS + src_off[rc_sk] + sub_base[:, None] - dst[rc_sk]
    phase_ok_sub = np.where(v_sk, a_sk % LANES == 0, True).all(axis=1)

    padded_sub = _round_up(n_sub, 8)
    n_super = padded_sub // 8

    def sup(arr, fill, red):
        p = np.full(padded_sub, fill, arr.dtype)
        p[:n_sub] = arr
        return red(p.reshape(-1, 8), axis=1)

    jmax_super = sup(count, 0, np.max)
    phase_super = sup(phase_ok_sub, True, np.all)
    live_super = jmax_super > 0

    ids_l, blk_l, off_l, cut_l, end_l, cls_l = [], [], [], [], [], []
    assigned = ~live_super
    interp = _interpret() and not _build_for_tpu()
    INT_MAX = np.iinfo(np.int64).max
    pad_rows = _pad_len(n_src) // LANES

    def pieces_for(subs, J):
        k = np.arange(J, dtype=np.int64)
        r = first[subs][:, None] + k[None, :]
        valid = (k[None, :] < count[subs][:, None]) & (r < n_runs) & (
            r >= 0
        )
        rc = np.clip(r, 0, n_runs - 1)
        base = sub_base[subs][:, None]
        cut = np.where(valid, np.maximum(dst[rc] - base, 0), TILE)
        end = np.where(valid, np.minimum(ends_abs[rc] - base, TILE), TILE)
        a = np.where(valid, SRC_BIAS + src_off[rc] + base - dst[rc], 0)
        return cut, end, a, valid

    for ci, (kind, *params) in enumerate(CLASS_LIST_FIXED):
        if kind == "mspan":
            if interp:
                continue  # off-TPU the ualign classes cover everything
            S, R, J = params
            cand = np.flatnonzero(
                (~assigned) & phase_super & (jmax_super <= J)
            )
            if not cand.size:
                continue
            # candidate supertiles: cluster piece source rows into <= S
            # intervals, each fitting a pair of consecutive (R, 128)
            # blocks ([anchor*R, (anchor+2)*R) with 8 rows of headroom)
            sub8 = (
                cand[:, None] * 8 + np.arange(8)[None, :]
            ).reshape(-1)
            live8 = sub8 < n_sub
            sub8c = np.minimum(sub8, n_sub - 1)
            cutc, endc, a_c, val_c = pieces_for(sub8c, J)
            val_c &= live8[:, None]
            rows_c = np.where(val_c, a_c // LANES, INT_MAX).reshape(
                cand.size, 8 * J
            )
            if S == 1:
                # vectorized single-stream test: every piece row within
                # one anchored (2R, 128) block pair (8 rows of headroom)
                rmin = np.where(
                    rows_c == INT_MAX, INT_MAX, rows_c
                ).min(axis=1)
                rmax = np.where(rows_c == INT_MAX, -1, rows_c).max(axis=1)
                okq = (rmin != INT_MAX) & (
                    rmax + 8 <= (rmin // R + 2) * R
                )
                ok_idx = np.flatnonzero(okq)
                if not ok_idx.size:
                    continue
                sel_sup = cand[ok_idx]
                assigned[sel_sup] = True
                anc_all = (rmin[ok_idx] // R)[:, None]
                rows_m = rows_c[ok_idx]
                srow = np.where(
                    rows_m < INT_MAX, rows_m - anc_all * R, 0
                )
                m = ok_idx.size
                ids_l.append(jnp.asarray(sel_sup.astype(np.int32)))
                blk_l.append(jnp.asarray(anc_all.astype(np.int32)))
                off_l.append(jnp.asarray(
                    srow.reshape(m, 8 * J).astype(np.int32)
                ))
                cut_l.append(jnp.asarray(
                    cutc.reshape(cand.size, 8 * J)[ok_idx].astype(np.int32)
                ))
                end_l.append(jnp.asarray(
                    endc.reshape(cand.size, 8 * J)[ok_idx].astype(np.int32)
                ))
                cls_l.append((kind, S, R, J))
                continue
            ok_idx, anchors_l, srow_l = [], [], []
            for qi in range(cand.size):
                rw = np.sort(rows_c[qi][rows_c[qi] < INT_MAX])
                anchors = []
                okq = True
                s0 = 0
                for x in rw:
                    if anchors and x + 8 <= (anchors[-1] + 2) * R:
                        continue
                    if len(anchors) == S:
                        okq = False
                        break
                    anchors.append(int(x // R))
                if not okq:
                    continue
                anchors += [0] * (S - len(anchors))
                anc = np.asarray(anchors, np.int64)
                ok_idx.append(qi)
                anchors_l.append(anc)
                del s0
            if not ok_idx:
                continue
            ok_idx = np.asarray(ok_idx, np.int64)
            sel_sup = cand[ok_idx]
            assigned[sel_sup] = True
            anc_all = np.stack(anchors_l)  # (m, S)
            rows_m = rows_c[ok_idx]        # (m, 8*J)
            # stream of each piece: the unique anchor whose pair window
            # contains it (anchors ascend; pick the last with
            # anchor*R <= row)
            anc_sorted = anc_all  # ascending by construction
            st = (
                (rows_m[:, :, None] >= anc_sorted[:, None, :] * R)
                & (rows_m[:, :, None] + 8 <= (anc_sorted[:, None, :] + 2) * R)
            )
            stream = st.argmax(axis=2)
            srow = np.where(
                rows_m < INT_MAX,
                stream * (2 * R) + rows_m - anc_sorted[
                    np.arange(ok_idx.size)[:, None], stream
                ] * R,
                0,
            )
            m = ok_idx.size
            ids_l.append(jnp.asarray(sel_sup.astype(np.int32)))
            blk_l.append(jnp.asarray(anc_all.astype(np.int32)))
            off_l.append(jnp.asarray(
                srow.reshape(m, 8 * J).astype(np.int32)
            ))
            cut_l.append(jnp.asarray(
                cutc.reshape(cand.size, 8 * J)[ok_idx].astype(np.int32)
            ))
            end_l.append(jnp.asarray(
                endc.reshape(cand.size, 8 * J)[ok_idx].astype(np.int32)
            ))
            cls_l.append((kind, S, R, J))
        else:  # ualign
            J, SUBC = params
            ok = (~assigned) & (jmax_super <= J)
            assigned |= ok
            sids = np.flatnonzero(ok)
            if not sids.size:
                continue
            per = 8 // SUBC
            steps = (
                sids[:, None] * per + np.arange(per)[None, :]
            ).reshape(-1)
            steps = steps[steps * SUBC < n_sub]
            subs = (
                steps[:, None] * SUBC + np.arange(SUBC)[None, :]
            ).reshape(-1)
            live_s = subs < n_sub
            subsc = np.minimum(subs, n_sub - 1)
            cut, end, a, valid = pieces_for(subsc, J)
            valid &= live_s[:, None]
            cut[~live_s] = TILE
            end[~live_s] = TILE
            blk = np.where(valid, a // TILE, 0)
            off = np.where(valid, a % TILE, 0)
            n_steps = steps.size
            ids_l.append(jnp.asarray(steps.astype(np.int32)))
            blk_l.append(jnp.asarray(
                blk.reshape(n_steps, SUBC * J).astype(np.int32)
            ))
            off_l.append(jnp.asarray(
                off.reshape(n_steps, SUBC * J).astype(np.int32)
            ))
            cut_l.append(jnp.asarray(
                cut.reshape(n_steps, SUBC * J).astype(np.int32)
            ))
            end_l.append(jnp.asarray(
                end.reshape(n_steps, SUBC * J).astype(np.int32)
            ))
            cls_l.append((kind, J, SUBC))

    # element fallback: subtiles of unassigned live supertiles
    fb_super = np.flatnonzero(~assigned & live_super)
    if fb_super.size:
        fsub = (
            fb_super[:, None] * 8 + np.arange(8)[None, :]
        ).reshape(-1)
        fsub = fsub[fsub < n_sub]
        fsub = fsub[count[fsub] > 0]
        pos = (fsub[:, None] * TILE + np.arange(TILE)[None, :]).reshape(-1)
        r = np.searchsorted(dst, pos, side="right") - 1
        rc = np.clip(r, 0, n_runs - 1)
        inside = (r >= 0) & (pos < ends_abs[rc])
        fb_idx = np.where(
            inside, src_off[rc] + pos - dst[rc], -1
        ).astype(np.int32)
        fb_ids = fsub.astype(np.int32)
    else:
        fb_ids = np.zeros(0, np.int32)
        fb_idx = np.zeros(0, np.int32)

    plan = RunCopyPlan(
        ids=tuple(ids_l), blk=tuple(blk_l), off=tuple(off_l),
        cut=tuple(cut_l), end=tuple(end_l),
        fb_ids=jnp.asarray(fb_ids), fb_idx=jnp.asarray(fb_idx),
        n_src=n_src, n_out=int(n_out), classes=tuple(cls_l),
    )
    return plan, dst


def _make_rc_kern(K: int, j_budget: int, sub: int):
    """Kernel: K == 1 — phase-matched sublane slices from (8,128) block
    pairs; K > 1 — per sub-run flat-aligned (8,128) reads summed;
    K == 0 — single flat-aligned pair per piece (fixed-dst "ualign":
    arbitrary src/dst phase, desc carries the full in-pair offset)."""
    n_j = sub * j_budget
    n_b = n_j * max(K, 1)  # sub-run slots (each a block PAIR)

    def kern(bp_ref, desc_ref, *refs):
        del bp_ref
        blocks = refs[:-2]  # 2 * n_b paired (8, 128) source blocks
        out_ref = refs[-1]
        r_id = pl.program_id(0) % 8
        pos = (
            jax.lax.broadcasted_iota(
                jnp.int32, (TILE_ROWS, LANES), 0
            ) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 1)
        )
        for k in range(sub):
            acc = jnp.zeros((TILE_ROWS, LANES), out_ref.dtype)
            for j in range(j_budget):
                jj = k * j_budget + j
                if K == 1:
                    cat = jnp.concatenate(
                        [blocks[2 * jj][:], blocks[2 * jj + 1][:]], axis=0
                    )
                    srow = desc_ref[r_id, jj]
                    seg = pltpu.roll(
                        cat, (2 * TILE_ROWS - srow) % (2 * TILE_ROWS), 0
                    )[:TILE_ROWS]
                elif K == 0:
                    cat = jnp.concatenate(
                        [blocks[2 * jj][:], blocks[2 * jj + 1][:]], axis=0
                    )
                    seg = _flat_align(
                        cat, desc_ref[r_id, jj]
                    )[:TILE_ROWS]
                else:
                    seg = jnp.zeros((TILE_ROWS, LANES), out_ref.dtype)
                    for t in range(K):
                        bi = jj * K + t
                        cat = jnp.concatenate(
                            [blocks[2 * bi][:], blocks[2 * bi + 1][:]],
                            axis=0,
                        )
                        seg = seg + _flat_align(
                            cat, desc_ref[r_id, bi]
                        )[:TILE_ROWS]
                acc = jnp.where(
                    pos >= desc_ref[r_id, n_b + jj], seg, acc
                )
                acc = jnp.where(
                    pos >= desc_ref[r_id, n_b + n_j + jj], 0.0, acc
                )
            out_ref[pl.ds(k * TILE_ROWS, TILE_ROWS), :] = acc

    return kern


def _make_span_kern(R: int, j_budget: int, sub: int):
    """Span kernel: the grid step's two consecutive (R, 128) source
    blocks are staged into one (2R, 128) VMEM scratch; each piece is a
    dynamic sublane slice of the scratch (phase-matching keeps lane
    offsets zero), so the whole step costs ONE sequential DMA pair
    instead of 2 scattered 4 KB DMAs per piece."""
    n_j = sub * j_budget

    def kern(bp_ref, desc_ref, b0_ref, b1_ref, out_ref, scr_ref):
        del bp_ref
        r_id = pl.program_id(0) % 8
        scr_ref[0:R, :] = b0_ref[:]
        scr_ref[R : 2 * R, :] = b1_ref[:]
        pos = (
            jax.lax.broadcasted_iota(
                jnp.int32, (TILE_ROWS, LANES), 0
            ) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 1)
        )
        for k in range(sub):
            acc = jnp.zeros((TILE_ROWS, LANES), out_ref.dtype)
            for j in range(j_budget):
                jj = k * j_budget + j
                seg = scr_ref[pl.ds(desc_ref[r_id, jj], TILE_ROWS), :]
                acc = jnp.where(
                    pos >= desc_ref[r_id, n_j + jj], seg, acc
                )
                acc = jnp.where(
                    pos >= desc_ref[r_id, 2 * n_j + jj], 0.0, acc
                )
            out_ref[pl.ds(k * TILE_ROWS, TILE_ROWS), :] = acc

    return kern


def _rc_span_call(R, J, SUBC, ids, blk, off, cut, end, src2, out, alias):
    sub = 1 if _interpret() else SUBC
    if sub == 1 and SUBC > 1:
        ids = (
            ids[:, None] * SUBC + jnp.arange(SUBC, dtype=ids.dtype)[None, :]
        ).reshape(-1)
        blk = jnp.repeat(blk, SUBC, axis=0)
        off = off.reshape(-1, J)
        cut = cut.reshape(-1, J)
        end = end.reshape(-1, J)
    block_rows = sub * TILE_ROWS
    n_j = sub * J
    n_steps = int(ids.shape[0])
    blkp = jnp.concatenate(
        [ids.reshape(-1, 1), blk.reshape(-1, 1)], axis=1
    ).reshape(-1)
    stride = 2
    desc = jnp.concatenate(
        [
            off.reshape(n_steps, n_j),
            cut.reshape(n_steps, n_j),
            end.reshape(n_steps, n_j),
        ],
        axis=1,
    )
    dcols = 3 * n_j
    pad_steps = _round_up(n_steps, 8) - n_steps
    if pad_steps:
        # padded desc rows are loaded into SMEM but never indexed (r_id
        # only reaches real program ids); values are immaterial
        desc = jnp.concatenate(
            [desc, jnp.zeros((pad_steps, dcols), desc.dtype)]
        )

    in_specs = [
        pl.BlockSpec((8, dcols), lambda i, bp: (i // 8, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((R, LANES), lambda i, bp: (bp[i * stride + 1], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, LANES), lambda i, bp: (bp[i * stride + 1] + 1, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [blkp, desc, src2, src2]
    aliases = {}
    kern = _make_span_kern(R, J, sub)
    if alias:
        in_specs.append(pl.BlockSpec(
            (block_rows, LANES), lambda i, bp: (bp[i * stride], 0),
            memory_space=pltpu.VMEM,
        ))
        operands.append(out)
        aliases = {len(operands) - 1: 0}

        def body(bp_ref, desc_ref, b0, b1, al, out_ref, scr):
            del al
            return kern(bp_ref, desc_ref, b0, b1, out_ref, scr)
    else:
        body = kern
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_rows, LANES), lambda i, bp: (bp[i * stride], 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((2 * R, LANES), src2.dtype)],
    )
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out.shape, out.dtype),
        input_output_aliases=aliases,
        interpret=_interpret(),
    )(*operands)


def _make_mspan_kern(S: int, R: int, J: int):
    """Multi-stream span kernel: S pairs of consecutive (R, 128) source
    blocks staged stream-major into one (S*2R, 128) scratch; every piece
    is a phase-matched sublane slice at its plan-computed scratch row
    (stream * 2R + row - anchor*R).  One grid step covers a full
    8-subtile supertile with S sequential DMA pairs."""
    n_j = 8 * J

    def kern(bp_ref, desc_ref, *refs):
        del bp_ref
        blocks = refs[: 2 * S]
        out_ref = refs[-2]
        scr_ref = refs[-1]
        r_id = pl.program_id(0) % 8
        for s in range(S):
            scr_ref[pl.ds(s * 2 * R, R), :] = blocks[2 * s][:]
            scr_ref[pl.ds(s * 2 * R + R, R), :] = blocks[2 * s + 1][:]
        pos = (
            jax.lax.broadcasted_iota(
                jnp.int32, (TILE_ROWS, LANES), 0
            ) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 1)
        )
        for k in range(8):
            acc = jnp.zeros((TILE_ROWS, LANES), out_ref.dtype)
            for j in range(J):
                jj = k * J + j
                seg = scr_ref[pl.ds(desc_ref[r_id, jj], TILE_ROWS), :]
                acc = jnp.where(
                    pos >= desc_ref[r_id, n_j + jj], seg, acc
                )
                acc = jnp.where(
                    pos >= desc_ref[r_id, 2 * n_j + jj], 0.0, acc
                )
            out_ref[pl.ds(k * TILE_ROWS, TILE_ROWS), :] = acc

    return kern


def _rc_mspan_call(S, R, J, ids, blk, off, cut, end, src2, out):
    n_steps = int(ids.shape[0])
    block_rows = 8 * TILE_ROWS
    n_j = 8 * J
    blkp = jnp.concatenate(
        [ids.reshape(-1, 1), blk.reshape(n_steps, S)], axis=1
    ).reshape(-1)
    stride = 1 + S
    desc = jnp.concatenate(
        [
            off.reshape(n_steps, n_j),
            cut.reshape(n_steps, n_j),
            end.reshape(n_steps, n_j),
        ],
        axis=1,
    )
    dcols = 3 * n_j
    pad_steps = _round_up(n_steps, 8) - n_steps
    if pad_steps:
        desc = jnp.concatenate(
            [desc, jnp.zeros((pad_steps, dcols), desc.dtype)]
        )

    in_specs = [
        pl.BlockSpec((8, dcols), lambda i, bp: (i // 8, 0),
                     memory_space=pltpu.SMEM),
    ]
    for s in range(S):
        for second in (0, 1):
            in_specs.append(pl.BlockSpec(
                (R, LANES),
                lambda i, bp, s=s, sec=second: (
                    bp[i * stride + 1 + s] + sec, 0
                ),
                memory_space=pltpu.VMEM,
            ))
    in_specs.append(pl.BlockSpec(
        (block_rows, LANES), lambda i, bp: (bp[i * stride], 0),
        memory_space=pltpu.VMEM,
    ))
    operands = [blkp, desc] + [src2] * (2 * S) + [out]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_rows, LANES), lambda i, bp: (bp[i * stride], 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((S * 2 * R, LANES), src2.dtype)],
    )
    return pl.pallas_call(
        _make_mspan_kern(S, R, J),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out.shape, out.dtype),
        input_output_aliases={len(operands) - 1: 0},
        interpret=_interpret(),
    )(*operands)


def _rc_class_call(K, J, SUBC, ids, blk, off, cut, end, src2, out, alias):
    sub = 1 if _interpret() else SUBC
    kw = K if K > 1 else 1
    if sub == 1 and SUBC > 1:
        ids = (
            ids[:, None] * SUBC + jnp.arange(SUBC, dtype=ids.dtype)[None, :]
        ).reshape(-1)
        blk = blk.reshape(-1, J * kw)
        off = off.reshape(-1, J * kw)
        cut = cut.reshape(-1, J)
        end = end.reshape(-1, J)
    block_rows = sub * TILE_ROWS
    n_j = sub * J
    n_b = n_j * kw
    n_steps = int(ids.shape[0])
    blkp = jnp.concatenate(
        [ids.reshape(-1, 1), blk.reshape(n_steps, n_b)], axis=1
    ).reshape(-1)
    stride = 1 + n_b
    desc = jnp.concatenate(
        [
            off.reshape(n_steps, n_b),
            cut.reshape(n_steps, n_j),
            end.reshape(n_steps, n_j),
        ],
        axis=1,
    )
    dcols = n_b + 2 * n_j
    pad_steps = _round_up(n_steps, 8) - n_steps
    if pad_steps:
        desc = jnp.concatenate(
            [desc, jnp.full((pad_steps, dcols), TILE, desc.dtype)]
        )

    def mk_src_spec(bi, second):
        return pl.BlockSpec(
            (TILE_ROWS, LANES),
            lambda i, bp, bi=bi, s=int(second): (
                bp[i * stride + 1 + bi] + s, 0
            ),
            memory_space=pltpu.VMEM,
        )

    in_specs = [pl.BlockSpec((8, dcols), lambda i, bp: (i // 8, 0),
                             memory_space=pltpu.SMEM)]
    operands = [blkp, desc]
    in_specs += [mk_src_spec(bi // 2, bi % 2) for bi in range(2 * n_b)]
    operands += [src2] * (2 * n_b)
    aliases = {}
    if alias:
        in_specs = in_specs + [pl.BlockSpec(
            (block_rows, LANES), lambda i, bp: (bp[i * stride], 0),
            memory_space=pltpu.VMEM,
        )]
        operands.append(out)
        aliases = {len(operands) - 1: 0}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_rows, LANES), lambda i, bp: (bp[i * stride], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kern = _make_rc_kern(K, J, sub)
    return pl.pallas_call(
        kern if alias else _wrap_no_alias(kern),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out.shape, out.dtype),
        input_output_aliases=aliases,
        interpret=_interpret(),
    )(*operands)


def _wrap_no_alias(kern):
    def k2(bp_ref, desc_ref, *refs):
        # kern expects (..., aliased_in, out); inject a placeholder
        return kern(bp_ref, desc_ref, *refs[:-1], None, refs[-1])

    return k2


def runcopy(plan: RunCopyPlan, src: jax.Array) -> jax.Array:
    """Device: materialize the (n_out,) destination array.

    ``src`` is the flat source (length >= plan.n_src); BIAS/tail zero
    padding is added here.
    """
    if plan.n_out == 0:
        return jnp.zeros((0,), src.dtype)
    if plan.flat_idx is not None:
        idx = plan.flat_idx
        safe = jnp.clip(idx, 0, max(plan.n_src - 1, 0))
        return jnp.where(idx >= 0, src[: plan.n_src][safe], 0).astype(
            src.dtype
        )
    if src.dtype == jnp.float64:
        # fixed-destination classes (mspan/ualign) are pure movement, so
        # f64 rides as two uint32 planes; variable-mode K>1 classes SUM
        # sub-runs (arithmetic) and cannot
        if plan.classes is None:
            raise NotImplementedError(
                "f64 runcopy requires a fixed-destination plan "
                "(variable-mode classes reduce, not move)"
            )
        from nsparse_tpu.ops.kernels import planes

        return planes.moved(lambda p: runcopy(plan, p), src)
    pad_len = _pad_len(plan.n_src)
    src_p = jnp.zeros(pad_len, src.dtype)
    src_p = jax.lax.dynamic_update_slice(
        src_p, src[: plan.n_src], (SRC_BIAS,)
    )
    src2 = src_p.reshape(-1, LANES)
    n_alloc = _round_up(plan.n_out, 8 * TILE)
    out = jnp.zeros((n_alloc // LANES, LANES), src.dtype)
    if plan.classes is not None:
        # fixed-destination mode: every class aliases the zero-filled
        # output (uncovered supertiles are real zeros of the layout)
        for cls, ids, blk, off, cut, end in zip(
            plan.classes, plan.ids, plan.blk, plan.off, plan.cut,
            plan.end,
        ):
            if not int(ids.shape[0]):
                continue
            if cls[0] == "mspan":
                _, S, R, J = cls
                out = _rc_mspan_call(
                    S, R, J, ids, blk, off, cut, end, src2, out
                )
            else:
                _, J, SUBC = cls
                out = _rc_class_call(
                    0, J, SUBC, ids, blk, off, cut, end, src2, out,
                    alias=True,
                )
        if plan.fb_ids is not None and int(plan.fb_ids.shape[0]):
            from nsparse_tpu.ops.kernels.gather_pallas import scatter_tiles

            idx = plan.fb_idx
            vals = jnp.where(
                idx >= 0, src[jnp.clip(idx, 0, max(plan.n_src - 1, 0))], 0
            ).astype(src.dtype).reshape(-1, LANES)
            out = scatter_tiles(out, plan.fb_ids, vals,
                                tile_rows=TILE_ROWS)
        return out.reshape(-1)[: plan.n_out]
    first = True
    for (K, J, SUBC, R), ids, blk, off, cut, end in zip(
        CLASS_LIST, plan.ids, plan.blk, plan.off, plan.cut, plan.end
    ):
        if not int(ids.shape[0]):
            continue
        call = functools.partial(_rc_span_call, R) if R else (
            functools.partial(_rc_class_call, K)
        )
        out = call(
            J, SUBC, ids, blk, off, cut, end, src2, out,
            alias=not first,
        )
        first = False
    return out.reshape(-1)[: plan.n_out]
