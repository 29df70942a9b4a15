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

LANES = 128
TILE_ROWS = 8
TILE = TILE_ROWS * LANES          # 1024-element subtiles
BLK_ROWS = 16                     # (16, 128) source blocks, 1024-granular ids
SRC_BIAS = TILE                   # zero rows prepended (negative aligned base)
# (pieces per subtile, subtiles per grid step): 16 dynamic source blocks per
# step in both classes; the dense class trades grid amortization for budget
CLASSES = ((2, 8), (8, 2))
J_MAX = CLASSES[-1][0]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-max(x, 0) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RunCopyPlan:
    """Routing for the planned run gather.

    Attributes:
      ids: per class, supertile indices (units of SUB subtiles).
      blk: per class, (n_steps, SUB*J) int32 source-block ids (units of
        TILE elements; inert pieces point at block 0).
      srow: per class, (n_steps * SUB, J) int32 sublane row offset of the
        aligned piece base within its (16, 128) block (0..8).
      cut / end: per class, (n_steps * SUB, J) int32 piece bounds within
        the subtile (TILE/TILE = inert; [end_j, cut_{j+1}) is zeroed).
      n_src: source length the plan was built for (pre-BIAS).
      n_out: output length (multiple of TILE).
    """

    ids: Tuple
    blk: Tuple
    srow: Tuple
    cut: Tuple
    end: Tuple
    n_src: int = dataclasses.field(metadata=dict(static=True))
    n_out: int = dataclasses.field(metadata=dict(static=True))


def build_runcopy_plan(
    src_off: np.ndarray, lens: np.ndarray, n_src: int
) -> Tuple[RunCopyPlan, np.ndarray]:
    """Assign phase-matched destinations to runs and route the pieces.

    ``src_off``/``lens``: per-run source starts and lengths (elements;
    starts and lengths need not be aligned — slack slots come out zero).
    Returns (plan, dst_off): the builder CHOOSES each run's destination
    offset (ascending, ``dst ≡ src (mod 128)``, at most J_MAX pieces per
    subtile); callers map downstream consumers with ``dst_off``.
    """
    src_off = np.asarray(src_off, dtype=np.int64).reshape(-1)
    lens = np.asarray(lens, dtype=np.int64).reshape(-1)
    n_runs = src_off.size
    if n_runs == 0:
        empty = tuple(() for _ in CLASSES)
        return (
            RunCopyPlan(
                ids=tuple(jnp.zeros((0,), jnp.int32) for _ in CLASSES),
                blk=tuple(jnp.zeros((0, j * s), jnp.int32)
                          for j, s in CLASSES),
                srow=tuple(jnp.zeros((0, j), jnp.int32) for j, s in CLASSES),
                cut=tuple(jnp.zeros((0, j), jnp.int32) for j, s in CLASSES),
                end=tuple(jnp.zeros((0, j), jnp.int32) for j, s in CLASSES),
                n_src=n_src, n_out=0,
            ),
            np.zeros(0, np.int64),
        )

    # --- destination assignment: ascending cursor, phase-matched, piece-
    # count capped per subtile (a run spanning a subtile boundary counts
    # once in each) ------------------------------------------------------
    dst = np.empty(n_runs, dtype=np.int64)
    cursor = 0
    tile_cnt = 0  # pieces already in the cursor's subtile
    tile_id = 0
    for r in range(n_runs):
        d = cursor + (src_off[r] - cursor) % LANES
        t = d // TILE
        cnt = tile_cnt if t == tile_id else 0
        if cnt >= J_MAX:  # subtile full: skip to the next, re-phase
            d = (t + 1) * TILE + src_off[r] % LANES
            t = d // TILE
            cnt = 0
        dst[r] = d
        cursor = d + lens[r]
        tile_id = cursor // TILE
        # pieces in the final subtile: this run's continuation (1) counts
        tile_cnt = (cnt + 1) if tile_id == t else 1
    n_out = _round_up(cursor, TILE)

    # --- piece table: per subtile, the covering runs -------------------
    n_sub = n_out // TILE
    sub_base = np.arange(n_sub, dtype=np.int64) * TILE
    # first run whose dst span may reach this subtile
    first = np.searchsorted(dst, sub_base, side="right") - 1
    # drop the continuation when it ends at/before the subtile base
    ends_abs = dst + lens
    has_cont = (first >= 0) & (ends_abs[np.maximum(first, 0)] > sub_base)
    first = np.where(has_cont, first, first + 1)
    nxt = np.searchsorted(dst, sub_base + TILE, side="left")
    count = nxt - first
    jmax_by_sub = count  # <= J_MAX by construction

    def pieces_for(subs: np.ndarray, J: int):
        k = np.arange(J, dtype=np.int64)
        r = first[subs][:, None] + k[None, :]
        valid = (k[None, :] < count[subs][:, None]) & (r < n_runs)
        rc = np.minimum(np.maximum(r, 0), n_runs - 1)
        base = sub_base[subs][:, None]
        cut = np.where(valid, np.maximum(dst[rc] - base, 0), TILE)
        end = np.where(valid, np.minimum(ends_abs[rc] - base, TILE), TILE)
        aligned = SRC_BIAS + src_off[rc] + base - dst[rc]  # multiple of 128
        blk = np.where(valid, aligned // TILE, 0)
        srow = np.where(valid, (aligned % TILE) // LANES, 0)
        return (
            cut.astype(np.int32), end.astype(np.int32),
            blk.astype(np.int32), srow.astype(np.int32),
        )

    ids_l, blk_l, srow_l, cut_l, end_l = [], [], [], [], []
    n_super = (n_sub + 7) // 8  # supertiles of 8 subtiles
    padded_sub = _round_up(n_sub, 8)
    cnt_pad = np.zeros(padded_sub, dtype=np.int64)
    cnt_pad[:n_sub] = jmax_by_sub
    jmax_super = cnt_pad.reshape(-1, 8).max(axis=1)
    assigned = np.zeros(n_super, dtype=bool)
    for J, SUBC in CLASSES:
        ok = (~assigned) & (jmax_super <= J)
        assigned |= ok
        sids = np.nonzero(ok)[0].astype(np.int64)
        # group supertiles into grid steps of SUBC subtiles each: a class
        # step covers SUBC consecutive subtiles of ONE supertile, so split
        # each 8-subtile supertile into 8 // SUBC steps
        per = 8 // SUBC
        steps = (
            sids[:, None] * per + np.arange(per)[None, :]
        ).reshape(-1)
        # fully-dead steps (all their subtiles beyond n_sub) must not run:
        # their zero writes would land on an out-of-range output block
        # (clamped onto real data in interpret mode, a runtime crash on TPU)
        steps = steps[steps * SUBC < n_sub]
        subs = (
            steps[:, None] * SUBC + np.arange(SUBC)[None, :]
        ).reshape(-1)
        live = subs < n_sub
        subs = np.minimum(subs, padded_sub - 1)
        cut, end, blk, srow = pieces_for(np.minimum(subs, n_sub - 1), J)
        cut[~live] = TILE
        end[~live] = TILE
        blk[~live] = 0
        ids_l.append(jnp.asarray(steps.astype(np.int32)))
        blk_l.append(jnp.asarray(
            blk.reshape(-1, SUBC * J).astype(np.int32)
        ))
        srow_l.append(jnp.asarray(srow))
        cut_l.append(jnp.asarray(cut))
        end_l.append(jnp.asarray(end))

    plan = RunCopyPlan(
        ids=tuple(ids_l), blk=tuple(blk_l), srow=tuple(srow_l),
        cut=tuple(cut_l), end=tuple(end_l), n_src=n_src, n_out=int(n_out),
    )
    return plan, dst


def _make_rc_kern(j_budget: int, sub: int):
    # piece scalars ride a blocked SMEM operand (8-row blocks at i // 8 —
    # the prefetch operand is SMEM-size-capped at ~1 MB and only the block
    # ids must be prefetched for the index maps); columns: [n_j srow |
    # n_j cut | n_j end]
    n_j = sub * j_budget

    def kern(bp_ref, desc_ref, *refs):
        del bp_ref
        blocks = refs[:-2]  # 2 * n_j paired (8, 128) source blocks
        out_ref = refs[-1]
        r = pl.program_id(0) % 8
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
                cat = jnp.concatenate(
                    [blocks[2 * jj][:], blocks[2 * jj + 1][:]], axis=0
                )
                srow = desc_ref[r, jj]
                # rows [srow, srow + 8) of the 16-row pair, srow in [0, 8)
                seg = pltpu.roll(
                    cat, (2 * TILE_ROWS - srow) % (2 * TILE_ROWS), 0
                )[:TILE_ROWS]
                acc = jnp.where(pos >= desc_ref[r, n_j + jj], seg, acc)
                acc = jnp.where(pos >= desc_ref[r, 2 * n_j + jj], 0.0,
                                acc)
            out_ref[pl.ds(k * TILE_ROWS, TILE_ROWS), :] = acc

    return kern


def _rc_class_call(J, SUBC, ids, blk, srow, cut, end, src2, out):
    n_steps = int(ids.shape[0])
    sub = 1 if _interpret() else SUBC
    if sub == 1 and SUBC > 1:
        ids = (
            ids[:, None] * SUBC + jnp.arange(SUBC, dtype=ids.dtype)[None, :]
        ).reshape(-1)
        blk = blk.reshape(-1, J)
    block_rows = sub * TILE_ROWS
    # prefetch: [out tile id | n_j block ids]; piece scalars in a blocked
    # SMEM operand (the prefetch operand is SMEM-size-capped)
    n_j = sub * J
    n_steps = int(ids.shape[0])
    # FLAT prefetch: a 2-D (n, k) prefetch operand is lane-padded to
    # (n, 128) in SMEM (measured: it blew the 1 MB SMEM cap); 1-D stays
    # contiguous.  Layout: step-major [out tile id, n_j block ids].
    blkp = jnp.concatenate(
        [ids.reshape(-1, 1), blk.reshape(n_steps, n_j)], axis=1
    ).reshape(-1)
    stride = 1 + n_j
    desc = jnp.concatenate(
        [
            srow.reshape(n_steps, n_j),
            cut.reshape(n_steps, n_j),
            end.reshape(n_steps, n_j),
        ],
        axis=1,
    )
    pad_steps = _round_up(n_steps, 8) - n_steps
    if pad_steps:
        desc = jnp.concatenate(
            [desc, jnp.full((pad_steps, 3 * n_j), TILE, desc.dtype)]
        )

    def mk_src_spec(jj, second):
        return pl.BlockSpec(
            (TILE_ROWS, LANES),
            lambda i, bp, jj=jj, s=int(second): (
                bp[i * stride + 1 + jj] + s, 0
            ),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=(
            [pl.BlockSpec((8, 3 * n_j), lambda i, bp: (i // 8, 0),
                          memory_space=pltpu.SMEM)]
            + [mk_src_spec(jj // 2, jj % 2) for jj in range(2 * n_j)]
            + [pl.BlockSpec(
                (block_rows, LANES),
                lambda i, bp: (bp[i * stride], 0),
                memory_space=pltpu.VMEM,
            )]
        ),
        out_specs=pl.BlockSpec(
            (block_rows, LANES), lambda i, bp: (bp[i * stride], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kern = _make_rc_kern(J, sub)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out.shape, out.dtype),
        input_output_aliases={2 + 2 * n_j: 0},
        interpret=_interpret(),
    )(blkp, desc, *([src2] * (2 * n_j)), out)


def runcopy(plan: RunCopyPlan, src: jax.Array) -> jax.Array:
    """Device: materialize the (n_out,) destination array.

    ``src`` is the flat source (length >= plan.n_src); BIAS/tail zero
    padding is added here.
    """
    if plan.n_out == 0:
        return jnp.zeros((0,), src.dtype)
    pad_len = _round_up(SRC_BIAS + plan.n_src, TILE) + 3 * TILE
    src_p = jnp.zeros(pad_len, src.dtype)
    src_p = jax.lax.dynamic_update_slice(
        src_p, src[: plan.n_src], (SRC_BIAS,)
    )
    src2 = src_p.reshape(-1, LANES)
    # partially-live steps write zero subtiles into the supertile round-up
    # region; allocate it and slice back at the end
    n_alloc = _round_up(plan.n_out, 8 * TILE)
    out = jnp.zeros((n_alloc // LANES, LANES), src.dtype)
    for (J, SUBC), ids, blk, srow, cut, end in zip(
        CLASSES, plan.ids, plan.blk, plan.srow, plan.cut, plan.end
    ):
        if not int(ids.shape[0]):
            continue
        out = _rc_class_call(J, SUBC, ids, blk, srow, cut, end, src2, out)
    return out.reshape(-1)[: plan.n_out]
