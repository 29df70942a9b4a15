"""Block-sparse SpGEMM on the MXU: C = A @ B over dense (128, 128) tiles.

The ESC SpGEMM (``ops/spgemm.py``) is gather-bound — the right general
answer on TPU, but it leaves the MXU idle.  Matrices whose nonzeros
cluster into dense-ish blocks (FEM stiffness, multi-DOF meshes — the
structural class the reference's AMB blocking targets,
``convert_amb.cu:388-525``) admit a far faster path: blockify A and B,
plan the block-level product structure on the host (reusing the C++/numpy
symbolic planner at block granularity), and run one Pallas kernel whose
grid walks (a_block, b_block -> c_block) pairs sorted by output block —
consecutive pairs hitting the same C block accumulate in VMEM, so there is
no scatter at all, and every FLOP is a 128^3 MXU matmul.

Zero fill-in inside blocks is the price (the same trade AMB's tuner makes);
``plan_spgemm_bsr`` reports the fill ratio so the auto-tuner can choose
between this and the ESC path.
"""

from __future__ import annotations

import dataclasses

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsparse_tpu.formats.csr import CSR

def _default_bs() -> int:
    """Block edge from the chip kernel config (2x the MXU tile: same bytes,
    4x fewer grid steps; the kernel is DMA-bound for dynamically-indexed
    block fetches either way)."""
    from nsparse_tpu.tune.kernelgen import kernel_config

    return kernel_config().bsr_bs


BS = 256  # fallback literal; call sites prefer _default_bs()


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _blockify(a: CSR, bs: int = BS):
    """Host: CSR -> (blocks (nb, bs, bs), block_row, block_col, fill_idx).

    ``fill_idx`` maps every block slot to its source position in the padded
    CSR value array (or to ``capacity`` — an appended zero) so new values
    re-blockify ON DEVICE with one planned gather.
    """
    import scipy.sparse as sp

    m, n = a.shape
    s = a.to_scipy()
    mp = (m + bs - 1) // bs * bs
    np_ = (n + bs - 1) // bs * bs
    s.resize((mp, np_))
    b = s.tobsr(blocksize=(bs, bs))
    b.sort_indices()
    indptr = np.asarray(b.indptr)
    brow = np.repeat(
        np.arange(len(indptr) - 1, dtype=np.int32), np.diff(indptr)
    )
    # same blockification applied to 1-based source positions gives the
    # slot -> source map (0 slots are structural padding)
    si = sp.csr_matrix(
        (
            np.arange(1, a.nnz + 1, dtype=np.float64),
            s.indices,
            s.indptr,
        ),
        shape=(mp, np_),
    ).tobsr(blocksize=(bs, bs))
    si.sort_indices()
    fill = np.asarray(si.data).astype(np.int64).reshape(-1, bs * bs) - 1
    valid = fill >= 0
    # padding slots point at the block's first real source (keeps each
    # tile's gather window tight) and are zeroed by the mask
    big = np.int64(1) << 60
    minsrc = np.where(valid, fill, big).min(axis=1)
    minsrc = np.where(minsrc == big, 0, minsrc)
    fill = np.where(valid, fill, minsrc[:, None])
    return (
        np.asarray(b.data),
        brow,
        np.asarray(b.indices, dtype=np.int32),
        fill.reshape(-1, bs, bs).astype(np.int32),
        valid.reshape(-1, bs, bs),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BsrSpgemmPlan:
    """Block-product schedule for C = A @ B on dense tiles.

    Attributes:
      a_blocks / b_blocks: (nba|nbb, BS, BS) dense tiles.
      pair_a / pair_b: (npair,) tile indices per block product.
      pair_c: (npair,) output tile index, NON-DECREASING (accumulation
        happens by revisiting the same output block on consecutive steps).
      c_block_row / c_block_col: (nbc,) C tile coordinates.
      shape: static (M, N) of C; n_block_rows static.
      fill: stored-slot / true-nnz ratios (cost model for the tuner).
      flops: true useful FLOPs (2 * intermediate products of the scalar
        matrices) — the same metric the ESC path reports.
    """

    a_blocks: jax.Array
    b_blocks: jax.Array
    pair_a: jax.Array
    pair_b: jax.Array
    pair_c: jax.Array
    c_block_row: jax.Array
    c_block_col: jax.Array
    a_fill_gp: object  # FlatGatherPlan: padded A values -> A block slots
    b_fill_gp: object
    a_fill_mask: object  # (slots,) 0/1 — zeroes structural-padding slots
    b_fill_mask: object
    c_rpt: jax.Array  # (M+1,) output row pointers (element-level pattern)
    c_col: jax.Array  # (c_nnz,) output columns, sorted within rows
    c_slot: jax.Array  # (c_nnz,) flat index into the dense C tiles
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    n_block_rows: int = dataclasses.field(metadata=dict(static=True))
    bs: int = dataclasses.field(metadata=dict(static=True))
    fill: float = dataclasses.field(metadata=dict(static=True))
    flops: int = dataclasses.field(metadata=dict(static=True))
    c_nnz: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def n_pairs(self) -> int:
        return int(self.pair_a.shape[0])

    @property
    def n_c_blocks(self) -> int:
        return int(self.c_block_row.shape[0])


def plan_spgemm_bsr(a: CSR, b: CSR, bs: int | None = None) -> BsrSpgemmPlan:
    """Host-side block symbolic phase (block-granular ESC planning)."""
    bs = bs or _default_bs()
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"shape mismatch {a.shape} @ {b.shape}")
    from nsparse_tpu.ops.spgemm import spgemm_flops

    from nsparse_tpu.ops.kernels.flat_gather import build_flat_gather_plan

    a_blk, a_brow, a_bcol, a_fill, a_mask = _blockify(a, bs)
    b_blk, b_brow, b_bcol, b_fill, b_mask = _blockify(b, bs)

    # block-level product pairs: for each a-block (i,k), every b-block (k,j)
    import scipy.sparse as sp

    nbr_a = (a.shape[0] + bs - 1) // bs
    nbc_a = (a.shape[1] + bs - 1) // bs
    nbc_b = (b.shape[1] + bs - 1) // bs
    sa = sp.csr_matrix(
        (np.arange(1, len(a_bcol) + 1), a_bcol, np.concatenate(
            [[0], np.cumsum(np.bincount(a_brow, minlength=nbr_a))]
        )),
        shape=(nbr_a, nbc_a),
    )
    sb = sp.csr_matrix(
        (np.arange(1, len(b_bcol) + 1), b_bcol, np.concatenate(
            [[0], np.cumsum(np.bincount(b_brow, minlength=nbc_a))]
        )),
        shape=(nbc_a, nbc_b),
    )

    # expand block pairs (i,k),(k,j) sorted by (i, j): reuse the host planner
    pa, pb, pc = [], [], []
    crow, ccol = [], []
    sb_indptr, sb_indices, sb_data = sb.indptr, sb.indices, sb.data
    c_id = {}
    pairs = []
    for i in range(nbr_a):
        for ap in range(sa.indptr[i], sa.indptr[i + 1]):
            k = sa.indices[ap]
            a_id = int(sa.data[ap]) - 1
            for bp in range(sb_indptr[k], sb_indptr[k + 1]):
                j = sb_indices[bp]
                b_id = int(sb_data[bp]) - 1
                pairs.append((i, int(j), a_id, b_id))
    pairs.sort()
    zero_a, zero_b = len(a_blk), len(b_blk)  # appended zero tiles

    def flush_pad():
        while len(pa) % PAIRS_PER_STEP:
            pa.append(zero_a)
            pb.append(zero_b)
            pc.append(pc[-1])

    prev_key = None
    for i, j, a_id, b_id in pairs:
        key = (i, j)
        if key not in c_id:
            if prev_key is not None:
                flush_pad()  # steps must not straddle C blocks
            c_id[key] = len(c_id)
            crow.append(i)
            ccol.append(j)
            prev_key = key
        pa.append(a_id)
        pb.append(b_id)
        pc.append(c_id[key])
    if pa:
        flush_pad()

    a_blk = np.concatenate([a_blk.reshape(-1, bs, bs),
                            np.zeros((1, bs, bs), a_blk.dtype)])
    b_blk = np.concatenate([b_blk.reshape(-1, bs, bs),
                            np.zeros((1, bs, bs), b_blk.dtype)])

    # element-level C pattern (|A| @ |B|) + per-entry tile slot: the
    # extraction back to CSR is then a single on-device gather — no dense
    # tiles ever cross the (slow) device->host link, and the pattern
    # matches the ESC path's structural output exactly
    sa_abs = a.to_scipy()
    sb_abs = b.to_scipy()
    sa_abs.data = np.abs(sa_abs.data) + 1.0
    sb_abs.data = np.abs(sb_abs.data) + 1.0
    cpat = (sa_abs @ sb_abs).tocsr()
    cpat.sort_indices()
    c_rpt = np.asarray(cpat.indptr, dtype=np.int32)
    c_col = np.asarray(cpat.indices, dtype=np.int32)
    c_rows = np.repeat(
        np.arange(cpat.shape[0], dtype=np.int64), np.diff(cpat.indptr)
    )
    crow_a = np.asarray(crow, dtype=np.int64)
    ccol_a = np.asarray(ccol, dtype=np.int64)
    tile_keys = crow_a * nbc_b + ccol_a  # sorted: pairs were (i, j) sorted
    ekey = (c_rows // bs) * nbc_b + (c_col.astype(np.int64) // bs)
    tid = np.searchsorted(tile_keys, ekey)
    c_slot = (
        tid * (bs * bs) + (c_rows % bs) * bs + (c_col.astype(np.int64) % bs)
    ).astype(np.int32)

    stored = a_blk.size + b_blk.size
    true_nnz = a.nnz + b.nnz
    return BsrSpgemmPlan(
        a_blocks=jnp.asarray(a_blk),
        b_blocks=jnp.asarray(b_blk),
        pair_a=jnp.asarray(np.asarray(pa, np.int32)),
        pair_b=jnp.asarray(np.asarray(pb, np.int32)),
        pair_c=jnp.asarray(np.asarray(pc, np.int32)),
        c_block_row=jnp.asarray(np.asarray(crow, np.int32)),
        c_block_col=jnp.asarray(np.asarray(ccol, np.int32)),
        a_fill_gp=build_flat_gather_plan(a_fill.reshape(-1)),
        b_fill_gp=build_flat_gather_plan(b_fill.reshape(-1)),
        a_fill_mask=jnp.asarray(a_mask.reshape(-1).astype(np.float32)),
        b_fill_mask=jnp.asarray(b_mask.reshape(-1).astype(np.float32)),
        c_rpt=jnp.asarray(c_rpt),
        c_col=jnp.asarray(c_col),
        c_slot=jnp.asarray(c_slot),
        shape=(a.shape[0], b.shape[1]),
        n_block_rows=nbr_a,
        bs=bs,
        fill=stored / max(true_nnz, 1),
        flops=spgemm_flops(a, b),
        c_nnz=int(cpat.nnz),
    )


# Pairs per grid step.  Measured on v5e: the kernel is DMA-bandwidth-bound
# (~70 GB/s effective on 64 KB block fetches), so batching pairs per step
# only adds pad-pair bytes (each C block's run is padded to a multiple) —
# 1 is fastest; the machinery stays general for chips where step setup
# dominates.
PAIRS_PER_STEP = 1


def _kern(pa_r, pb_r, pc_r, *refs):
    """One grid step = PAIRS_PER_STEP block products.

    The planner pads each C block's pair list to a multiple of
    PAIRS_PER_STEP (with zero-block pairs), so a step never straddles two
    C blocks and the output block accumulates in VMEM across steps.
    """
    n = PAIRS_PER_STEP
    a_refs, b_refs, o_r = refs[:n], refs[n : 2 * n], refs[2 * n]
    t = pl.program_id(0)
    first = jnp.logical_or(
        t == 0, pc_r[t * n] != pc_r[jnp.maximum(t * n - 1, 0)]
    )

    acc = jax.lax.dot(
        a_refs[0][0], b_refs[0][0], precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=o_r.dtype,
    )
    for j in range(1, n):
        acc += jax.lax.dot(
            a_refs[j][0], b_refs[j][0],
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=o_r.dtype,
        )

    @pl.when(first)
    def _():
        o_r[0] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        o_r[0] += acc


def spgemm_bsr_blocks(plan: BsrSpgemmPlan) -> jax.Array:
    """Numeric phase: (nbc, bs, bs) dense C tiles, pure MXU.

    Grid steps cover PAIRS_PER_STEP products each (planner-padded).
    f64 takes an XLA batched-matmul + segment-sum formulation (pallas
    custom calls cannot carry f64 on TPU)."""
    n = PAIRS_PER_STEP
    bs = plan.bs
    assert plan.n_pairs % n == 0
    if _interpret() is False and plan.a_blocks.dtype != jnp.float32:
        ga = plan.a_blocks[plan.pair_a]
        gb = plan.b_blocks[plan.pair_b]
        prods = jnp.einsum(
            "kij,kjl->kil", ga, gb,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jax.ops.segment_sum(
            prods, plan.pair_c, num_segments=plan.n_c_blocks,
            indices_are_sorted=True,
        )

    def a_spec(j):
        return pl.BlockSpec(
            (1, bs, bs), lambda t, pa, pb, pc, j=j: (pa[t * n + j], 0, 0),
            memory_space=pltpu.VMEM,
        )

    def b_spec(j):
        return pl.BlockSpec(
            (1, bs, bs), lambda t, pa, pb, pc, j=j: (pb[t * n + j], 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(plan.n_pairs // n,),
        in_specs=[a_spec(j) for j in range(n)]
        + [b_spec(j) for j in range(n)],
        out_specs=pl.BlockSpec(
            (1, bs, bs), lambda t, pa, pb, pc: (pc[t * n], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (plan.n_c_blocks, bs, bs), plan.a_blocks.dtype
        ),
        interpret=_interpret(),
    )(
        plan.pair_a, plan.pair_b, plan.pair_c,
        *([plan.a_blocks] * n), *([plan.b_blocks] * n),
    )


def block_stats(a: CSR, b: CSR, bs: int | None = None):
    """Host-side cost probe: (block_pairs, a_fill, b_fill) at block size bs.

    Used by :func:`choose_spgemm_path` — the analog of the reference's bin
    dispatch deciding between kernel families by measured row statistics.
    """
    import scipy.sparse as sp

    bs = bs or _default_bs()

    def graph(m):
        s = m.to_scipy().tocoo()
        br, bc = s.row // bs, s.col // bs
        nbr = (m.shape[0] + bs - 1) // bs
        nbc = (m.shape[1] + bs - 1) // bs
        g = sp.coo_matrix(
            (np.ones(len(br)), (br, bc)), shape=(nbr, nbc)
        ).tocsr()
        g.sum_duplicates()
        g.data[:] = 1.0
        return g

    ga, gb = graph(a), graph(b)
    pairs = int((ga @ gb).sum())  # sum of products of indicator entries
    a_fill = ga.nnz * bs * bs / max(a.nnz, 1)
    b_fill = gb.nnz * bs * bs / max(b.nnz, 1)
    return pairs, a_fill, b_fill


def choose_spgemm_path(a: CSR, b: CSR, bs: int | None = None) -> str:
    """'bsr' when dense-tile MXU matmuls beat the gather-bound ESC path.

    The per-product / per-pair costs come from the chip kernel config
    (``tune/kernelgen.py``), which derives them from HBM bandwidth — the
    analog of the reference generator deriving bin geometry from shared
    memory sizes.  Also require the block fill not to explode memory.
    """
    from nsparse_tpu.ops.spgemm import spgemm_flops
    from nsparse_tpu.tune.kernelgen import kernel_config

    cfg = kernel_config()
    bs = bs or cfg.bsr_bs
    pairs, a_fill, b_fill = block_stats(a, b, bs)
    if max(a_fill, b_fill) > 64:
        return "esc"
    p = spgemm_flops(a, b) // 2
    esc_ns = p * cfg.esc_ns_per_product
    bsr_ns = pairs * cfg.bsr_us_per_pair * 1e3
    return "bsr" if bsr_ns < esc_ns else "esc"


def _reblock(fill_gp, mask, val: jax.Array, bs: int, dtype) -> jax.Array:
    """Device-side re-blockification: padded CSR values -> dense tiles
    (+ the trailing zero tile the pair padding references)."""
    from nsparse_tpu.ops.kernels.flat_gather import flat_gather

    vp = jnp.pad(val.astype(dtype), (0, 1))
    flat = flat_gather(fill_gp, vp, other=mask.astype(dtype))
    blocks = flat.reshape(-1, bs, bs)
    return jnp.concatenate(
        [blocks, jnp.zeros((1, bs, bs), blocks.dtype)]
    )


def spgemm_bsr_numeric(plan: BsrSpgemmPlan, a: CSR, b: CSR) -> jax.Array:
    """Values-only re-run (the ``SpGEMM_Hash_Numeric`` analog for the block
    path): re-blockify new A/B values on device, then the MXU numeric
    phase.  Returns the dense C tiles (``spgemm_bsr`` densifies to CSR)."""
    ab = _reblock(
        plan.a_fill_gp, plan.a_fill_mask, a.val, plan.bs, plan.a_blocks.dtype
    )
    bb = _reblock(
        plan.b_fill_gp, plan.b_fill_mask, b.val, plan.bs, plan.b_blocks.dtype
    )
    plan2 = dataclasses.replace(plan, a_blocks=ab, b_blocks=bb)
    return spgemm_bsr_blocks(plan2)


def spgemm_bsr(a: CSR, b: CSR, plan: BsrSpgemmPlan | None = None) -> CSR:
    """C = A @ B through dense block tiles; returns canonical CSR.

    Extraction back to CSR is a single on-device gather through the plan's
    element-level pattern (``c_slot``) — the dense tiles never cross the
    device->host link, and the structural pattern equals the ESC path's
    (all |A|@|B| positions, explicit zeros kept), so the two methods are
    interchangeable.
    """
    if plan is None:
        plan = plan_spgemm_bsr(a, b)
    blocks = spgemm_bsr_blocks(plan)
    c_val = blocks.reshape(-1)[plan.c_slot]
    return CSR(
        rpt=plan.c_rpt,
        col=plan.c_col,
        val=c_val,
        shape=plan.shape,
        nnz=plan.c_nnz,
    )
