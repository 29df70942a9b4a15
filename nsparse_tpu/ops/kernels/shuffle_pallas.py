"""Planned shuffle: apply an arbitrary plan-known permutation at memory
bandwidth.

TPU has no vector gather/scatter; XLA lowers ``x[idx]`` to a ~12-cycle-per-
element scalar loop and ``lax.sort`` of tens of millions of keys costs tens
of milliseconds (~80 ms for 17M key-value pairs on v5e).  But any
*plan-known* permutation can be routed at plan time
(``native/shuffle.cpp``) into a 3-stage slack-Clos network whose row-local
stages are Benes exchange networks — and a Benes stage is just
``roll + select`` on the VPU.  The device executes:

    expand    (R, Cu) -> (R, Cs)   zero-fill the slack columns (XLA pass)
    stage 1   per-row Benes-Cs
    transpose (R, Cs) -> (Cs, R)   (XLA, memory-bandwidth)
    stage 2   per-row Benes-R
    transpose back
    stage 3   per-row Benes-Cs; keep the first Cu columns

Each stage reads an int32 mask array (bit t = "swap with the XOR-distance
partner at stage t").  Because rows are power-of-two wide and aligned,
within-row XOR exchange equals *global* XOR exchange on the block sublane /
lane axes — so one kernel handles every stage on large (>=256 sublane)
blocks, avoiding per-grid-step overhead (measured ~1 us/step: (8,128)
blocks run 10x slower than (256,128)).

This replaces the role the reference's Thrust sort_by_key plays
(``cuda-c/src/kernel/kernel_spgemm_hash_template.cu:805-815``): plan-known
data movement without a comparison sort.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_FALLBACK_N = 1 << 17  # below this, XLA's gather is fine and grids are tiny
# off-TPU, always store plain gather indices: interpret-mode Benes passes
# cost minutes per compile in the CPU test suite, and the mask path is
# covered by the forced test_shuffle cases (tests monkeypatch this False)
_CPU_GATHER = True


def _prefer_gather(n: int) -> bool:
    if n < _FALLBACK_N:
        return True
    from nsparse_tpu.ops.kernels.runcopy import _build_for_tpu

    return (
        _CPU_GATHER
        and jax.default_backend() != "tpu"
        and not _build_for_tpu()
    )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShufflePlan:
    """Routing for ``out[i] = x[src[i]]`` with plan-known permutation src.

    Attributes:
      m1/m2/m3: per-stage Benes masks, physical layout (rows, 128) int32.
      idx: fallback gather indices (small n or no native router) — when not
        None the masks are unused.
      r/cu/cs: Clos grid (R rows, Cu used columns, Cs middle slots).
      n: true element count.
    """

    m1: jax.Array
    m2: jax.Array
    m3: jax.Array
    idx: object  # Optional[jax.Array]
    r: int = dataclasses.field(metadata=dict(static=True))
    cu: int = dataclasses.field(metadata=dict(static=True))
    cs: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    # 128x128-transposed masks for the d<128 middle stages (lane rolls
    # cost ~8 cyc/vreg; the transposed middle runs them as sublane
    # stages).  m1/m2/m3 then carry only the outer (d>=128) bits.
    t1: object = None
    t2: object = None
    t3: object = None

    @property
    def uses_fallback(self) -> bool:
        return self.idx is not None

    @property
    def hbm_bytes(self) -> int:
        """Mask bytes read per application (capacity planning aid)."""
        if self.idx is not None:
            return int(self.idx.shape[0]) * 4
        return 4 * (self.m1.size + self.m2.size + self.m3.size)


def _benes_stages(width: int):
    """Stage XOR distances: W/2, ..., 1, ..., W/2 (2*log2(W)-1 stages)."""
    w = width.bit_length() - 1
    return [width >> (t + 1) for t in range(w)] + [
        1 << (t + 1) for t in range(w - 1)
    ]


def _benes_kernel(x_ref, m_ref, o_ref, *, width: int, stages=None,
                  sub_dist: bool = False):
    """Apply (a subset of) the per-row Benes-``width`` stages to a (S, 128)
    block.

    Rows are width/128 consecutive sublanes, power-of-two aligned within the
    block, so XOR-partner exchange at distance d is a global roll+select:
    lanes for d < 128, sublanes for d >= 128 (wrap reads are never selected
    because an XOR partner is always within the same aligned row).

    ``stages``: (t, d) pairs to apply (default: all).  ``sub_dist``: the
    data is in the 128x128-transposed layout, so distances d < 128 are
    SUBLANE distances (lane rolls cost ~8 cyc/vreg on this VPU; sublane
    rolls are ~free — this is the whole point of the transposed middle).
    """
    z = x_ref[:]
    m = m_ref[:]
    s_rows = z.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    if stages is None:
        stages = list(enumerate(_benes_stages(width)))
    for t, d in stages:
        if sub_dist or d >= LANES:
            sd = d // LANES if d >= LANES else d
            up = pltpu.roll(z, (s_rows - sd) % s_rows, 0)
            dn = pltpu.roll(z, sd % s_rows, 0)
            part = jnp.where((sub & sd) == 0, up, dn)
        else:
            left = pltpu.roll(z, (LANES - d) % LANES, 1)
            right = pltpu.roll(z, d, 1)
            part = jnp.where((lane & d) == 0, left, right)
        # bit-t as a sign test: shift+compare, one op fewer per stage
        z = jnp.where((m << (31 - t)) < 0, part, z)
    o_ref[:] = z


def _benes_call(x2, masks, width, stages=None, sub_dist=False):
    total = int(x2.shape[0])
    block = max(256, width // LANES if not sub_dist else LANES)
    while total % block:
        block //= 2
    grid = total // block
    return pl.pallas_call(
        functools.partial(
            _benes_kernel, width=width, stages=stages, sub_dist=sub_dist
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        interpret=_interpret(),
    )(x2, masks)


def _benes_pass(x2: jax.Array, masks: jax.Array, width: int) -> jax.Array:
    """Per-row Benes over a (total_sublanes, 128) array; rows are
    width/128-sublane groups."""
    return _benes_call(x2, masks, width)


def _trans128(x2: jax.Array) -> jax.Array:
    """128x128-block transpose of the flat (rows, 128) layout (XLA,
    memory-bandwidth)."""
    return x2.reshape(-1, LANES, LANES).transpose(0, 2, 1).reshape(
        -1, LANES
    )


def _benes_pass_split(
    x2: jax.Array, m_out: jax.Array, m_midt: jax.Array, width: int
) -> jax.Array:
    """Benes pass with the d<128 middle stages run in the transposed
    layout: 13 lane-roll stages (~8 cyc/vreg each) become sublane stages
    (~free) at the cost of two XLA block transposes (memory speed)."""
    w = width.bit_length() - 1
    s_total = 2 * w - 1
    k = w - 7  # stages with d >= 128 on each side
    stages = list(enumerate(_benes_stages(width)))
    if k <= 0:  # width <= 128: every stage is lane-distance
        yt = _benes_call(
            _trans128(x2), m_midt, width, stages=stages, sub_dist=True
        )
        return _trans128(yt)
    y = _benes_call(x2, m_out, width, stages=stages[:k])
    yt = _benes_call(
        _trans128(y), m_midt, width, stages=stages[k : s_total - k],
        sub_dist=True,
    )
    y = _trans128(yt)
    return _benes_call(y, m_out, width, stages=stages[s_total - k :])


def build_shuffle_plan(src: np.ndarray, cu: int | None = None) -> ShufflePlan:
    """Host-side: route the permutation ``src`` (out[i] = x[src[i]]).

    Falls back to storing plain gather indices when the array is small, the
    native router is unavailable, or no power-of-two grid fits.
    """
    src = np.asarray(src, dtype=np.int32).reshape(-1)
    n = src.size
    # cheap validation only for small inputs (large callers are trusted)
    if n <= 4096 and not (np.sort(src) == np.arange(n)).all():
        raise ValueError("src must be a permutation")

    def fallback():
        return ShufflePlan(
            m1=jnp.zeros((1, LANES), jnp.int32),
            m2=jnp.zeros((1, LANES), jnp.int32),
            m3=jnp.zeros((1, LANES), jnp.int32),
            idx=jnp.asarray(src),
            r=0, cu=0, cs=0, n=n,
        )

    if _prefer_gather(n):
        return fallback()
    from nsparse_tpu.native import benes_route, clos_route_slack, get_lib

    if get_lib() is None:
        return fallback()

    # grid: R power-of-two rows of cu used slots and a cs-wide middle.
    # Smaller R minimizes middle traffic (R*cs slots); cu/cs <= 0.75 keeps
    # Paull repair chains short (they blow up approaching the
    # rearrangeability bound).  R >= 128 for the stage-2 tile layout,
    # <= 65536 for 31 mask bits.
    cs = 2048
    occ_cap = int(0.75 * cs)
    if cu is None:
        r = 128
        while r * occ_cap < n and r < 65536:
            r *= 2
        cu = -(-n // r)  # ceil: tightest row occupancy for this R
    else:
        r = 128
        while r * cu < n:
            r *= 2
        while cs < 2 * cu:  # caller-forced cu: widen the middle if needed
            cs *= 2
    if r > 65536 or cu > occ_cap:
        return fallback()
    n_pad = r * cu
    src_pad = np.concatenate(
        [src, np.arange(n, n_pad, dtype=np.int32)]
    ) if n_pad > n else src

    s1, s2, s3 = clos_route_slack(src_pad, r, cu, cs)

    def route(stage, width):
        """(outer-bit mask array, 128x128-transposed middle-bit array).

        The native router emits the split pair directly (middle bits at the
        block-transposed position); the numpy fallback splits a single mask
        array after the fact."""
        from nsparse_tpu.native import benes_route_split

        pair = benes_route_split(stage.reshape(-1), width)
        if pair is not None:
            mo, mt = pair
            return mo.reshape(-1, LANES), mt.reshape(-1, LANES)
        m = benes_route(stage.reshape(-1), width)
        w = width.bit_length() - 1
        s_total = 2 * w - 1
        k = max(w - 7, 0)
        outer_bits = ((1 << k) - 1) | (((1 << k) - 1) << (s_total - k))
        flat = m.reshape(-1)
        mo = (flat & outer_bits).reshape(-1, LANES)
        mt = (flat & ~outer_bits & ((1 << s_total) - 1)).reshape(
            -1, LANES, LANES
        ).transpose(0, 2, 1).reshape(-1, LANES)
        return mo, mt

    m1o, m1t = route(s1, cs)
    m2o, m2t = route(s2, r)
    m3o, m3t = route(s3, cs)
    return ShufflePlan(
        m1=jnp.asarray(m1o),
        m2=jnp.asarray(m2o),
        m3=jnp.asarray(m3o),
        idx=None,
        r=r, cu=cu, cs=cs, n=n,
        t1=jnp.asarray(m1t),
        t2=jnp.asarray(m2t),
        t3=jnp.asarray(m3t),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TileBenesPlan:
    """Routing for a batch of INDEPENDENT width-``w`` tile permutations
    (``out[t*w + i] = x[t*w + perm_t[i]]``) applied as ONE Benes pass.

    This is the window-local counterpart of the 3-stage slack-Clos
    ``ShufflePlan``: when a permutation factorizes into power-of-two tiles
    (the row-localized SpGEMM arenas), a single per-tile Benes needs
    ``2*log2(w) - 1`` stages instead of the global network's ~70 and no
    slack expansion — the TPU analog of the reference keeping each row's
    hash table in one block's shared memory (``HashSpGEMM.hpp:509-700``).

    Attributes:
      mo: (rows, 128) int32 outer-stage masks (XOR distance >= 128).
      mt: (rows, 128) int32 transposed-middle masks (distance < 128, at
        the 128x128 block-transposed position).
      idx: fallback gather indices (small n / no native router).
      w: tile width (power of two, 256..65536).
      n: total slots (n_tiles * w).
    """

    mo: jax.Array
    mt: jax.Array
    idx: object  # Optional[jax.Array]
    w: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))

    @property
    def uses_fallback(self) -> bool:
        return self.idx is not None


def build_tile_benes(
    perms: np.ndarray, width: int, force: bool = False
) -> TileBenesPlan:
    """Route ``n_tiles = perms.size // width`` independent tile-local
    permutations.  ``perms`` holds TILE-LOCAL source indices (concatenated).

    The caller should pad the batch so ``perms.size`` is a multiple of
    ``max(32768, width)`` (identity tiles route to zero masks and are
    nearly free; 32768 keeps the (256, 128) kernel blocks that run ~10x
    faster than minimal ones); the hard mask-path requirement is a
    multiple of ``max(16384, width)`` (the 128x128 transpose block).
    Smaller batches take the XLA-gather fallback unless ``force`` (tests).
    """
    perms = np.asarray(perms, dtype=np.int32).reshape(-1)
    n = perms.size
    if n % width:
        raise ValueError(f"{n} slots not a multiple of width {width}")

    def fallback():
        glob = (
            perms.reshape(-1, width)
            + (np.arange(n // width, dtype=np.int64)[:, None] * width)
        ).reshape(-1).astype(np.int32)
        return TileBenesPlan(
            mo=jnp.zeros((1, LANES), jnp.int32),
            mt=jnp.zeros((1, LANES), jnp.int32),
            idx=jnp.asarray(glob), w=width, n=n,
        )

    if (_prefer_gather(n) and not force) or n % max(16384, width):
        return fallback()
    from nsparse_tpu.native import benes_route_split, get_lib

    if get_lib() is None:
        return fallback()
    pair = benes_route_split(perms, width)
    if pair is None:
        return fallback()
    mo, mt = pair
    return TileBenesPlan(
        mo=jnp.asarray(mo.reshape(-1, LANES)),
        mt=jnp.asarray(mt.reshape(-1, LANES)),
        idx=None, w=width, n=n,
    )


def tile_benes_apply(plan: TileBenesPlan, x: jax.Array) -> jax.Array:
    """Apply the batched per-tile permutation to ``x`` (flat, >= plan.n)."""
    if plan.idx is not None:
        return x[plan.idx]
    if x.dtype == jnp.float64:
        # pure permutation: two uint32 bit planes (ops/kernels/planes.py)
        from nsparse_tpu.ops.kernels import planes

        return planes.moved(lambda p: tile_benes_apply(plan, p), x)
    x2 = x[: plan.n].reshape(-1, LANES)
    return _benes_pass_split(x2, plan.mo, plan.mt, plan.w).reshape(-1)


def planned_shuffle(plan: ShufflePlan, x: jax.Array) -> jax.Array:
    """out[i] = x[src[i]] for the routed permutation; x flat, length >= n
    (tail slots beyond plan.n must be zero-padding or garbage the caller
    never selects — the routed permutation maps the [n, r*cu) identity
    tail onto itself)."""
    if plan.idx is not None:
        return x[plan.idx][: plan.n]
    if x.dtype == jnp.float64:
        # pure permutation + zero fill: ride as two uint32 planes
        from nsparse_tpu.ops.kernels import planes

        return planes.moved(lambda p: planned_shuffle(plan, p), x)
    r, cu, cs = plan.r, plan.cu, plan.cs
    n_pad = r * cu
    if int(x.shape[0]) < n_pad:
        x = jnp.pad(x, (0, n_pad - int(x.shape[0])))
    else:
        x = x[:n_pad]

    # expand: zero-fill the slack columns -> (R, Cs)
    zi = jnp.concatenate(
        [x.reshape(r, cu), jnp.zeros((r, cs - cu), x.dtype)], axis=1
    ).reshape(-1, LANES)

    if plan.t1 is not None:
        y1 = _benes_pass_split(zi, plan.m1, plan.t1, cs)
        y2 = y1.reshape(r, cs).T.reshape(-1, LANES)
        y3 = _benes_pass_split(y2, plan.m2, plan.t2, r)
        y4 = y3.reshape(cs, r).T.reshape(-1, LANES)
        y5 = _benes_pass_split(y4, plan.m3, plan.t3, cs)
    else:  # legacy single-array masks
        y1 = _benes_pass(zi, plan.m1, cs)
        y2 = y1.reshape(r, cs).T.reshape(-1, LANES)
        y3 = _benes_pass(y2, plan.m2, r)
        y4 = y3.reshape(cs, r).T.reshape(-1, LANES)
        y5 = _benes_pass(y4, plan.m3, cs)
    return y5.reshape(r, cs)[:, :cu].reshape(-1)[: plan.n]
