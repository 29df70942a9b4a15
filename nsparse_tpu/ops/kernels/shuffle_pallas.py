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


def _benes_kernel(x_ref, m_ref, o_ref, *, width: int):
    """Apply per-row Benes-``width`` to a (S, 128) block.

    Rows are width/128 consecutive sublanes, power-of-two aligned within the
    block, so XOR-partner exchange at distance d is a global roll+select:
    lanes for d < 128, sublanes for d >= 128 (wrap reads are never selected
    because an XOR partner is always within the same aligned row).
    """
    z = x_ref[:]
    m = m_ref[:]
    s_rows = z.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    for t, d in enumerate(_benes_stages(width)):
        if d < LANES:
            left = pltpu.roll(z, (LANES - d) % LANES, 1)
            right = pltpu.roll(z, d, 1)
            part = jnp.where((lane & d) == 0, left, right)
        else:
            sd = d // LANES
            up = pltpu.roll(z, (s_rows - sd) % s_rows, 0)
            dn = pltpu.roll(z, sd % s_rows, 0)
            part = jnp.where((sub & sd) == 0, up, dn)
        bit = (m >> t) & 1
        z = jnp.where(bit == 1, part, z)
    o_ref[:] = z


def _benes_pass(x2: jax.Array, masks: jax.Array, width: int) -> jax.Array:
    """Per-row Benes over a (total_sublanes, 128) array; rows are
    width/128-sublane groups.  Blocks of >=256 sublanes amortize grid-step
    overhead."""
    total = int(x2.shape[0])
    block = max(256, width // LANES)
    while total % block:
        block //= 2
    grid = total // block
    return pl.pallas_call(
        functools.partial(_benes_kernel, width=width),
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

    if n < _FALLBACK_N:
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
    m1 = benes_route(s1.reshape(-1), cs)
    m2 = benes_route(s2.reshape(-1), r)
    m3 = benes_route(s3.reshape(-1), cs)
    return ShufflePlan(
        m1=jnp.asarray(m1.reshape(-1, LANES)),
        m2=jnp.asarray(m2.reshape(-1, LANES)),
        m3=jnp.asarray(m3.reshape(-1, LANES)),
        idx=None,
        r=r, cu=cu, cs=cs, n=n,
    )


def planned_shuffle(plan: ShufflePlan, x: jax.Array) -> jax.Array:
    """out[i] = x[src[i]] for the routed permutation; x flat, length >= n
    (tail slots beyond plan.n must be zero-padding or garbage the caller
    never selects — the routed permutation maps the [n, r*cu) identity
    tail onto itself)."""
    if plan.idx is not None:
        return x[plan.idx][: plan.n]
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

    y1 = _benes_pass(zi, plan.m1, cs)
    y2 = y1.reshape(r, cs).T.reshape(-1, LANES)
    y3 = _benes_pass(y2, plan.m2, r)
    y4 = y3.reshape(cs, r).T.reshape(-1, LANES)
    y5 = _benes_pass(y4, plan.m3, cs)
    return y5.reshape(r, cs)[:, :cu].reshape(-1)[: plan.n]
