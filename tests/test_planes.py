"""fp64 two-plane movement (ops/kernels/planes.py).

The movement kernels are pure permutations, so f64 must ride them as two
uint32 bit planes bit-exactly — including NaN payloads, signed zeros,
denormals (a value-semantics route like ``1.0 * x`` would quiet sNaNs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nsparse_tpu.ops.kernels import planes


def _weird_f64(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(n)
    v[:: 7] = -0.0
    v[1:: 11] = np.inf
    v[2:: 13] = np.nan
    v[3:: 17] = 5e-324  # denormal
    return v


def test_split_combine_roundtrip():
    x = jnp.asarray(_weird_f64(1000), jnp.float64)
    lo, hi = planes.split(x)
    assert lo.dtype == jnp.uint32 and hi.dtype == jnp.uint32
    y = planes.combine(lo, hi)
    np.testing.assert_array_equal(
        np.asarray(x).view(np.uint64), np.asarray(y).view(np.uint64)
    )


def test_moved_applies_permutation_bit_exactly():
    x = jnp.asarray(_weird_f64(512, seed=3), jnp.float64)
    perm = np.random.default_rng(4).permutation(512)
    y = planes.moved(lambda p: p[perm], x)
    np.testing.assert_array_equal(
        np.asarray(x).view(np.uint64)[perm], np.asarray(y).view(np.uint64)
    )


def test_flat_gather_f64_planes():
    """flat_gather's f64 route must match the XLA gather bit-for-bit,
    including sentinel (-1) slots -> +0.0."""
    import nsparse_tpu.ops.kernels.flat_gather as fg

    rng = np.random.default_rng(5)
    src = _weird_f64(4096, seed=6)
    idx = rng.integers(0, 4096, size=2048).astype(np.int32)
    idx[:: 5] = -1
    plan = fg.build_flat_gather_plan(idx)
    old = fg.FORCE_PALLAS
    fg.FORCE_PALLAS = True
    try:
        out = fg.flat_gather(plan, jnp.asarray(src, jnp.float64))
    finally:
        fg.FORCE_PALLAS = old
    ref = np.where(idx >= 0, src[np.clip(idx, 0, None)], 0.0)
    np.testing.assert_array_equal(
        np.asarray(out).view(np.uint64), ref.view(np.uint64)
    )


def test_runcopy_f64_requires_fixed_plan():
    from nsparse_tpu.ops.kernels.runcopy import RunCopyPlan, runcopy

    plan = RunCopyPlan.__new__(RunCopyPlan)
    object.__setattr__(plan, "flat_idx", None)
    object.__setattr__(plan, "classes", None)
    object.__setattr__(plan, "n_out", 8)
    object.__setattr__(plan, "n_src", 8)
    with pytest.raises(NotImplementedError):
        runcopy(plan, jnp.zeros(8, jnp.float64))
