"""Planned run-copy kernel: phase-matched contiguous-run gather
(ops/kernels/runcopy.py) — the arena-extraction primitive of the
row-localized SpGEMM (readout analog of the reference's shared-memory
table copy-out, kernel_spgemm_hash_template.cu:700-760)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nsparse_tpu.ops.kernels.runcopy import build_runcopy_plan, runcopy


def _ref(src, src_off, lens, dst, n_out):
    out = np.zeros(n_out, src.dtype)
    for s, l, d in zip(src_off, lens, dst):
        out[d : d + l] = src[s : s + l]
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_runcopy_random_runs(seed):
    rng = np.random.default_rng(seed)
    n_src = 1 << 15
    src = rng.standard_normal(n_src).astype(np.float32)
    # arbitrary (unaligned) starts and lengths, a mix of long and short
    n_runs = 60
    lens = np.where(
        rng.random(n_runs) < 0.5,
        rng.integers(1, 30, n_runs),
        rng.integers(100, 1600, n_runs),
    ).astype(np.int64)
    src_off = rng.integers(
        0, n_src - int(lens.max()), n_runs
    ).astype(np.int64)
    plan, dst = build_runcopy_plan(src_off, lens, n_src)
    assert np.all(dst % 128 == src_off % 128)  # phase-matched
    out = np.asarray(jax.jit(runcopy)(plan, jnp.asarray(src)))
    ref = _ref(src, src_off, lens, dst, plan.n_out)
    np.testing.assert_array_equal(out, ref)  # slack slots exactly zero


def test_runcopy_dense_tiny_runs():
    """Many minimum-size runs: exercises the piece-count cap and the
    dense (J=8) class."""
    rng = np.random.default_rng(3)
    n_src = 1 << 14
    src = rng.standard_normal(n_src).astype(np.float32)
    n_runs = 300
    lens = np.full(n_runs, 8, np.int64)
    src_off = 8 * rng.integers(0, n_src // 8 - 1, n_runs).astype(np.int64)
    plan, dst = build_runcopy_plan(src_off, lens, n_src)
    out = np.asarray(runcopy(plan, jnp.asarray(src)))
    ref = _ref(src, src_off, lens, dst, plan.n_out)
    np.testing.assert_array_equal(out, ref)


def test_runcopy_empty():
    plan, dst = build_runcopy_plan(
        np.zeros(0, np.int64), np.zeros(0, np.int64), 128
    )
    assert plan.n_out == 0 and dst.size == 0
    out = runcopy(plan, jnp.zeros(128, jnp.float32))
    assert out.shape == (0,)


def test_runcopy_wide_spread():
    """Runs scattered over a wide source (per-supertile span exceeds
    every span bucket): exercises the per-piece block-pair classes."""
    rng = np.random.default_rng(7)
    n_src = 1 << 21
    src = rng.standard_normal(n_src).astype(np.float32)
    n_runs = 48
    lens = rng.integers(40, 500, n_runs).astype(np.int64)
    src_off = np.sort(
        rng.integers(0, n_src - 512, n_runs).astype(np.int64)
    )[::-1].copy()  # descending: adjacent dst far apart in src
    plan, dst = build_runcopy_plan(src_off, lens, n_src)
    pair_steps = sum(int(i.shape[0]) for i in plan.ids[2:4])
    assert pair_steps > 0  # the spread defeats the span buckets
    out = np.asarray(jax.jit(runcopy)(plan, jnp.asarray(src)))
    ref = _ref(src, src_off, lens, dst, plan.n_out)
    np.testing.assert_array_equal(out, ref)


def test_runcopy_reduce_factors():
    """K > 1 runs: out[p] = sum_t src[S + t*stride + p] — the member-minor
    slab fold of the window arenas."""
    rng = np.random.default_rng(5)
    n_src = 1 << 16
    src = rng.standard_normal(n_src).astype(np.float32)
    src_off, lens, kfac, strd = [], [], [], []
    cursor = 0
    for K, count, lmax in ((1, 8, 600), (2, 6, 300), (4, 5, 150), (8, 4, 80)):
        for _ in range(count):
            ln = int(rng.integers(3, lmax))
            st = ln + int(rng.integers(0, 9))  # stride >= out length
            s = cursor + int(rng.integers(0, 33))
            src_off.append(s)
            lens.append(ln)
            kfac.append(K)
            strd.append(st)
            cursor = s + st * K
    src_off = np.asarray(src_off, np.int64)
    lens = np.asarray(lens, np.int64)
    kfac = np.asarray(kfac, np.int64)
    strd = np.asarray(strd, np.int64)
    assert cursor <= n_src
    plan, dst = build_runcopy_plan(
        src_off, lens, n_src, kfac=kfac, stride=strd
    )
    out = np.asarray(jax.jit(runcopy)(plan, jnp.asarray(src)))
    ref = np.zeros(plan.n_out, np.float32)
    for s, l, d, K, st in zip(src_off, lens, dst, kfac, strd):
        acc = np.zeros(l, np.float32)
        for t in range(K):
            acc += src[s + t * st : s + t * st + l]
        ref[d : d + l] = acc
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
