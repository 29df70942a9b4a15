"""Piecewise-run product expansion (A-entry-major SpGEMM streams).

Covers the host router (run -> piece descriptors), the XLA reference
path, and the Pallas kernel (interpret mode on the forced-CPU backend).
Role analog: the expansion loop of the reference hash numeric kernel
(cuda-c/src/kernel/kernel_spgemm_hash_template.cu:769-815).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import nsparse_tpu.ops.kernels.flat_gather as fg
import nsparse_tpu.ops.kernels.piecewise as pw


def _random_runs(rng, n_runs, nnz_a, nnz_b, seg_lo=1, seg_hi=400):
    lens = rng.integers(seg_lo, seg_hi, n_runs)
    run_start = np.concatenate([[0], np.cumsum(lens)[:-1]])
    n = int(lens.sum())
    run_boff = np.array(
        [rng.integers(0, max(nnz_b - ln, 1)) for ln in lens], dtype=np.int64
    )
    run_aidx = rng.integers(0, nnz_a, n_runs)
    return run_start, run_boff, run_aidx, lens, n


def _oracle(run_start, run_boff, run_aidx, lens, n, a_val, b_val):
    out = np.zeros(n, dtype=np.float64)
    for s, bo, ai, ln in zip(run_start, run_boff, run_aidx, lens):
        out[s : s + ln] = a_val[ai] * b_val[bo : bo + ln]
    return out


@pytest.mark.parametrize("force_pallas", [False, True])
def test_piecewise_expand_random(force_pallas, monkeypatch):
    monkeypatch.setattr(fg, "FORCE_PALLAS", force_pallas)
    rng = np.random.default_rng(0)
    nnz_a, nnz_b = 1000, 5000
    run_start, run_boff, run_aidx, lens, n = _random_runs(rng, 700, nnz_a, nnz_b)
    plan = pw.build_piecewise_plan(
        run_start, run_boff, run_aidx, n, nnz_a, nnz_b
    )
    a_val = rng.standard_normal(nnz_a).astype(np.float32)
    b_val = rng.standard_normal(nnz_b).astype(np.float32)
    out = np.asarray(
        pw.piecewise_expand(plan, jnp.asarray(a_val), jnp.asarray(b_val))
    )
    ref = _oracle(run_start, run_boff, run_aidx, lens, n, a_val, b_val)
    np.testing.assert_allclose(out[:n], ref, rtol=1e-6)
    np.testing.assert_array_equal(out[n:], 0.0)


@pytest.mark.parametrize("force_pallas", [False, True])
def test_piecewise_short_runs_fallback(force_pallas, monkeypatch):
    # run-dense tiles (seg length 1-4) must route to the fallback or the
    # J=128 class and still be exact
    monkeypatch.setattr(fg, "FORCE_PALLAS", force_pallas)
    rng = np.random.default_rng(1)
    nnz_a, nnz_b = 300, 2000
    run_start, run_boff, run_aidx, lens, n = _random_runs(
        rng, 4000, nnz_a, nnz_b, seg_lo=1, seg_hi=5
    )
    plan = pw.build_piecewise_plan(
        run_start, run_boff, run_aidx, n, nnz_a, nnz_b
    )
    fr = plan.class_fracs
    assert fr["pw128"] + fr["fallback"] > 0, fr
    a_val = rng.standard_normal(nnz_a).astype(np.float32)
    b_val = rng.standard_normal(nnz_b).astype(np.float32)
    out = np.asarray(
        pw.piecewise_expand(plan, jnp.asarray(a_val), jnp.asarray(b_val))
    )
    ref = _oracle(run_start, run_boff, run_aidx, lens, n, a_val, b_val)
    np.testing.assert_allclose(out[:n], ref, rtol=1e-6)


def test_piecewise_f64_reference():
    # f64 stays on the XLA reference path and keeps full precision
    rng = np.random.default_rng(2)
    nnz_a, nnz_b = 50, 400
    run_start, run_boff, run_aidx, lens, n = _random_runs(
        rng, 40, nnz_a, nnz_b, seg_lo=3, seg_hi=60
    )
    plan = pw.build_piecewise_plan(
        run_start, run_boff, run_aidx, n, nnz_a, nnz_b
    )
    a_val = rng.standard_normal(nnz_a)
    b_val = rng.standard_normal(nnz_b)
    out = np.asarray(
        pw.piecewise_expand(plan, jnp.asarray(a_val), jnp.asarray(b_val))
    )
    ref = _oracle(run_start, run_boff, run_aidx, lens, n, a_val, b_val)
    np.testing.assert_allclose(out[:n], ref, rtol=1e-12)


@pytest.mark.parametrize("force_pallas", [False, True])
def test_piecewise_aligned_bank(force_pallas, monkeypatch):
    # 8-aligned run/table mode: pieces via the pre-rolled bank
    monkeypatch.setattr(fg, "FORCE_PALLAS", force_pallas)
    rng = np.random.default_rng(3)
    nnz_a = 200
    rows = 40
    deg = rng.integers(1, 60, rows)
    rpt = np.concatenate([[0], np.cumsum(deg)])
    nnz_b = int(rpt[-1])
    deg8 = -(-deg // 8) * 8
    rpt8 = np.concatenate([[0], np.cumsum(deg8)])
    b8_len = int(rpt8[-1])
    row_of = np.repeat(np.arange(rows), deg8)
    off_in = np.arange(b8_len) - rpt8[row_of]
    b8_idx = np.where(off_in < deg[row_of], rpt[row_of] + off_in, -1)

    cols = rng.integers(0, rows, nnz_a)
    seg8 = deg8[cols]
    run_start = np.concatenate([[0], np.cumsum(seg8)[:-1]])
    n = int(seg8.sum())
    run_boff = rpt8[cols]
    run_aidx = rng.integers(0, nnz_a, nnz_a)
    plan = pw.build_piecewise_plan(
        run_start, run_boff, run_aidx, n, nnz_a, b8_len, b8_idx=b8_idx
    )
    assert plan.aligned
    a_val = rng.standard_normal(nnz_a).astype(np.float32)
    b_val = rng.standard_normal(nnz_b).astype(np.float32)
    out = np.asarray(
        pw.piecewise_expand(plan, jnp.asarray(a_val), jnp.asarray(b_val))
    )
    # oracle: run e copies row cols[e] (padded with zeros to deg8)
    ref = np.zeros(n)
    for e in range(nnz_a):
        r = cols[e]
        s = run_start[e]
        ref[s : s + deg[r]] = a_val[run_aidx[e]] * b_val[rpt[r] : rpt[r + 1]]
    np.testing.assert_allclose(out[:n], ref, rtol=1e-6)
