"""Row-localized window-arena SpGEMM numeric path
(ops/spgemm_window.py): per-window Benes + level pyramid + run-copy
extraction + fallback pool, vs the scipy oracle.

TPU analog of the reference's per-row shared-memory hash tables
(cuda-cpp/inc/HashSpGEMM.hpp:509-700) with FLOP binning driving execution
(kernel_spgemm_hash_template.cu:59-235)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import nsparse_tpu.ops.kernels.flat_gather as fg
from nsparse_tpu.formats.csr import CSR
from nsparse_tpu.io.generate import rmat_csr, stencil_csr
from nsparse_tpu.ops.spgemm import spgemm_numeric, spgemm_plan
from nsparse_tpu.utils.checking import (
    check_spgemm_answer,
    spgemm_abs_oracle,
    spgemm_oracle,
)


def _check_window(a, b, **plan_kwargs):
    plan = spgemm_plan(a, b, shuffle=True, layout="window", **plan_kwargs)
    assert plan.win is not None
    assert plan.slab_shuffle is None  # window path owns the numeric phase
    old = fg.FORCE_PALLAS
    fg.FORCE_PALLAS = True
    try:
        c = spgemm_numeric(plan, a, b)
    finally:
        fg.FORCE_PALLAS = old
    ref = spgemm_oracle(a, b)
    assert check_spgemm_answer(c, ref, verbose=True)
    rtol = 1e-10 if a.val.dtype == jnp.float64 else 2e-5
    np.testing.assert_allclose(
        np.asarray(c.to_scipy().data), ref.data, rtol=rtol, atol=1e-12
    )
    return plan


def test_window_path_rmat():
    """Skewed graph: windows across several width classes; deep entries
    reduce in-window through the radix-8 fold tiers (no global pool)."""
    a = rmat_csr(9, edge_factor=8, dtype=np.float64, seed=4)
    plan = _check_window(a, a)
    w = plan.win
    assert len(w.class_geom) >= 2  # multiple width classes in play
    assert any(len(t) for t in w.tiers)  # deep entries -> tier folds
    assert w.fb_shuffle is None  # no row outgrows the window ladder


def test_window_path_uniform_no_fallback_rows():
    """A banded stencil product: every row fits the smallest windows (no
    fallback ROWS); the 5-product center entries are level-3 singles
    whose totals land directly at F3[sigma]."""
    a = stencil_csr(28, 28, dtype=np.float64)
    plan = _check_window(a, a)
    assert plan.win.fb_len == 0  # no row fell back
    assert plan.win.fb_shuffle is None
    assert plan.win.n_compact > 0


def test_window_path_deep_tiers():
    """A dense block inside a sparse matrix: block entries have ~80
    products each (ceil(80/8) = 10 L3 partials), driving the radix-8
    recursion through tier 2 (10 > 8) into tier 3."""
    import scipy.sparse as sp

    rng = np.random.default_rng(7)
    m = 256
    d = 80
    dense = rng.standard_normal((d, d))
    bg = sp.random(m, m, density=0.01, random_state=3, format="lil")
    bg[:d, :d] = dense
    a = CSR.from_scipy(sp.csr_matrix(bg).astype(np.float64))
    plan = _check_window(a, a)
    w = plan.win
    assert any(len(t) >= 2 for t in w.tiers)  # tier-3 reached
    assert w.fb_shuffle is None


def test_window_path_tridiagonal_no_pool():
    """Tridiagonal squared: every entry has <= 3 products — no deep
    entries, no fallback rows, no pool at all."""
    import scipy.sparse as sp

    m = 512
    s = sp.diags(
        [np.ones(m - 1), 2 * np.ones(m), np.ones(m - 1)], [-1, 0, 1],
        format="csr",
    )
    a = CSR.from_scipy(s.astype(np.float64))
    plan = _check_window(a, a)
    assert plan.win.fb_shuffle is None
    assert plan.win.fb_len == 0


def test_window_path_fallback_heavy(monkeypatch):
    """Rows heavier than the largest window route through the global-Clos
    fallback pool (window ladder capped small to trigger it)."""
    import nsparse_tpu.ops.spgemm_window as wmod

    monkeypatch.setattr(wmod, "N_WIN_CLASSES", 2)  # max window = 1024
    rng = np.random.default_rng(11)
    m = 256
    rows, cols, vals = [], [], []
    for r in range(m):  # sparse background
        cc = rng.choice(m, size=4, replace=False)
        rows += [r] * 4
        cols += list(cc)
        vals += list(rng.standard_normal(4))
    for r in (3, 100):  # heavy rows: m columns each -> huge arena demand
        rows += [r] * m
        cols += list(range(m))
        vals += list(rng.standard_normal(m))
    import scipy.sparse as sp

    s = sp.csr_matrix(
        (np.asarray(vals), (np.asarray(rows), np.asarray(cols))),
        shape=(m, m),
    )
    s.sum_duplicates()
    a = CSR.from_scipy(s.astype(np.float64))
    plan = _check_window(a, a)
    assert plan.win.fb_len > 0  # heavy rows actually fell back


def test_window_value_rerun():
    """SpGEMM_Hash_Numeric contract: same plan, new values."""
    a = rmat_csr(8, edge_factor=8, dtype=np.float64, seed=2)
    plan = _check_window(a, a)
    rng = np.random.default_rng(5)
    v2 = jnp.asarray(
        rng.standard_normal(int(a.val.shape[0])), a.val.dtype
    )
    a2 = CSR(rpt=a.rpt, col=a.col, val=v2, shape=a.shape, nnz=a.nnz)
    old = fg.FORCE_PALLAS
    fg.FORCE_PALLAS = True
    try:
        c2 = spgemm_numeric(plan, a2, a2)
    finally:
        fg.FORCE_PALLAS = old
    assert check_spgemm_answer(c2, spgemm_oracle(a2, a2), verbose=True)


def test_window_plan_f32_jit():
    """f32 + jit end to end (the chip configuration)."""
    a = rmat_csr(8, edge_factor=6, dtype=np.float32, seed=9)
    plan = spgemm_plan(a, a, shuffle=True, layout="window")
    old = fg.FORCE_PALLAS
    fg.FORCE_PALLAS = True
    try:
        c = jax.jit(spgemm_numeric)(plan, a, a)
    finally:
        fg.FORCE_PALLAS = old
    # f32 reassociation on cancelling sums needs the |A||B| backward-error
    # scale (what the reference's sfDEBUG check tolerates too)
    assert check_spgemm_answer(
        c, spgemm_oracle(a, a), verbose=True,
        abs_ref=spgemm_abs_oracle(a, a),
    )


@pytest.mark.parametrize("expand", [True, False])
def test_fused_kernel_interpret(monkeypatch, expand):
    """Run the REAL fused Pallas kernel body (not the off-TPU reference)
    in interpret mode, both expansion modes, against scipy.

    Round-4 gap: off-TPU plans carried ``ref_ext_idx`` and the ~250-line
    ``kern_body`` only ever executed on the chip.  Forcing
    NSPARSE_PLAN_TARGET=tpu routes real masks off-TPU so plan changes
    that break the kernel fail here, not in a bench round."""
    monkeypatch.setenv("NSPARSE_PLAN_TARGET", "tpu")
    if not expand:
        # shrink the bank budget so the plan falls back to the
        # standalone piecewise expansion + explicit tier-1 Benes (v1)
        import nsparse_tpu.ops.spgemm_window as sw

        monkeypatch.setattr(sw, "FUSED_BANK_BUDGET", 0)
    rng = np.random.default_rng(11)
    a = rmat_csr(8, edge_factor=6, dtype=np.float32, seed=3)
    # positive values: phase sums compare without cancellation slack
    import dataclasses

    a = dataclasses.replace(
        a, val=jnp.asarray(rng.uniform(0.5, 1.5, a.nnz).astype(np.float32))
    )
    plan = spgemm_plan(a, a, shuffle=True, layout="window")
    w = plan.win
    assert w is not None
    assert w.fused_expand == expand
    assert all(fp.ref_ext_idx is None for fp in w.fused)
    c = spgemm_numeric(plan, a, a)
    ref = spgemm_oracle(a, a)
    assert check_spgemm_answer(c, ref, verbose=True)


def test_fused_kernel_phase_gates(monkeypatch):
    """NSPARSE_FUSED_PHASES gate, stage by stage: every prefix of the
    fused kernel conserves the window products' sum (expansion fills the
    arena, the Benes/extraction/entry stages permute, folds move totals
    across PYR levels the o_r view does not cover)."""
    monkeypatch.setenv("NSPARSE_PLAN_TARGET", "tpu")
    rng = np.random.default_rng(7)
    a = rmat_csr(8, edge_factor=6, dtype=np.float32, seed=3)
    import dataclasses

    a = dataclasses.replace(
        a, val=jnp.asarray(rng.uniform(0.5, 1.5, a.nnz).astype(np.float32))
    )
    plan = spgemm_plan(a, a, shuffle=True, layout="window")
    w = plan.win
    assert w is not None and w.fused_expand
    from nsparse_tpu.ops.kernels.piecewise import build_bank
    from nsparse_tpu.ops.kernels.window_fused import fused_class_apply
    from nsparse_tpu.ops.spgemm_window import apv_values

    bank = build_bank(w.b8_gp, w.bank_rows, a.val)
    apv = apv_values(w, a.val)
    for ci, fp in enumerate(w.fused):
        sums = {}
        for ph in ("expand", "f0", "folds", "tiers", "extract", "full"):
            monkeypatch.setenv("NSPARSE_FUSED_PHASES", ph)
            out = fused_class_apply(
                fp, bank=bank, apv=apv[fp.apv_lo : fp.apv_hi]
            )
            sums[ph] = float(jnp.sum(out.astype(jnp.float64)))
        ref = sums["expand"]
        assert ref > 0.0
        for ph, s in sums.items():
            np.testing.assert_allclose(
                s, ref, rtol=1e-5,
                err_msg=f"class {ci} phase {ph} lost mass",
            )
