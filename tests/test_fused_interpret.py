"""Interpret-mode coverage of the fused window kernel body.

Round-4 review: off-TPU plans short-circuit ``fused_class_apply`` to
``_fused_reference``, so the suite validated plan semantics but never the
~250-line ``kern_body``.  These tests force mask-routed plans
(``NSPARSE_PLAN_TARGET=tpu``) so the real Pallas kernel runs in interpret
mode on CPU, in both modes (v2 in-kernel expansion and v1 pre-expanded),
and with the ``NSPARSE_FUSED_PHASES`` debug gate exercised stage by
stage.
"""

import numpy as np
import pytest

from nsparse_tpu.io.generate import rmat_csr
from nsparse_tpu.utils.checking import (
    check_spgemm_answer,
    spgemm_abs_oracle,
    spgemm_oracle,
)


@pytest.fixture()
def tpu_target(monkeypatch):
    monkeypatch.setenv("NSPARSE_PLAN_TARGET", "tpu")


def _plan_and_matrix(scale=8, ef=4, seed=7):
    from nsparse_tpu.ops.spgemm import spgemm_plan

    a = rmat_csr(scale, edge_factor=ef, dtype=np.float32, seed=seed)
    plan = spgemm_plan(a, a, shuffle=True, layout="window")
    return a, plan


def test_fused_kernel_interpret_expand(tpu_target):
    """v2 mode: expansion + tier-1 Benes inside the kernel."""
    from nsparse_tpu.ops.spgemm import spgemm_numeric

    a, plan = _plan_and_matrix()
    w = plan.win
    assert w is not None and w.fused_expand, "expected fused-expand plan"
    # the masked plan must NOT carry reference indices: this is the
    # guarantee that the pallas kern_body (interpret mode) executed
    assert all(fp.ref_ext_idx is None for fp in w.fused)
    c = spgemm_numeric(plan, a, a)
    assert check_spgemm_answer(
        c, spgemm_oracle(a, a), verbose=True,
        abs_ref=spgemm_abs_oracle(a, a),
    )


def test_fused_kernel_interpret_preexpanded(tpu_target, monkeypatch):
    """v1 mode: piecewise expansion + tile Benes outside, fused
    folds/tiers/extraction/entry-order inside."""
    import nsparse_tpu.ops.spgemm_window as swin
    from nsparse_tpu.ops.spgemm import spgemm_numeric

    monkeypatch.setattr(swin, "FUSED_BANK_BUDGET", 0)
    a, plan = _plan_and_matrix(seed=11)
    w = plan.win
    assert w is not None and not w.fused_expand, "expected v1 plan"
    assert all(
        fp.ref_ext_idx is None and not fp.expand for fp in w.fused
    )
    c = spgemm_numeric(plan, a, a)
    assert check_spgemm_answer(
        c, spgemm_oracle(a, a), verbose=True,
        abs_ref=spgemm_abs_oracle(a, a),
    )


def test_fused_phases_gate(tpu_target, monkeypatch):
    """The NSPARSE_FUSED_PHASES debug gate: every stage prefix runs, the
    final stage equals the ungated kernel, and the gate is read at trace
    time (stage prefixes differ from the full run)."""
    import jax.numpy as jnp

    from nsparse_tpu.ops.kernels.piecewise import build_bank
    from nsparse_tpu.ops.kernels.window_fused import fused_class_apply
    from nsparse_tpu.ops.spgemm_window import apv_values

    a, plan = _plan_and_matrix(seed=13)
    w = plan.win
    fp = w.fused[0]
    bank = build_bank(w.b8_gp, w.bank_rows, a.val)
    if w.apv_shuffle is not None:
        apv = apv_values(w, a.val)
    else:
        from nsparse_tpu.ops.kernels.flat_gather import flat_gather

        apv = flat_gather(
            w.apv_gp, jnp.concatenate([a.val, jnp.zeros(1, a.val.dtype)])
        )
    apv = apv[fp.apv_lo : fp.apv_hi]

    outs = {}
    for ph in ("expand", "f0", "extract", "full"):
        monkeypatch.setenv("NSPARSE_FUSED_PHASES", ph)
        out = np.asarray(fused_class_apply(fp, bank=bank, apv=apv))
        assert out.shape == (fp.slots,)
        assert np.isfinite(out).all()
        outs[ph] = out
    monkeypatch.delenv("NSPARSE_FUSED_PHASES")
    full = np.asarray(fused_class_apply(fp, bank=bank, apv=apv))
    np.testing.assert_array_equal(outs["full"], full)
    # each successive stage must do SOMETHING on this geometry: a stage
    # prefix that already equals the full output means the gate is dead
    assert not np.array_equal(outs["expand"], full)
