"""Kernel-config generator tests (the reference's kernel-gen analog)."""

import os

import numpy as np

from nsparse_tpu.tune import kernelgen


def test_derive_all_chips():
    for chip in kernelgen.CHIP_PARAMS:
        cfg = kernelgen.derive(chip)
        kinds = [k for k, _ in cfg.gather_classes]
        assert "band" in kinds and "win" in kinds
        assert cfg.spgemm_bins == 7  # parity with the reference's BIN_NUM
        assert cfg.band_tile_rows % 8 == 0


def test_emit_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(
        kernelgen, "_gen_path", lambda chip: str(tmp_path / f"_g_{chip}.py")
    )
    path = kernelgen.emit("v5p")
    assert os.path.exists(path)
    ns = {}
    exec(open(path).read(), ns)
    cfg = kernelgen.KernelConfig(**ns["CONFIG"])
    assert cfg == kernelgen.derive("v5p")


def test_kernel_config_fallback():
    cfg = kernelgen.kernel_config("v4")
    assert cfg.chip == "v4"


def test_plan_uses_config(rng):
    from nsparse_tpu.ops.kernels.flat_gather import build_flat_gather_plan

    idx = rng.integers(0, 1000, 2048).astype(np.int32)
    plan = build_flat_gather_plan(idx)
    kinds = {k for k, _ in plan.classes}
    assert kinds == {"band", "win"}


def test_committed_configs_match_derivation():
    """The committed _generated_* modules must equal a fresh derivation —
    the reference commits its generated kernels and regenerates on param
    change (spgemm_hash_kernel_gen.c); drift here means someone edited
    the generated file or changed derive() without regenerating."""
    import importlib

    for chip in ("v5e", "v5p", "cpu"):
        mod = importlib.import_module(f"nsparse_tpu.tune._generated_{chip}")
        assert kernelgen.KernelConfig(**mod.CONFIG) == kernelgen.derive(chip)


def test_geometry_responds_to_chip_params(monkeypatch):
    """Changing a hardware parameter must change the derived geometry
    (the point of a generator vs hardcoded constants)."""
    params = dict(kernelgen.CHIP_PARAMS)
    vmem, lanes, sub, hbm, vpu, mhz = params["v5e"]
    params["half"] = (vmem // 2, lanes, sub, hbm, vpu, mhz)
    monkeypatch.setattr(kernelgen, "CHIP_PARAMS", params)
    base = kernelgen.derive("v5e")
    half = kernelgen.derive("half")
    assert half.n_win_classes < base.n_win_classes
    assert half.bank_rows_max < base.bank_rows_max
    assert half.runcopy_spans[1] < base.runcopy_spans[1]
    # fixed-class ladder loses its biggest-scratch member
    assert len(half.runcopy_fixed_classes) < len(base.runcopy_fixed_classes)


def test_modules_consume_generated_geometry():
    """The load-bearing kernel constants come from kernel_config, not
    hardcoded literals (VERDICT r3 item 3)."""
    cfg = kernelgen.kernel_config(kernelgen.plan_chip())
    from nsparse_tpu.ops.kernels import piecewise, runcopy
    from nsparse_tpu.ops import spgemm_window as sw

    assert runcopy.SPAN_LCM == cfg.runcopy_span_lcm
    assert runcopy.CLASS_LIST_FIXED == cfg.runcopy_fixed_classes
    assert (runcopy.CLASS_LIST[0][3], runcopy.CLASS_LIST[1][3]) == \
        cfg.runcopy_spans
    assert piecewise.J_CLASSES == cfg.pw_j_classes
    assert piecewise.BANK_K == cfg.bank_k
    assert piecewise.BANK_ROWS_MAX == cfg.bank_rows_max
    assert sw.WIN_MIN == cfg.win_min
    assert sw.N_WIN_CLASSES == cfg.n_win_classes


def test_plan_chip_env(monkeypatch):
    monkeypatch.setenv("NSPARSE_CHIP", "v5p")
    assert kernelgen.plan_chip() == "v5p"
    monkeypatch.delenv("NSPARSE_CHIP")
    monkeypatch.setenv("NSPARSE_PLAN_TARGET", "tpu")
    assert kernelgen.plan_chip() == "v5e"
