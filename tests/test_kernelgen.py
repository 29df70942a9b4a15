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
