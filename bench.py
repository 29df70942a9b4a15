"""Driver benchmark: one JSON line on stdout.

Runs the two headline kernels on the real chip (SpMV on a banded stencil
matrix, SpGEMM C=A^2 numeric phase on a skewed R-MAT graph), verifies both
against scipy, and reports SpGEMM GFLOPS as the primary metric with
vs_baseline = achieved / (0.70 * HBM roofline) — the BASELINE.md target
(>=70% of roofline) scores 1.0.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nsparse_tpu.formats.ell import ELL
    from nsparse_tpu.io.generate import rmat_csr, stencil_csr
    from nsparse_tpu.ops.spmv import spmv_ell
    from nsparse_tpu.ops.spgemm import spgemm_numeric, spgemm_plan
    from nsparse_tpu.utils.checking import ans_check, check_spgemm_answer, \
        spgemm_oracle, spmv_oracle
    from nsparse_tpu.utils.roofline import chip_specs, \
        spgemm_roofline_gflops, spmv_roofline_gflops
    from nsparse_tpu.utils.timing import gflops, time_fn

    dtype = np.float32
    spec = chip_specs()
    extras = {"device": jax.devices()[0].device_kind, "chip": spec.name}

    # --- SpMV on a banded stencil (cant/pwtk structural class) ------------
    a = stencil_csr(512, 512, dtype=dtype)
    ell = ELL.from_csr(a)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(a.shape[1]),
                    dtype=dtype)
    f = jax.jit(spmv_ell)
    ms = time_fn(lambda: f(ell, x), trials=21, warmup=1)
    spmv_gf = gflops(2.0 * a.nnz, ms)
    spmv_roof = spmv_roofline_gflops(a.nnz, *a.shape, val_bytes=4,
                                     padded_nnz=ell.padded_nnz, spec=spec)
    ok_spmv, _ = ans_check(np.asarray(f(ell, x)), spmv_oracle(a, x),
                           dtype=dtype)
    extras.update(
        spmv_gflops=round(spmv_gf, 2),
        spmv_ms=round(ms, 4),
        spmv_roofline_frac=round(spmv_gf / spmv_roof, 3),
        spmv_ok=bool(ok_spmv),
    )

    # --- SpGEMM C = A^2 on a skewed graph ---------------------------------
    g = rmat_csr(14, edge_factor=8, dtype=dtype, seed=1)
    plan = spgemm_plan(g, g)
    fnum = jax.jit(spgemm_numeric)
    ms2 = time_fn(lambda: fnum(plan, g, g), trials=11, warmup=1)
    spgemm_gf = gflops(plan.flops, ms2)
    spgemm_roof = spgemm_roofline_gflops(g.nnz, g.nnz, plan.c_nnz,
                                         plan.n_products, val_bytes=4,
                                         spec=spec)
    c = fnum(plan, g, g)
    ok_gemm = check_spgemm_answer(c, spgemm_oracle(g, g))
    extras.update(
        spgemm_gflops=round(spgemm_gf, 2),
        spgemm_numeric_ms=round(ms2, 4),
        spgemm_n_products=plan.n_products,
        spgemm_nnz_c=plan.c_nnz,
        spgemm_roofline_frac=round(spgemm_gf / spgemm_roof, 3),
        spgemm_ok=bool(ok_gemm),
    )

    target = 0.70 * spgemm_roof
    out = {
        "metric": "spgemm_numeric_gflops",
        "value": round(spgemm_gf, 2),
        "unit": "GFLOPS",
        "vs_baseline": round(spgemm_gf / target, 3),
        **extras,
    }
    print(json.dumps(out))
    return 0 if (ok_spmv and ok_gemm) else 1


if __name__ == "__main__":
    sys.exit(main())
