"""Driver benchmark: one JSON line on stdout.

Runs the two headline kernels on the real chip (SpMV on a banded stencil
matrix, SpGEMM C=A^2 numeric phase on a skewed R-MAT graph), verifies both
against scipy ON DEVICE (the oracle is uploaded; device->host transfers on
the tunnel-attached chip cost minutes for the first byte), and reports
SpGEMM GFLOPS as the primary metric with
vs_baseline = achieved / (0.70 * HBM roofline) — the BASELINE.md target
(>=70% of roofline) scores 1.0.
"""

from __future__ import annotations

import json
import sys
import time


def log(msg):
    print(f"[bench +{time.time() - T0:.0f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.time()
DEADLINE_S = float(__import__("os").environ.get("BENCH_DEADLINE_S", "480"))


def over_budget():
    return time.time() - T0 > DEADLINE_S


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from nsparse_tpu.formats.dia import DIA
    from nsparse_tpu.io.generate import fem_block_csr, rmat_csr, stencil_csr
    from nsparse_tpu.ops.spmv import spmv_dia
    from nsparse_tpu.ops.spgemm import spgemm_numeric, spgemm_plan
    from nsparse_tpu.ops.spgemm_bsr import plan_spgemm_bsr, spgemm_bsr_blocks
    from nsparse_tpu.utils.checking import (
        ans_check_device,
        check_spgemm_answer_device,
        spgemm_abs_oracle,
        spgemm_oracle,
        spmv_abs_oracle,
        spmv_oracle,
    )
    from nsparse_tpu.utils.roofline import (
        chip_specs,
        spgemm_roofline_gflops,
        spmv_roofline_gflops,
    )
    from nsparse_tpu.utils.timing import gflops, time_chained, time_fn

    dtype = np.float32
    spec = chip_specs()
    extras = {"device": jax.devices()[0].device_kind, "chip": spec.name}

    # Pay the one-time device->host handshake up front (minutes on the
    # tunnel-attached chip); every later pull is then fast.
    log("handshake: first device->host pull")
    float(jnp.sum(jnp.zeros(8)))
    log("handshake done")

    # --- SpGEMM C = A^2 on a block-clustered FEM-class matrix (MXU path) --
    fem = fem_block_csr(
        512, dof=16, neighbors=6, bandwidth=24, dtype=dtype, seed=3
    )
    log(f"spgemm-bsr: planning M={fem.shape[0]} nnz={fem.nnz}")
    bplan = plan_spgemm_bsr(fem, fem)
    fblk = jax.jit(spgemm_bsr_blocks)
    log(f"spgemm-bsr: {bplan.n_pairs} block pairs, compiling + chained trials")
    import dataclasses as _dc

    def _bsr_step(c, i):
        p = _dc.replace(bplan, a_blocks=bplan.a_blocks + c[0, 0, 0] * 0.0)
        return spgemm_bsr_blocks(p)

    ms3 = time_chained(_bsr_step, fblk(bplan), iters=20, reps=3)
    fem_gf = gflops(bplan.flops, ms3)
    fem_nnz_c = int((abs(fem.to_scipy()) @ abs(fem.to_scipy())).nnz)
    fem_roof = spgemm_roofline_gflops(
        fem.nnz, fem.nnz, fem_nnz_c, bplan.flops // 2,
        val_bytes=4, spec=spec,
    )
    # correctness of the headline path: dense C tiles vs scipy, on device
    log("spgemm-bsr: verifying on device")
    cb = fblk(bplan)
    ref_fem = spgemm_oracle(fem, fem)
    absf = spgemm_abs_oracle(fem, fem)
    bs = bplan.bs
    crow = np.asarray(bplan.c_block_row)
    ccol = np.asarray(bplan.c_block_col)
    ref_blocks = np.zeros((bplan.n_c_blocks, bs, bs), np.float64)
    scale_blocks = np.zeros_like(ref_blocks)
    refd = ref_fem.todense()
    absd = absf.todense()
    for t in range(bplan.n_c_blocks):
        r0, c0 = crow[t] * bs, ccol[t] * bs
        blk = refd[r0 : r0 + bs, c0 : c0 + bs]
        ref_blocks[t, : blk.shape[0], : blk.shape[1]] = blk
        sblk = absd[r0 : r0 + bs, c0 : c0 + bs]
        scale_blocks[t, : sblk.shape[0], : sblk.shape[1]] = sblk
    ok_fem, _ = ans_check_device(
        cb.reshape(-1), ref_blocks.reshape(-1), dtype=dtype,
        scale=scale_blocks.reshape(-1),
    )
    extras.update(
        fem_spgemm_gflops=round(fem_gf, 2),
        fem_spgemm_ms=round(ms3, 4),
        fem_block_pairs=bplan.n_pairs,
        fem_mxu_tflops=round(
            2 * bplan.n_pairs * bplan.bs**3 / (ms3 * 1e-3) / 1e12, 2
        ),
        fem_ok=bool(ok_fem),
    )
    log(f"spgemm-bsr: {fem_gf:.1f} useful GFLOPS "
        f"({extras['fem_mxu_tflops']} TFLOPS on the MXU)")

    # None = check skipped (deadline): recorded as "skipped" in the JSON and
    # excluded from rc — a deadline-starved run must not read as a pass.
    ok_spmv = ok_gemm = None
    if over_budget():
        log(f"over budget ({DEADLINE_S:.0f}s) after the headline metric; skipping extras")
        extras.update(spmv_skipped=True)
    else:
        # --- SpMV on a banded stencil (cant/pwtk structural class) ------------
        # The tuner picks DIA for this structural class (pure shifted FMAs, no
        # gather) — used directly here to keep the bench lean.
        a = stencil_csr(512, 512, dtype=dtype)
        dia = DIA.from_csr(a)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(a.shape[1]), dtype=dtype
        )
        f = jax.jit(spmv_dia)
        log(f"spmv: M={a.shape[0]} nnz={a.nnz}, compiling + chained trials")
        # chained in-jit iterations: stable and conservative (serialized
        # per-iteration latency).  Pipelined host dispatch can show ~7x less
        # per call but its overlap depends on runtime queue state.
        # 8 dependent SpMVs per loop body amortize the runtime's fixed
        # per-loop-iteration overhead (~0.2 ms on this runtime) without the
        # noise of subtracting a separately-measured baseline
        K = 8

        def _spmv_step(c, i):
            for _ in range(K):
                c = spmv_dia(dia, c) * 0.124
            return c

        ms = time_chained(_spmv_step, x, iters=12, reps=2) / K
        spmv_gf = gflops(2.0 * a.nnz, ms)
        spmv_roof = spmv_roofline_gflops(
            a.nnz, *a.shape, val_bytes=4, padded_nnz=dia.padded_nnz, spec=spec
        )
        ok_spmv, _ = ans_check_device(
            f(dia, x), spmv_oracle(a, x), dtype=dtype, scale=spmv_abs_oracle(a, x)
        )
        extras.update(
            spmv_gflops=round(spmv_gf, 2),
            spmv_ms=round(ms, 4),
            spmv_roofline_frac=round(spmv_gf / spmv_roof, 3),
            spmv_ok=bool(ok_spmv),
        )
        log(f"spmv: {spmv_gf:.1f} GFLOPS ({spmv_gf / spmv_roof:.0%} roofline) ok={ok_spmv}")


    if over_budget():
        if "spmv_skipped" not in extras:
            log("over budget; skipping the general-SpGEMM extra")
        extras.update(spgemm_skipped=True)
    else:
        # --- SpGEMM C = A^2 on a skewed graph ---------------------------------
        g = rmat_csr(14, edge_factor=8, dtype=dtype, seed=1)
        log(f"spgemm: planning M={g.shape[0]} nnz={g.nnz}")
        plan = spgemm_plan(g, g)
        fnum = jax.jit(spgemm_numeric)
        log(f"spgemm: P={plan.n_products} nnzC={plan.c_nnz}, compiling + 11 trials")
        ms2 = time_fn(lambda: fnum(plan, g, g), trials=11, warmup=1)
        # dispatch latency is negligible at this kernel size; keep plain trials
        spgemm_gf = gflops(plan.flops, ms2)
        spgemm_roof = spgemm_roofline_gflops(
            g.nnz, g.nnz, plan.c_nnz, plan.n_products, val_bytes=4, spec=spec
        )
        c = fnum(plan, g, g)
        log("spgemm: verifying on device")
        ok_gemm = check_spgemm_answer_device(
            c, spgemm_oracle(g, g), abs_ref=spgemm_abs_oracle(g, g)
        )
        extras.update(
            spgemm_gflops=round(spgemm_gf, 2),
            spgemm_numeric_ms=round(ms2, 4),
            spgemm_n_products=plan.n_products,
            spgemm_nnz_c=plan.c_nnz,
            spgemm_roofline_frac=round(spgemm_gf / spgemm_roof, 3),
            spgemm_ok=bool(ok_gemm),
        )
        log(f"spgemm: {spgemm_gf:.1f} GFLOPS ({spgemm_gf / spgemm_roof:.0%} roofline) ok={ok_gemm}")

    target = 0.70 * fem_roof
    out = {
        "metric": "spgemm_numeric_gflops",
        "value": round(fem_gf, 2),
        "unit": "GFLOPS",
        "vs_baseline": round(fem_gf / target, 3),
        **extras,
    }
    print(json.dumps(out))
    ran = [ok for ok in (ok_spmv, ok_gemm, ok_fem) if ok is not None]
    return 0 if all(ran) else 1


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as e:  # always emit the one JSON line
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "spgemm_numeric_gflops",
                    "value": 0.0,
                    "unit": "GFLOPS",
                    "vs_baseline": 0.0,
                    "error": f"{type(e).__name__}: {e}"[:300],
                }
            )
        )
        sys.exit(1)
