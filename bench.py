"""Driver benchmark: one JSON line on stdout.

Headline: the general (skewed R-MAT) SpGEMM C=A^2 numeric phase — the
reference's flagship workload (hash SpGEMM,
``cuda-c/src/kernel/kernel_spgemm_hash_template.cu``).  Extras: the MXU
block path on an FEM-class matrix, tuner-selected SpMV on a banded stencil
and on an irregular graph, and the XLA/BCOO vendor-role baselines.

All kernel timings use the marginal chained method
(``utils.timing.time_marginal``): on the tunnel-attached chip a blocked
sync costs 30-55 ms and pipelined dispatch ~1.2-4 ms, so absolute
small-kernel timings are meaningless; the marginal cost of one more
chained iteration is the honest device time.

Every check records ok=true/false; checks skipped on the soft deadline are
recorded as skipped and excluded from rc — a deadline-starved run must not
read as a pass.  vs_baseline = headline GFLOPS / (0.70 * HBM roofline),
the BASELINE.md target (>=70% of roofline) scoring 1.0.
"""

from __future__ import annotations

import json
import sys
import time


def log(msg):
    print(f"[bench +{time.time() - T0:.0f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.time()
DEADLINE_S = float(__import__("os").environ.get("BENCH_DEADLINE_S", "900"))


def over_budget():
    return time.time() - T0 > DEADLINE_S


def main():
    import dataclasses as _dc

    import numpy as np
    import jax
    import jax.numpy as jnp

    from nsparse_tpu.io.generate import fem_block_csr, rmat_csr, stencil_csr
    from nsparse_tpu.ops.spmv import spmv
    from nsparse_tpu.ops.spgemm import spgemm_numeric, spgemm_plan
    from nsparse_tpu.ops.spgemm_bsr import plan_spgemm_bsr, spgemm_bsr_blocks
    from nsparse_tpu.tune.autotune import autotune_spmv
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
    from nsparse_tpu.utils.timing import gflops, time_marginal

    dtype = np.float32
    spec = chip_specs()
    extras = {"device": jax.devices()[0].device_kind, "chip": spec.name}
    oks = {}

    # Pay the one-time device->host handshake up front (minutes on the
    # tunnel-attached chip); every later pull is then fast.  The soft
    # deadline clock starts AFTER it: the deadline bounds benchmark work,
    # and the handshake is tunnel weather (observed 10 s - 11 min) that
    # would otherwise silently skip every extra.
    global T0
    log("handshake: first device->host pull")
    float(jnp.sum(jnp.zeros(8)))
    log("handshake done; deadline clock starts now")
    T0 = time.time()

    def measure(step, init, aux):
        """Marginal timing with an iteration count adapted to the kernel:
        sub-ms kernels need a wide iteration spread to resolve above the
        blocked-sync noise (~±2 ms)."""
        ms = time_marginal(step, init, 2, 10, aux=aux)
        if ms < 1.5:
            ms = time_marginal(step, init, 4, 64, aux=aux)
        # noise can underflow the difference to ~0; floor at 10 us so the
        # derived GFLOPS stays finite (and obviously suspect)
        return max(ms, 1e-2)

    # --- HEADLINE: general SpGEMM C = A^2 on a skewed R-MAT graph ---------
    g = rmat_csr(14, edge_factor=8, dtype=dtype, seed=1)
    log(f"spgemm-esc: planning M={g.shape[0]} nnz={g.nnz}")
    t_plan = time.time()
    plan = spgemm_plan(g, g)
    plan_s = time.time() - t_plan
    fnum = jax.jit(spgemm_numeric)
    log(
        f"spgemm-esc: plan {plan_s:.1f}s  P={plan.n_products} "
        f"nnzC={plan.c_nnz}; compiling + marginal trials"
    )

    def _esc_step(c, i, a):
        p, ga, gb = a
        ga = _dc.replace(ga, val=ga.val * (1.0 + c[0] * 1e-30))
        return spgemm_numeric(p, ga, gb).val[:4]

    ms_esc = measure(_esc_step, jnp.zeros(4, dtype), (plan, g, g))
    esc_gf = gflops(plan.flops, ms_esc)
    esc_roof = spgemm_roofline_gflops(
        g.nnz, g.nnz, plan.c_nnz, plan.n_products, val_bytes=4, spec=spec
    )
    log("spgemm-esc: verifying on device")
    ok_esc = check_spgemm_answer_device(
        fnum(plan, g, g), spgemm_oracle(g, g),
        abs_ref=spgemm_abs_oracle(g, g),
    )
    oks["esc"] = bool(ok_esc)
    extras.update(
        spgemm_gflops=round(esc_gf, 2),
        spgemm_numeric_ms=round(ms_esc, 4),
        spgemm_plan_s=round(plan_s, 1),
        spgemm_n_products=plan.n_products,
        spgemm_nnz_c=plan.c_nnz,
        spgemm_roofline_frac=round(esc_gf / esc_roof, 4),
        spgemm_ok=bool(ok_esc),
    )
    log(
        f"spgemm-esc: {ms_esc:.2f} ms -> {esc_gf:.2f} GFLOPS "
        f"({esc_gf / esc_roof:.1%} roofline) ok={ok_esc}"
    )

    # --- MXU block path on an FEM-class matrix ----------------------------
    if over_budget():
        log("over budget: skipping the FEM/MXU extra")
        extras.update(fem_skipped=True)
    else:
        fem = fem_block_csr(
            512, dof=16, neighbors=6, bandwidth=24, dtype=dtype, seed=3
        )
        log(f"spgemm-bsr: planning M={fem.shape[0]} nnz={fem.nnz}")
        bplan = plan_spgemm_bsr(fem, fem)
        fblk = jax.jit(spgemm_bsr_blocks)

        def _bsr_step(c, i, p):
            p = _dc.replace(
                p, a_blocks=p.a_blocks * (1.0 + c[0, 0, 0] * 1e-30)
            )
            return spgemm_bsr_blocks(p)

        ms_fem = measure(_bsr_step, fblk(bplan), bplan)
        fem_gf = gflops(bplan.flops, ms_fem)
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
        oks["fem"] = bool(ok_fem)
        extras.update(
            fem_spgemm_gflops=round(fem_gf, 2),
            fem_spgemm_ms=round(ms_fem, 4),
            fem_block_pairs=bplan.n_pairs,
            fem_mxu_tflops=round(
                2 * bplan.n_pairs * bplan.bs**3 / (ms_fem * 1e-3) / 1e12, 2
            ),
            fem_ok=bool(ok_fem),
        )
        log(
            f"spgemm-bsr: {fem_gf:.1f} useful GFLOPS "
            f"({extras['fem_mxu_tflops']} TFLOPS on the MXU) ok={ok_fem}"
        )

    # --- SpMV: tuner-selected formats + XLA baseline ----------------------
    if over_budget():
        log("over budget: skipping the SpMV extras")
        extras.update(spmv_skipped=True)
    else:
        for name, a in (
            ("banded", stencil_csr(512, 512, dtype=dtype)),
            ("irregular", rmat_csr(16, edge_factor=16, dtype=dtype, seed=2)),
        ):
            x = jnp.asarray(
                np.random.default_rng(0).standard_normal(a.shape[1]),
                dtype=dtype,
            )
            log(f"spmv-{name}: M={a.shape[0]} nnz={a.nnz}, autotuning")
            from nsparse_tpu.tune.plan import Plan

            # trimmed candidate list: remote-compiler time is ~30-60 s per
            # candidate, the full sweep is for offline tuning
            cands = [
                Plan(format="dia"),
                Plan(format="csr"),
                Plan(format="ell", min_width=8, max_slabs=8, sigma=1024),
                Plan(format="ell", min_width=8, max_slabs=8, sigma=0),
                Plan(format="ell", min_width=8, max_slabs=8, sigma=1024,
                     xshuffle=True),
                Plan(format="bsr", blocksize=(8, 128)),
            ]
            fmt, pl = autotune_spmv(a, x, trials=6, candidates=cands)
            ms = measure(lambda c, i, f: spmv(f, c) * 0.124, x, fmt)
            gf = gflops(2.0 * a.nnz, ms)
            padded = getattr(fmt, "padded_nnz", a.nnz)
            roof = spmv_roofline_gflops(
                a.nnz, *a.shape, val_bytes=4, padded_nnz=padded, spec=spec
            )
            ok, _ = ans_check_device(
                jax.jit(spmv)(fmt, x), spmv_oracle(a, x), dtype=dtype,
                scale=spmv_abs_oracle(a, x),
            )
            oks[f"spmv_{name}"] = bool(ok)
            # vendor-role baseline: jax BCOO matvec (XLA gather/scatter)
            from jax.experimental import sparse as jsparse

            ab = jsparse.BCOO.from_scipy_sparse(a.to_scipy()).sort_indices()
            ms_xla = measure(
                lambda c, i, m: (m @ c) * 0.124, x, ab
            )
            extras.update(
                {
                    f"spmv_{name}_format": pl.format,
                    f"spmv_{name}_gflops": round(gf, 2),
                    f"spmv_{name}_ms": round(ms, 4),
                    f"spmv_{name}_roofline_frac": round(gf / roof, 3),
                    f"spmv_{name}_ok": bool(ok),
                    f"spmv_{name}_xla_ms": round(ms_xla, 4),
                    f"spmv_{name}_vs_xla": round(ms_xla / ms, 2),
                }
            )
            log(
                f"spmv-{name}: [{pl.format}] {ms:.3f} ms -> {gf:.1f} GFLOPS "
                f"({gf / roof:.0%} roofline, {ms_xla / ms:.1f}x vs XLA) "
                f"ok={ok}"
            )

    target = 0.70 * esc_roof
    out = {
        "metric": "spgemm_numeric_gflops",
        "value": round(esc_gf, 2),
        "unit": "GFLOPS",
        "vs_baseline": round(esc_gf / target, 3),
        **extras,
    }
    print(json.dumps(out))
    return 0 if all(oks.values()) else 1


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
