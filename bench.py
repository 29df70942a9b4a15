"""Driver benchmark: one JSON line on stdout (the LAST line wins).

Headline: the general (skewed R-MAT) SpGEMM C=A^2 numeric phase — the
reference's flagship workload (hash SpGEMM,
``cuda-c/src/kernel/kernel_spgemm_hash_template.cu``).  Extras: the MXU
block path on an FEM-class matrix, tuner-selected SpMV on a banded stencil
and on an irregular graph, a committed real-structure matrix, and the
XLA/BCOO vendor-role baselines.

Robustness contract (round-3 fix for the r02 timeout): the current result
state is printed as a JSON line *after every completed stage*, so whatever
the driver's parser reads last is always a valid, maximally-enriched line —
even if the process is later killed.  A SIGTERM/SIGINT handler flushes the
state one final time (GNU timeout sends TERM first).  The soft deadline is
budgeted from *process start*, handshake included: tunnel weather eats the
budget visibly instead of blowing through the driver's hard timeout.
(Reference harness analog: ``spmv_amb.cu:46-64`` always prints its result.)

All kernel timings use the marginal chained method
(``utils.timing.time_marginal``): on the tunnel-attached chip a blocked
sync costs 30-55 ms and pipelined dispatch ~1.2-4 ms, so absolute
small-kernel timings are meaningless; the marginal cost of one more
chained iteration is the honest device time.  Sub-ms kernels escalate the
iteration spread (up to 16->512) until the marginal difference resolves;
a measurement that still underflows is flagged ``*_suspect`` rather than
silently floored (the r02 DIA "154% of roofline" artifact).

Every check records ok=true/false; checks skipped on the soft deadline are
recorded as skipped and excluded from rc — a deadline-starved run must not
read as a pass.  vs_baseline = headline GFLOPS / (0.70 * HBM roofline),
the BASELINE.md target (>=70% of roofline) scoring 1.0.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

# jax 0.9 Mosaic lowering recurses deeply (finite) through its
# convert-element-type fallback on this backend's forward-compat gates;
# the default 1000 frames abort otherwise-valid kernels.
sys.setrecursionlimit(50000)

T0 = time.time()  # process start: the deadline includes the handshake
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1000"))

STATE = {
    "metric": "spgemm_numeric_gflops",
    "value": 0.0,
    "unit": "GFLOPS",
    "vs_baseline": 0.0,
    "status": "starting",
}
OKS = {}


def log(msg):
    print(f"[bench +{time.time() - T0:.0f}s] {msg}", file=sys.stderr, flush=True)


def emit(status=None):
    """Print the current state as a JSON line; the driver parses the last
    stdout line, so progressive emission survives any later kill."""
    if status is not None:
        STATE["status"] = status
    print(json.dumps(STATE), flush=True)


def _flush_and_exit(signum, frame):
    del frame
    STATE["killed_by_signal"] = int(signum)
    emit(status="killed")
    os._exit(1)


signal.signal(signal.SIGTERM, _flush_and_exit)
signal.signal(signal.SIGINT, _flush_and_exit)


def over_budget(reserve: float = 0.0) -> bool:
    return time.time() - T0 > DEADLINE_S - reserve


def main():
    import dataclasses as _dc

    import numpy as np
    import jax

    # Persistent compilation cache (verified working on the tunneled
    # backend): repeated kernel shapes across stages/runs skip the 20-40 s
    # remote compile, buying deadline budget for more stages.
    try:
        cache_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jaxcache"
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # never let cache wiring kill the bench
        log(f"compilation cache unavailable: {e}")

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
    STATE.update(device=jax.devices()[0].device_kind, chip=spec.name)

    # Pay the one-time device->host handshake up front (minutes on the
    # tunnel-attached chip); every later pull is then fast.
    log("handshake: first device->host pull")
    float(jnp.sum(jnp.zeros(8)))
    # also warm host->device: the first large push crawls at ~7 MB/s vs
    # ~50 MB/s steady state, and the ESC plan ships tens of MB of routing
    jnp.asarray(np.zeros(1 << 24, np.int32)).block_until_ready()
    STATE["handshake_s"] = round(time.time() - T0, 1)
    log(f"handshake done in {STATE['handshake_s']}s "
        f"({DEADLINE_S - (time.time() - T0):.0f}s budget left)")
    emit(status="handshake_done")

    def measure(step, init, aux, ms_floor=0.0):
        """Marginal timing with an iteration spread adapted to the kernel:
        sub-ms kernels need a wide spread to resolve above the blocked-sync
        noise (~±2 ms).  ``ms_floor`` is the physical (roofline) lower
        bound: a reading below it escalates the spread, and if the widest
        spread STILL reads impossible the measurement is INVALID — returns
        (None, "exceeds_roofline") instead of shipping a >100%-of-roofline
        headline (the r4 banded-DIA 143% artifact).  Otherwise returns
        (ms, suspect) where suspect flags an unresolved underflow."""
        ms = 0.0
        for lo, hi in ((2, 10), (4, 64), (16, 512), (64, 1024)):
            ms = time_marginal(step, init, lo, hi, aux=aux)
            if ms * (hi - lo) > 40.0 and ms >= ms_floor:
                break  # spread resolved >> sync noise, and plausible
        if ms < ms_floor:
            return None, "exceeds_roofline"
        suspect = ms < 2e-3  # < 1 us: below any plausible dispatch floor
        return max(ms, 2e-3), suspect

    def record_time(prefix, ms, suspect, gf=None, roof=None):
        """ms=None (roofline-invalidated) records null + a failed ok."""
        if ms is None:
            STATE[f"{prefix}_ms"] = None
            STATE[f"{prefix}_suspect"] = True
            STATE[f"{prefix}_suspect_reason"] = (
                suspect if isinstance(suspect, str) else "invalid"
            )
            OKS[prefix] = False
            STATE[f"{prefix}_ok"] = False
            return
        STATE[f"{prefix}_ms"] = round(ms, 4)
        if suspect:
            STATE[f"{prefix}_suspect"] = True
        if gf is not None:
            STATE[f"{prefix}_gflops"] = round(gf, 2)
        if roof is not None:
            frac = gf / roof
            STATE[f"{prefix}_roofline_frac"] = round(frac, 4)
            if frac > 1.0:  # belt-and-braces: measure() should prevent it
                STATE[f"{prefix}_suspect"] = True

    def ms_floor_for(flops, roof):
        """Physical time floor (ms) implied by the roofline GFLOPS."""
        return flops / (roof * 1e6)

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

    esc_roof = spgemm_roofline_gflops(
        g.nnz, g.nnz, plan.c_nnz, plan.n_products, val_bytes=4, spec=spec
    )
    ms_esc, susp = measure(
        _esc_step, jnp.zeros(4, dtype), (plan, g, g),
        ms_floor=ms_floor_for(plan.flops, esc_roof),
    )
    target = 0.70 * esc_roof
    esc_gf = gflops(plan.flops, ms_esc) if ms_esc else 0.0
    STATE.update(
        value=round(esc_gf, 2),
        vs_baseline=round(esc_gf / target, 3),
        spgemm_plan_s=round(plan_s, 1),
        spgemm_n_products=plan.n_products,
        spgemm_nnz_c=plan.c_nnz,
    )
    record_time("spgemm_numeric", ms_esc, susp, esc_gf, esc_roof)
    # the headline line lands NOW; the verify + extras enrich it afterwards
    emit(status="headline_measured")
    log(
        f"spgemm-esc: {ms_esc} ms -> {esc_gf:.2f} GFLOPS "
        f"({esc_gf / esc_roof:.1%} roofline); verifying on device"
    )
    ok_esc = check_spgemm_answer_device(
        fnum(plan, g, g), spgemm_oracle(g, g),
        abs_ref=spgemm_abs_oracle(g, g),
    )
    OKS["esc"] = bool(ok_esc)
    STATE["spgemm_ok"] = bool(ok_esc)
    emit(status="headline_done")
    log(f"spgemm-esc: ok={ok_esc}")

    # one-shot: symbolic ON DEVICE + numeric, per call — the reference's
    # timed model (symbolic inside every trial, spgemm_hash.cu:31-54).
    # First call pays XLA compiles; the second is the algorithmic cost.
    if over_budget(reserve=180):
        log("over budget: skipping the one-shot spgemm extra")
        STATE["oneshot_skipped"] = True
    else:
        from nsparse_tpu.ops.spgemm import spgemm as _spgemm_oneshot

        log("spgemm-oneshot: compiling device-plan path")
        c1 = _spgemm_oneshot(g, g)
        jax.block_until_ready(c1.val)
        t0 = time.time()
        c2 = _spgemm_oneshot(g, g)
        jax.block_until_ready(c2.val)
        one_s = time.time() - t0
        STATE["spgemm_oneshot_s"] = round(one_s, 3)
        ok1 = check_spgemm_answer_device(
            c2, spgemm_oracle(g, g), abs_ref=spgemm_abs_oracle(g, g)
        )
        STATE["spgemm_oneshot_ok"] = bool(ok1)
        emit(status="oneshot_done")
        log(f"spgemm-oneshot: {one_s:.3f} s end-to-end ok={ok1}")

    # --- headline per-stage breakdown (VERDICT r4 weak #1: one scalar
    # hid where the 8.14 ms went).  Aggregates: bank+apv delivery, the
    # fused per-class kernels chained, the fallback side channel, and the
    # merge run-copy.  Each is a plain marginal timing over the SAME plan
    # the headline ran. ---------------------------------------------------
    w_hl = getattr(plan, "win", None)
    if over_budget(reserve=400):
        log("over budget: skipping the spgemm stage breakdown")
        STATE["spgemm_stage_skipped"] = True
    elif w_hl is not None and w_hl.fused_expand:
        from nsparse_tpu.ops.kernels.piecewise import (
            build_bank as _bb, piecewise_expand as _pwx,
        )
        from nsparse_tpu.ops.kernels.runcopy import runcopy as _rc
        from nsparse_tpu.ops.kernels.shuffle_pallas import (
            planned_shuffle as _psh,
        )
        from nsparse_tpu.ops.kernels.window_fused import (
            fused_class_apply as _fca,
        )
        from nsparse_tpu.ops.spgemm import slab_class_reduce as _scr
        from nsparse_tpu.ops.spgemm_window import apv_values as _apv

        stage_ms = {}

        def _st_delivery(c, i, aux):
            wp, gv = aux
            bank = _bb(wp.b8_gp, wp.bank_rows, gv + c[0])
            return c + bank[0, :2] + _apv(wp, gv + c[0])[:2]

        def _st_classes(c, i, aux):
            wp, bank, apv = aux
            acc = c
            for fp in wp.fused:
                acc = acc + _fca(
                    fp, bank=bank + c[0], apv=apv[fp.apv_lo:fp.apv_hi]
                )[:2]
            return acc

        def _st_fallback(c, i, aux):
            wp, pw, bank, gv = aux
            prod = _pwx(pw, gv + c[0], gv, bank=bank)
            fb_in = prod[wp.fb_off : wp.fb_off + wp.fb_len]
            fb_res = _scr(
                _psh(wp.fb_shuffle, fb_in), wp.fb_levels, wp.fb_lvl_idx
            )
            fb_seg = int(wp.merge.n_src) - wp.n_compact
            fb_res = jnp.pad(
                fb_res, (0, max(fb_seg - int(fb_res.shape[0]), 0))
            )
            return c + _psh(wp.fb_perm, fb_res)[:2]

        def _st_merge(c, i, aux):
            wp, res0 = aux
            return c + _rc(wp.merge, res0 + c[0])[:2]

        try:
            bank_hl = _bb(w_hl.b8_gp, w_hl.bank_rows, g.val)
            apv_hl = _apv(w_hl, g.val)
            jax.block_until_ready((bank_hl, apv_hl))
            z2 = jnp.zeros(2, dtype)
            ms_d, _ = measure(_st_delivery, z2, (w_hl, g.val))
            stage_ms["delivery"] = round(ms_d, 4)
            ms_c, _ = measure(_st_classes, z2, (w_hl, bank_hl, apv_hl))
            stage_ms["classes"] = round(ms_c, 4)
            if w_hl.fb_shuffle is not None and not over_budget(reserve=300):
                ms_f, _ = measure(
                    _st_fallback, z2, (w_hl, plan.pw, bank_hl, g.val)
                )
                stage_ms["fallback"] = round(ms_f, 4)
            if not over_budget(reserve=280):
                res0 = jnp.zeros(int(w_hl.merge.n_src), dtype)
                ms_m, _ = measure(_st_merge, z2, (w_hl, res0))
                stage_ms["merge"] = round(ms_m, 4)
            STATE["spgemm_stage_ms"] = stage_ms
            emit(status="stage_breakdown_done")
            log(f"spgemm stage breakdown: {stage_ms}")
        except Exception as e:
            STATE["spgemm_stage_error"] = f"{type(e).__name__}: {e}"[:200]
            log(f"stage breakdown failed: {e}")

    # --- real-structure matrix (committed fixture; network egress is
    # unavailable here, so this stands in for the SuiteSparse harness
    # workload, reference README.md:30-37).  Runs EARLY: r2/r3 placed it
    # last and it was budget-starved both times.  Its SpGEMM plan loads
    # from the committed cache (data/plancache, built with
    # NSPARSE_PLAN_TARGET=tpu) so the cost here is a file read. ---------
    if over_budget(reserve=90):
        log("over budget: skipping the real-matrix extra")
        STATE["real_skipped"] = True
    else:
        from nsparse_tpu.io.matrix_market import read_mtx
        from nsparse_tpu.ops.spmv import spmv as _spmv_real
        from nsparse_tpu.tune.spgemm_cache import spgemm_plan_cached

        _root = os.path.dirname(os.path.abspath(__file__))
        path = os.path.join(_root, "data", "circuit_zipf.mtx")
        ar = read_mtx(path, dtype=dtype)
        STATE["real_matrix"] = "circuit_zipf"
        log(f"real: {os.path.basename(path)} M={ar.shape[0]} nnz={ar.nnz}")
        xr = jnp.asarray(
            np.random.default_rng(1).standard_normal(ar.shape[1]),
            dtype=dtype,
        )
        ms_r, susp = measure(
            lambda c, i, f: _spmv_real(f, c) * 0.124, xr, ar
        )
        gf_r = gflops(2.0 * ar.nnz, ms_r)
        ok_r, _ = ans_check_device(
            jax.jit(_spmv_real)(ar, xr), spmv_oracle(ar, xr), dtype=dtype,
            scale=spmv_abs_oracle(ar, xr),
        )
        OKS["real_spmv"] = bool(ok_r)
        record_time("real_spmv", ms_r, susp, gf_r)
        STATE["real_spmv_ok"] = bool(ok_r)
        emit(status="real_spmv_done")
        # real-matrix SpGEMM A@A through the ESC path (cached routed plan)
        t_rp = time.time()
        rplan, rhit = spgemm_plan_cached(
            ar, ar, os.path.join(_root, "data", "plancache")
        )
        STATE["real_plan_s"] = round(time.time() - t_rp, 1)
        STATE["real_plan_cache_hit"] = bool(rhit)
        ms_rg, susp_rg = measure(_esc_step, jnp.zeros(4, dtype),
                                 (rplan, ar, ar))
        gf_rg = gflops(rplan.flops, ms_rg)
        record_time("real_spgemm", ms_rg, susp_rg, gf_rg)
        cg = jax.jit(spgemm_numeric)(rplan, ar, ar)
        ok_rg = check_spgemm_answer_device(
            cg, spgemm_oracle(ar, ar), abs_ref=spgemm_abs_oracle(ar, ar)
        )
        OKS["real_spgemm"] = bool(ok_rg)
        STATE["real_spgemm_ok"] = bool(ok_rg)
        STATE["real_spgemm_nnz_c"] = rplan.c_nnz
        emit(status="real_done")
        log(f"real: spmv {ms_r:.3f} ms ok={ok_r}; "
            f"spgemm {ms_rg:.3f} ms ok={ok_rg}")

    # --- SpMV: tuner-selected formats + XLA baseline ----------------------
    from nsparse_tpu.tune.plan import Plan

    # trimmed candidate lists: remote-compiler time is ~30-60 s per
    # candidate; the full sweep is for offline tuning.  Shape-informed
    # pre-trim (banded -> DIA-leaning, power-law -> x-shuffle ELL).
    # stage priority (r4 starved irregular/fem/f64 behind banded): the
    # never-yet-driver-measured stages run FIRST; banded (measured r3)
    # runs last with the leftover budget.
    spmv_case_defs = {
        "banded": (lambda: stencil_csr(512, 512, dtype=dtype), [
            Plan(format="dia"),
            Plan(format="ell", min_width=8, max_slabs=8, sigma=0),
            Plan(format="csr"),
        ]),
        "irregular": (
            lambda: rmat_csr(16, edge_factor=16, dtype=dtype, seed=2), [
                # cheapest-to-build first: the deadline-aware tuner then
                # always lands SOME measured format, and reaches for the
                # routed x-shuffle only with budget left.  Geometry from
                # the r4 on-chip sweep (.exp job_211): fine width bins +
                # SELL row splitting cut padding 6.97x -> 1.41x and time
                # 7.6 -> 1.88 ms; plain (non-xsh) won there.
                Plan(format="ell", min_width=2, max_slabs=10, sigma=1024),
                Plan(format="csr"),
                Plan(format="ell", min_width=2, max_slabs=10, sigma=1024,
                     xshuffle=True),
            ]),
    }

    def run_spmv_case(name, reserve):
        make_a, cands = spmv_case_defs[name]
        if over_budget(reserve=reserve):
            log(f"over budget: skipping the spmv-{name} extra")
            STATE[f"spmv_{name}_skipped"] = True
            return
        a = make_a()
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(a.shape[1]),
            dtype=dtype,
        )
        log(f"spmv-{name}: M={a.shape[0]} nnz={a.nnz}, autotuning")
        # hand the tuner the remaining soft budget (minus measurement
        # reserve): a candidate sweep must not run the process into the
        # driver's hard kill (the r02 irregular extra died mid-autotune)
        fmt, pl = autotune_spmv(
            a, x, trials=6, candidates=cands,
            deadline=T0 + DEADLINE_S - 80.0,
        )
        # audit trail: measured vs deadline-dropped candidates (the r3
        # irregular number could not distinguish a tuner starve from a
        # measured loss)
        from nsparse_tpu.tune.autotune import SWEEP as _sweep

        STATE[f"spmv_{name}_sweep"] = list(_sweep)
        padded = getattr(fmt, "padded_nnz", a.nnz)
        # DIA stores per-band offsets, not per-element column indices:
        # charging 4 idx bytes/slot overstated its traffic ~1.7x and made
        # an honest 0.012 ms measurement print as ">100% of roofline"
        idxb = 0 if pl.format == "dia" else 4
        roof = spmv_roofline_gflops(
            a.nnz, *a.shape, val_bytes=4, idx_bytes=idxb,
            padded_nnz=padded, spec=spec,
        )
        ms, susp = measure(
            lambda c, i, f: spmv(f, c) * 0.124, x, fmt,
            ms_floor=ms_floor_for(2.0 * a.nnz, roof),
        )
        gf = gflops(2.0 * a.nnz, ms) if ms else 0.0
        ok, _ = ans_check_device(
            jax.jit(spmv)(fmt, x), spmv_oracle(a, x), dtype=dtype,
            scale=spmv_abs_oracle(a, x),
        )
        OKS[f"spmv_{name}"] = bool(ok)
        STATE[f"spmv_{name}_format"] = pl.format
        record_time(f"spmv_{name}", ms, susp, gf, roof)
        if ms is not None:
            STATE[f"spmv_{name}_ok"] = bool(ok)
        emit(status=f"spmv_{name}_measured")
        # vendor-role baseline: jax BCOO matvec (XLA gather/scatter)
        from jax.experimental import sparse as jsparse

        ab = jsparse.BCOO.from_scipy_sparse(a.to_scipy()).sort_indices()
        ms_xla, _ = measure(lambda c, i, m: (m @ c) * 0.124, x, ab)
        STATE[f"spmv_{name}_xla_ms"] = round(ms_xla, 4)
        if ms:
            STATE[f"spmv_{name}_vs_xla"] = round(ms_xla / ms, 2)
        emit(status=f"spmv_{name}_done")
        log(
            f"spmv-{name}: [{pl.format}] {ms} ms -> {gf:.1f} GFLOPS "
            f"({gf / roof:.0%} roofline) ok={ok}"
        )

    run_spmv_case("irregular", reserve=100)

    # --- MXU block path on an FEM-class matrix ----------------------------
    if over_budget(reserve=120):
        log("over budget: skipping the FEM/MXU extra")
        STATE["fem_skipped"] = True
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

        ms_fem, susp = measure(_bsr_step, fblk(bplan), bplan)
        fem_gf = gflops(bplan.flops, ms_fem)
        record_time("fem_spgemm", ms_fem, susp, fem_gf)
        STATE["fem_block_pairs"] = bplan.n_pairs
        STATE["fem_mxu_tflops"] = round(
            2 * bplan.n_pairs * bplan.bs**3 / (ms_fem * 1e-3) / 1e12, 2
        )
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
        OKS["fem"] = bool(ok_fem)
        STATE["fem_ok"] = bool(ok_fem)
        emit(status="fem_done")
        log(
            f"spgemm-bsr: {fem_gf:.1f} useful GFLOPS "
            f"({STATE['fem_mxu_tflops']} TFLOPS on the MXU) ok={ok_fem}"
        )

    # --- fp64 numeric (the reference's default build is double,
    # nsparse.h:3-11).  The slab route carries f64 through the movement
    # kernels as two uint32 bit planes (ops/kernels/planes.py); products
    # and reductions run in XLA f64. -------------------------------------
    if over_budget(reserve=100):
        log("over budget: skipping the fp64 extra")
        STATE["f64_skipped"] = True
    else:
        jax.config.update("jax_enable_x64", True)
        g64 = rmat_csr(12, edge_factor=8, dtype=np.float64, seed=5)
        log(f"spgemm-f64: planning M={g64.shape[0]} nnz={g64.nnz}")
        t_p64 = time.time()
        plan64 = spgemm_plan(g64, g64)  # layout='global' auto for f64
        STATE["f64_plan_s"] = round(time.time() - t_p64, 1)
        roof64 = spgemm_roofline_gflops(
            g64.nnz, g64.nnz, plan64.c_nnz, plan64.n_products,
            val_bytes=8, spec=spec,
        )
        ms64, susp64 = measure(
            _esc_step, jnp.zeros(4, jnp.float64), (plan64, g64, g64),
            ms_floor=ms_floor_for(plan64.flops, roof64),
        )
        gf64 = gflops(plan64.flops, ms64) if ms64 else 0.0
        record_time("spgemm_f64", ms64, susp64, gf64, roof64)
        c64 = jax.jit(spgemm_numeric)(plan64, g64, g64)
        ok64 = check_spgemm_answer_device(
            c64, spgemm_oracle(g64, g64),
            abs_ref=spgemm_abs_oracle(g64, g64),
        )
        OKS["spgemm_f64"] = bool(ok64)
        if ms64 is not None:
            STATE["spgemm_f64_ok"] = bool(ok64)
        emit(status="f64_done")
        log(f"spgemm-f64: {ms64} ms -> {gf64:.2f} GFLOPS ok={ok64}")

    # banded SpMV last: already driver-measured in r3, so it gets the
    # leftover budget (r4 starved irregular/fem/f64 behind it)
    run_spmv_case("banded", reserve=60)

    emit(status="complete")
    return 0 if all(OKS.values()) else 1


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BaseException as e:  # always leave a valid last JSON line
        if isinstance(e, SystemExit):
            raise
        import traceback

        traceback.print_exc(file=sys.stderr)
        STATE["error"] = f"{type(e).__name__}: {e}"[:300]
        emit(status="error")
        sys.exit(1)
