"""Benchmark timing harness.

Analog of the reference's cudaEvent timing loops (``spmv_amb.cu:46-58``,
``spgemm_hash.cu:40-49``): run ``trials`` iterations, discard ``warmup``,
report average milliseconds.  ``block_until_ready`` plays the role of
``cudaDeviceSynchronize``.  Matches the reference's trial counts by default
(TRI_NUM=101 with 1 warmup for SpMV; SPGEMM_TRI_NUM=11, ``nsparse.h:22-26``)
— callers pass smaller counts for quick runs.
"""

from __future__ import annotations

import time
from typing import Callable

import jax

SPMV_TRIALS = 101      # reference TRI_NUM (nsparse.h:22)
SPGEMM_TRIALS = 11     # reference SPGEMM_TRI_NUM (nsparse.h:26)


def time_fn(fn: Callable[[], object], trials: int = 10, warmup: int = 1) -> float:
    """Average wall ms per call over ``trials - warmup`` timed runs."""
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(trials - warmup):
        out = fn()
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    return (t1 - t0) * 1e3 / max(trials - warmup, 1)


def gflops(flops: float, ms: float) -> float:
    return flops / (max(ms, 1e-6) * 1e-3) / 1e9


def time_chained(step, init, iters: int = 20, reps: int = 3) -> float:
    """Average ms per iteration of ``carry = step(carry, i)`` chained inside
    one jitted ``fori_loop`` — excludes per-dispatch latency, which on a
    tunnel-attached chip (milliseconds) can dwarf small kernels.  ``step``
    must make the carry feed the next iteration so XLA cannot hoist it.
    """
    loop = jax.jit(
        lambda c: jax.lax.fori_loop(0, iters, lambda i, c: step(c, i), c)
    )
    c = jax.block_until_ready(loop(init))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        c = loop(c)
    jax.block_until_ready(c)
    t1 = time.perf_counter()
    return (t1 - t0) * 1e3 / (reps * iters)


def time_marginal(
    step, init, iters_lo: int = 2, iters_hi: int = 10, reps: int = 3,
    aux=None,
) -> float:
    """True device ms per iteration of ``carry = step(carry, i)``.

    Runs the step chained in a jitted ``fori_loop`` at two iteration
    counts and reports ``(T_hi - T_lo) / (iters_hi - iters_lo)`` — the
    marginal cost of one more iteration.  This cancels BOTH the
    per-dispatch latency AND the ``block_until_ready`` round-trip, which
    on a tunnel-attached chip costs tens of milliseconds and poisons any
    absolute small-kernel timing (``time_chained`` divides it across
    iterations and over-reports sub-ms kernels ~10-50x).  The carry must
    feed the next iteration so XLA cannot hoist work out of the loop;
    an ``optimization_barrier`` stops cross-iteration fusion.

    Role analog: the reference times kernels with cudaEvent around an
    N-trial loop (``spgemm_hash.cu:40-49``); on this runtime the loop must
    live on-device and the sync cost must difference out.

    Large structures the step reads (plans, formats) must go through
    ``aux``, not a Python closure: closed-over device arrays are inlined
    as literal constants at lowering, and a plan's mask arrays can blow
    the remote compiler's request-size limit (HTTP 413) at scale.
    With ``aux``, the step is called as ``step(c, i, aux)``.
    """

    def run(iters):
        if aux is None:
            def body(i, c):
                return jax.lax.optimization_barrier(step(c, i))

            loop = jax.jit(
                lambda c, n_=iters: jax.lax.fori_loop(0, n_, body, c)
            )
            args = lambda c: (c,)
        else:
            def body_a(a):
                def b(i, c):
                    return jax.lax.optimization_barrier(step(c, i, a))

                return b

            loop = jax.jit(
                lambda c, a, n_=iters: jax.lax.fori_loop(
                    0, n_, body_a(a), c
                )
            )
            args = lambda c: (c, aux)
        c = jax.block_until_ready(loop(*args(init)))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            c = jax.block_until_ready(loop(*args(c)))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = run(iters_lo)
    t_hi = run(iters_hi)
    return max((t_hi - t_lo), 0.0) * 1e3 / (iters_hi - iters_lo)
