"""Tracing / profiling helpers — the subsystem the reference lacks.

The reference times with paired cudaEvents and includes (but never uses)
``cuda_profiler_api.h`` (``spmv_amb.cu:11``, SURVEY.md section 5).  Here
profiling is first-class: a context manager around any region writes a
Perfetto/XProf trace viewable in xprof / tensorboard-profile, and
``profile_op`` wraps one operation with warmup + trace + timing.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


@contextlib.contextmanager
def trace(trace_dir: str):
    """Capture a device trace of the enclosed region into ``trace_dir``."""
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    try:
        yield trace_dir
    finally:
        jax.profiler.stop_trace()


def profile_op(fn, *args, trace_dir: str, warmup: int = 1, iters: int = 3):
    """Warm up, trace ``iters`` executions of ``fn(*args)``, return (result,
    avg_ms, trace_dir)."""
    out = None
    for _ in range(max(warmup, 1)):
        out = jax.block_until_ready(fn(*args))
    with trace(trace_dir):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        t1 = time.perf_counter()
    return out, (t1 - t0) * 1e3 / iters, trace_dir
