"""Timing and profiling helpers — the observability subsystem.

The reference has only ``print_calibration`` and bench harnesses
(SURVEY.md §5); here we add a small per-op timing harness that is correct
under asynchronous dispatch (forces completion via host fetch — some TPU
runtimes do not reliably block in ``block_until_ready``), plus a thin wrapper
over the jax profiler for trace capture.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


def time_op(fn: Callable, *args, iters: int = 10) -> Dict[str, float]:
    """Times ``fn(*args)`` with compile excluded and completion forced.

    ``fn`` should return an array; iterations run back-to-back with the
    result folded into a scalar that is fetched to host.
    """
    @jax.jit
    def looped(*a):
        def step(_, carry):
            out = fn(*a)
            # Couple each iteration to the previous so the loop cannot be
            # hoisted (works for any output shape).
            return carry + jnp.sum(jnp.abs(out.ravel()[:1]))

        return jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))

    float(looped(*args))  # compile + warm
    t0 = time.perf_counter()
    float(looped(*args))
    total = time.perf_counter() - t0
    return {"total_s": total, "per_iter_s": total / iters}


def throughput(fn: Callable, samples: int, *args,
               iters: int = 10) -> Dict[str, float]:
    """Msamples/s for an op over ``samples``-element data."""
    t = time_op(fn, *args, iters=iters)
    t["msamples_per_s"] = samples / t["per_iter_s"] / 1e6
    return t


@contextlib.contextmanager
def trace(log_dir: str):
    """jax profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
