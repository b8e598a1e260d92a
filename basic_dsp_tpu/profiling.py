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

    ``fn`` should return an array.  DCE-proofing (CLAUDE.md timing rules,
    same discipline as ``bench_all.timed``): the loop carry is an ARRAY of
    the first argument's trailing shape that folds EVERY output element
    back in, and the carry perturbs the first input each iteration — a
    partial read (``out.ravel()[:1]``) lets XLA slice-propagate through
    matmul-only bodies and dead-code the work (a banded matmul "measured"
    0.005 ms vs an honest ~0.04), and an un-fed-back carry lets XLA hoist
    the loop-invariant body entirely.
    """
    x0 = args[0]
    n = int(x0.shape[-1]) if x0.ndim else 1

    @jax.jit
    def looped(*a):
        def fold(out):
            flat = jnp.abs(out.ravel()).astype(jnp.float32)
            rows = -(-flat.shape[0] // n)
            flat = jnp.pad(flat, (0, rows * n - flat.shape[0]))
            return jnp.sum(flat.reshape(rows, n), axis=0) * jnp.float32(1e-20)

        def step(_, carry):
            scale = (1.0 + carry * 1e-10).astype(a[0].real.dtype)
            out = fn(a[0] * scale, *a[1:])
            return fold(out)

        return jax.lax.fori_loop(0, iters, step,
                                 jnp.zeros((n,), jnp.float32))

    # Host fetch forces completion (block_until_ready is unreliable through
    # the axon tunnel).
    float(jnp.sum(looped(*args)))  # compile + warm
    t0 = time.perf_counter()
    float(jnp.sum(looped(*args)))
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
