"""Measure the v5e MXU's achievable f32 matmul throughput at each
precision level (default/bf16 1-pass, HIGH 3-pass, HIGHEST 6-pass).

These are the denominators of bench.py's dual-resource roofline
(VERDICT r2 #1): the flagship chain executes ~12.35 GFLOP of
precision-pinned matmuls per iteration, and "speed of light" for the
compute-bound stages is this measured peak, not the bf16 marketing
number.

Timing: slope between 1x and 3x in-jit fori_loop lengths, array carry
(every output element consumed — CLAUDE.md timing rules).
"""
import sys
import time

import numpy as np


ITERS = 20
REPS = 5


def timed(mk_loop, iters):
    import jax
    fn = jax.jit(mk_loop(iters))
    out = fn()
    float(out)  # force completion through the tunnel (scalar fetch only —
    # pulling the full (m, m) result through the ~2.6 GB/s tunnel takes
    # ~24 ms and swamps the measurement)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn()
        float(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    m = 4096
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m, m)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(m, m)).astype(np.float32))
    flops = 2.0 * m * m * m

    for prec in ("default", "high", "highest"):
        def mk_loop(iters, prec=prec):
            def run():
                def body(_, c):
                    # feed the full previous output back in: array carry,
                    # nothing dead-codes
                    y = jnp.matmul(a + c * 1e-30, b, precision=prec)
                    return y * 1e-30
                out = jax.lax.fori_loop(0, iters, body,
                                        jnp.zeros((m, m), jnp.float32))
                # The loop body consumes the FULL carry every iteration, so
                # a post-loop reduction cannot dead-code any body work; it
                # keeps the host fetch scalar.
                return jnp.sum(out)
            return run

        t1 = timed(mk_loop, ITERS)
        t3 = timed(mk_loop, 3 * ITERS)
        slope = (t3 - t1) / (2 * ITERS)
        tflops = flops / slope / 1e12
        print(f"{prec:8s}: {slope * 1e3:7.3f} ms/matmul "
              f"({m}^3x2 = {flops / 1e9:.1f} GFLOP) -> {tflops:7.1f} TFLOPS",
              flush=True)


if __name__ == "__main__":
    main()
