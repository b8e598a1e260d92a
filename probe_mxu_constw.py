"""Measured f32 precision="highest" MXU peak for CONSTANT-WEIGHT matmuls
(the chain/resampler shape class: tall runtime LHS @ compile-time-constant
RHS).  BENCH_ALL cfg4 measured ABOVE the 30.8-TFLOPS square-matmul peak
(vs_baseline 1.22), consistent with XLA precomputing the constant
operand's hi/lo bf16 split so "highest" costs fewer runtime passes.
This pins the correct denominator for the constant-weight floor models.
"""
import sys
import time

import numpy as np

ITERS = 100
REPS = 5


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    M, K, N = 1 << 17, 128, 1280  # config #4's exact matmul shape
    a = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    w_np = rng.normal(size=(K, N)).astype(np.float32)
    flops = 2.0 * M * K * N

    def mk(iters):
        def run():
            w = jnp.asarray(w_np)  # compile-time constant

            def body(_, c):
                y = jnp.matmul(a + c * 1e-30, w, precision="highest")
                # full-array carry folded back to (M, K): consume every
                # output element (slice-read carries dead-code work)
                return y.reshape(M, K, N // K).sum(-1) * 1e-30

            out = jax.lax.fori_loop(0, iters, body,
                                    jnp.zeros((M, K), jnp.float32))
            return jnp.sum(out)
        return run

    def timed(iters):
        fn = jax.jit(mk(iters))
        float(fn())
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn()
            float(out)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    t1, t3 = timed(ITERS), timed(3 * ITERS)
    s = (t3 - t1) / (2 * ITERS)
    print(f"const-weight ({M}x{K}x{N}, highest): {s * 1e3:.4f} ms/matmul "
          f"-> {flops / s / 1e12:.1f} TFLOPS", flush=True)
    # The carry's reduce (M*N reads) adds bytes; report its floor too.
    extra = (M * N + M * K) * 4 / 819e9
    print(f"# carry-fold byte floor {extra * 1e3:.4f} ms of the slope",
          file=sys.stderr)


if __name__ == "__main__":
    main()
