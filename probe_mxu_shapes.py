"""MXU throughput at the FLAGSHIP CHAIN's matmul shapes (not the square
4096^3 of probe_mxu_peak) with CONSTANT weight operands, precision
"highest" — the honest denominator check for bench.py's compute floor.

Hypothesis: for a compile-time-constant operand XLA precomputes its
hi/lo bf16 decomposition, so "highest" costs fewer runtime MXU passes
than the 6 measured with two runtime operands (probe_mxu_peak: 30.8
TFLOPS); the chain's prefix measured FASTER than a 30.8-TFLOPS floor
would allow (probe_breakdown3), so the model's peak may be wrong for
constant-weight shapes.
"""
import sys
import time

import numpy as np

ITERS = 50
REPS = 5


def timed(mk, iters):
    import jax
    import jax.numpy as jnp
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


def slope(mk):
    t1 = timed(mk, ITERS)
    t3 = timed(mk, 3 * ITERS)
    return (t3 - t1) / (2 * ITERS)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    cases = [
        # (name, M, K, N, const_side)  out (M,N) = (M,K)@(K,N)
        ("fir_shape data@constT", 32768, 128, 128, "rhs"),
        ("stage1 constF@data", 64, 64, 65536, "lhs"),
        ("lane_dft data@constF", 32768, 128, 128, "rhs"),
        ("square both-runtime", 4096, 4096, 4096, None),
    ]
    for name, M, K, N, const_side in cases:
        flops = 2.0 * M * K * N
        a_np = rng.normal(size=(M, K)).astype(np.float32)
        b_np = rng.normal(size=(K, N)).astype(np.float32)

        def mk(iters, a_np=a_np, b_np=b_np, M=M, K=K, N=N,
               const_side=const_side):
            def run():
                import jax.numpy as jnp
                a = jnp.asarray(a_np)
                b = jnp.asarray(b_np)

                def body(_, c):
                    if const_side == "lhs":
                        y = jnp.matmul(a, b + c * 1e-30,
                                       precision="highest")
                        return y * 1e-30
                    y = jnp.matmul(a + c * 1e-30, b, precision="highest")
                    # carry must be (M,K)-shaped for the feedback; fold
                    # N down to K via a cheap slice-free reshape-sum when
                    # shapes differ
                    if K != N:
                        return y.reshape(M, K, N // K).sum(-1) * 1e-30
                    return y * 1e-30

                if const_side == "lhs":
                    init = jnp.zeros((K, N), jnp.float32)
                else:
                    init = jnp.zeros((M, K), jnp.float32)
                out = jax.lax.fori_loop(0, iters, body, init)
                return jnp.sum(out)
            return run

        s = slope(mk)
        print(f"{name:24s} ({M}x{K}x{N}): {s * 1e3:8.4f} ms -> "
              f"{flops / s / 1e12:6.1f} TFLOPS", flush=True)


if __name__ == "__main__":
    main()
