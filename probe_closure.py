"""A/B: bench chain with taps/window as runtime args vs closure constants.

bench.py measures 0.754 ms/iter; probe_planar (closure form) 0.598.  The
only structural difference is whether taps_re/window are jit arguments or
embedded constants (constant taps let XLA fold the Toeplitz band-matrix
construction; constant window folds the astype and may prefetch better).
"""
import sys
import time

import numpy as np

N = 1 << 22
M = 128
ITERS = 50
REPS = 5


def main():
    import jax
    import jax.numpy as jnp

    from basic_dsp_tpu import pipelines
    from basic_dsp_tpu.windows import HammingWindow
    from basic_dsp_tpu.conv_types import RaisedCosineFunction

    rng = np.random.default_rng(0)
    x_re = jnp.asarray(rng.normal(size=N).astype(np.float32))
    x_im = jnp.asarray(rng.normal(size=N).astype(np.float32))
    rc = RaisedCosineFunction(0.35)
    t = ((np.arange(M) - M // 2) * 0.25).astype(np.float32)
    taps_np = np.asarray(rc.calc(t)).astype(np.float32)
    taps_np /= taps_np.sum()
    taps_re = jnp.asarray(taps_np)
    window = HammingWindow().sample(N, dtype=jnp.float32)

    def make_args(iters):
        @jax.jit
        def run(xr, xi, taps, win):
            def body(_, fb):
                return pipelines.fir_fft_chain_planar.__wrapped__(
                    xr * (1.0 + fb * 1e-30), xi, taps, win, n1=64)[0]
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return lambda: float(run(x_re, x_im, taps_re, window))

    def make_closure(iters):
        @jax.jit
        def run(xr, xi):
            def body(_, fb):
                return pipelines.fir_fft_chain_planar.__wrapped__(
                    xr * (1.0 + fb * 1e-30), xi, taps_re, window, n1=64)[0]
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return lambda: float(run(x_re, x_im))

    for name, mk in [("args", make_args), ("closure", make_closure)]:
        r1, r3 = mk(ITERS), mk(3 * ITERS)
        for _ in range(2):
            r1(); r3()

        def med(r):
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                r()
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[len(ts) // 2], (max(ts) - min(ts)) / min(ts)

        (t1, _), (t3, spd) = med(r1), med(r3)
        ms = (t3 - t1) / (2 * ITERS) * 1e3
        print(f"{name:10s} {ms:7.3f} ms/iter  {N / ms / 1e3:8.1f} Msamp/s "
              f"(spread {spd * 100:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
