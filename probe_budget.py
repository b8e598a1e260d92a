"""On-chip A/B of the flagship chain's per-stage precision budget
(VERDICT r2 #1b): budget=None (library dial, 6-pass f32-exact dots) vs
budget="high" (3-pass dots, ~1e-5 expected error).

Prints slope ms/iter for both and the relative error of the budgeted
spectrum against the exact one (computed on-chip; magnitudes are f32
positives, so rel err = max|a-b| / max|b|).
"""
import sys
import time

import numpy as np

ITERS = 50
REPS = 5


def main():
    import jax
    import jax.numpy as jnp

    from basic_dsp_tpu import pipelines
    from basic_dsp_tpu.windows import HammingWindow
    from basic_dsp_tpu.conv_types import RaisedCosineFunction

    n = 1 << 22
    m = 128
    rng = np.random.default_rng(0)
    x_re = jnp.asarray(rng.normal(size=n).astype(np.float32))
    x_im = jnp.asarray(rng.normal(size=n).astype(np.float32))
    rc = RaisedCosineFunction(0.35)
    t = ((np.arange(m) - m // 2) * 0.25).astype(np.float32)
    taps_np = np.asarray(rc.calc(t)).astype(np.float32)
    taps_np /= taps_np.sum()
    taps_re = jnp.asarray(taps_np)
    window = HammingWindow().sample(n, dtype=jnp.float32)

    # ---- accuracy first (single calls) ----
    @jax.jit
    def acc():
        exact = pipelines.fir_fft_chain_planar.__wrapped__(
            x_re, x_im, taps_re, window, n1=64)
        budg = pipelines.fir_fft_chain_planar.__wrapped__(
            x_re, x_im, taps_re, window, n1=64, budget="high")
        err = jnp.max(jnp.abs(budg - exact))
        scale = jnp.max(jnp.abs(exact))
        return err, scale

    err, scale = acc()
    rel = float(err) / float(scale)
    print(f"budget=high rel err vs exact: {rel:.3e}", flush=True)

    # ---- slope timing, array carry (bench.py harness) ----
    def make(iters, budget):
        @jax.jit
        def chain_iters(x_re, x_im):
            def body(_, fb):
                mag = pipelines.fir_fft_chain_planar.__wrapped__(
                    x_re * (1.0 + fb * 1e-30), x_im, taps_re, window,
                    n1=64, budget=budget)
                return mag * 1e-3
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((n,), jnp.float32))
        return chain_iters

    for budget in (None, "high", "high-xla", "high-kernel"):
        run1, run3 = make(ITERS, budget), make(3 * ITERS, budget)

        def fetch(run):
            out = run(x_re, x_im)
            return float(out[0])

        for _ in range(2):
            fetch(run1)
            fetch(run3)

        def med(run):
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                fetch(run)
                ts.append(time.perf_counter() - t0)
            ts.sort()
            return ts[len(ts) // 2]

        slopes = []
        for _ in range(3):
            t1, t3 = med(run1), med(run3)
            s = (t3 - t1) / (2 * ITERS)
            if s > 0:
                slopes.append(s)
        slopes.sort()
        sl = slopes[len(slopes) // 2] if slopes else float("nan")
        print(f"budget={budget}: {sl * 1e3:.4f} ms/iter "
              f"({n / sl / 1e6:.0f} Msamples/s)", flush=True)


if __name__ == "__main__":
    main()
