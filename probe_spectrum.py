"""On-chip probe for the Pallas spectrum kernel (kernels/spectrum_pallas).

1. Accuracy at 4M vs the XLA four-step path (in one jit program).
2. Chain slope timing: Toeplitz FIR + window + {XLA four-step | Pallas
   spectrum}, bench.py-style (slope between ITERS and 3*ITERS loops).
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
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from basic_dsp_tpu.ops import conv_ops, fourstep
    from basic_dsp_tpu.kernels import spectrum_pallas as sp
    from basic_dsp_tpu.windows import HammingWindow
    from basic_dsp_tpu.conv_types import RaisedCosineFunction

    rng = np.random.default_rng(0)
    x_re = jnp.asarray(rng.normal(size=N).astype(np.float32))
    x_im = jnp.asarray(rng.normal(size=N).astype(np.float32))
    rc = RaisedCosineFunction(0.35)
    tt = ((np.arange(M) - M // 2) * 0.25).astype(np.float32)
    taps_np = np.asarray(rc.calc(tt)).astype(np.float32)
    taps_np /= taps_np.sum()
    taps_re = jnp.asarray(taps_np)
    window = HammingWindow().sample(N, dtype=jnp.float32)

    # ---- 1. accuracy, one jit program -----------------------------------
    @jax.jit
    def acc(xr, xi):
        x = xr + 1j * xi
        a = fourstep.dif_spectrum_mag(x, 128)
        b = sp.dif_spectrum_mag_pallas(x, 128)
        return jnp.max(jnp.abs(a - b)) / jnp.max(a)

    t0 = time.perf_counter()
    err = float(acc(x_re[: 1 << 20], x_im[: 1 << 20]))
    print(f"ACC 1M rel err vs xla-four-step: {err:.3e} "
          f"(compile+run {time.perf_counter() - t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    errbig = float(jax.jit(acc.__wrapped__)(x_re, x_im))
    print(f"ACC 4M rel err vs xla-four-step: {errbig:.3e} "
          f"(compile+run {time.perf_counter() - t0:.1f}s)", flush=True)

    # ---- 2. chain timing (bench.py-exact chain, only the spectrum
    # stage swapped) ------------------------------------------------------
    from basic_dsp_tpu import pipelines

    def chain_xla(x, fb):
        taps_c = taps_re.astype(jnp.complex64)
        return pipelines.fir_fft_chain.__wrapped__(
            x * (1.0 + fb * 1e-30), taps_c, window)[0]

    def chain_pallas(x, fb):
        taps_c = taps_re.astype(jnp.complex64)
        xs = x * (1.0 + fb * 1e-30)
        filtered = conv_ops.toeplitz_conv(xs, taps_c, True)
        windowed = filtered * window.astype(filtered.dtype)
        return sp.dif_spectrum_mag_pallas(windowed)[0]

    def make(fn, iters):
        @jax.jit
        def run(xr, xi):
            x = xr + 1j * xi

            def body(_, carry):
                x, fb = carry
                return x, fn(x, fb)

            _, fb = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
            return fb

        return run

    for name, fn in [("CHAIN_xla", chain_xla), ("CHAIN_pallas", chain_pallas)]:
        r1, r3 = make(fn, ITERS), make(fn, 3 * ITERS)
        for _ in range(2):
            float(r1(x_re, x_im))
            float(r3(x_re, x_im))

        def med(r):
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(r(x_re, x_im))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[len(ts) // 2], (max(ts) - min(ts)) / min(ts)

        (t1, _), (t3, spd) = med(r1), med(r3)
        ms = (t3 - t1) / (2 * ITERS) * 1e3
        print(f"{name:14s} {ms:7.3f} ms/iter  {N / ms / 1e3:8.1f} Msamp/s  "
              f"(spread {spd * 100:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
