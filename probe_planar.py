"""On-chip probe: the all-planar flagship chain (pipelines.fir_fft_chain_planar)
vs the complex-typed chain.  Slope-timed like bench.py."""
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

    from basic_dsp_tpu import pipelines
    from basic_dsp_tpu.ops import conv_ops
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

    # Accuracy first (one jit program; planar vs complex chain at 1M).
    @jax.jit
    def acc(xr, xi):
        nn = 1 << 20
        a = pipelines.fir_fft_chain.__wrapped__(
            xr[:nn] + 1j * xi[:nn], taps_re.astype(jnp.complex64),
            window[:nn])
        b = pipelines.fir_fft_chain_planar.__wrapped__(
            xr[:nn], xi[:nn], taps_re, window[:nn])
        return jnp.max(jnp.abs(a - b)) / jnp.max(a)

    t0 = time.perf_counter()
    err = float(acc(x_re, x_im))
    print(f"ACC planar-vs-complex 1M rel err: {err:.3e} "
          f"(compile+run {time.perf_counter() - t0:.1f}s)", flush=True)

    def chain_complex(xr, xi, fb):
        x = xr + 1j * xi
        return pipelines.fir_fft_chain.__wrapped__(
            x * (1.0 + fb * 1e-30), taps_re.astype(jnp.complex64),
            window)[0]

    def chain_planar(xr, xi, fb):
        return pipelines.fir_fft_chain_planar.__wrapped__(
            xr * (1.0 + fb * 1e-30), xi, taps_re, window)[0]

    def chain_planar64(xr, xi, fb):
        return pipelines.fir_fft_chain_planar.__wrapped__(
            xr * (1.0 + fb * 1e-30), xi, taps_re, window, n1=64)[0]

    def conv_planar(xr, xi, fb):
        outr = conv_ops._toeplitz_body(xr * (1.0 + fb * 1e-30), taps_re,
                                       "highest")
        outi = conv_ops._toeplitz_body(xi * (1.0 + fb * 1e-30), taps_re,
                                       "highest")
        return outr[0] + outi[0]

    def chain_fused64(xr, xi, fb):
        return pipelines.fir_fft_chain_planar.__wrapped__(
            xr * (1.0 + fb * 1e-30), xi, taps_re, window, n1=64,
            fused=True)[0]

    variants = {
        "conv_planar": conv_planar,
        "CHAIN_planar": chain_planar,
        "CHAIN_planar64": chain_planar64,
        "CHAIN_fused64": chain_fused64,
        "CHAIN_complex": chain_complex,
    }
    which = sys.argv[1:] or list(variants)

    def make(fn, iters):
        @jax.jit
        def run(xr, xi):
            def body(_, carry):
                fb = carry
                return fn(xr, xi, fb)

            fb = jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
            return fb

        return run

    for name in which:
        fn = variants[name]
        try:
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
            print(f"{name:15s} {ms:7.3f} ms/iter  {N / ms / 1e3:8.1f} "
                  f"Msamp/s  (spread {spd * 100:.0f}%)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:15s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
