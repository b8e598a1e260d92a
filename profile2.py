"""Round-2 follow-up profile: the precomputed-twiddle four-step spectrum
variants (ops/fourstep.py) and the rewired flagship chain, on the real
chip.  Same two-point timing as profile_chain.py."""
import time

import numpy as np

N = 1 << 22
M = 128
ITERS = 20
REPS = 3


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    import jax.numpy as jnp
    from basic_dsp_tpu.ops import conv_ops, fourstep
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
    taps = jnp.asarray(taps_np)
    window = HammingWindow().sample(N, dtype=jnp.float32)

    def timed(name, fn, warm=2):
        def make(its):
            @jax.jit
            def run(xr, xi):
                x = xr + 1j * xi

                def body(_, carry):
                    return fn(carry)

                out = jax.lax.fori_loop(0, its, body, x)
                return jnp.abs(out.reshape(-1)[0])
            return run

        r1, r2 = make(ITERS), make(3 * ITERS)
        for _ in range(warm):
            float(r1(x_re, x_im))
            float(r2(x_re, x_im))

        def med(r):
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(r(x_re, x_im))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[len(ts) // 2], (max(ts) - min(ts)) / min(ts)

        (t1, _), (t2, sp) = med(r1), med(r2)
        ms = (t2 - t1) / (2 * ITERS) * 1e3
        print(f"{name:26s} {ms:8.3f} ms  {N / (ms / 1e3) / 1e6:9.1f} "
              f"Msamp/s (spread {sp * 100:.0f}%)", flush=True)
        return ms

    def fb(fn):
        def g(x):
            y = fn(x)
            return x * (0.5 + y.reshape(-1)[0] * 1e-30)
        return g

    # correctness spot check on-chip at 64k
    @jax.jit
    def _check(xr, xi):
        xc = (xr + 1j * xi)[:1 << 16]
        w = window[:1 << 16]
        ref = jnp.abs(jnp.fft.fftshift(jnp.fft.fft(xc * w)))
        a = fourstep.dif_spectrum_mag(xc * w)
        b = fourstep.dit_spectrum_mag(xc * w)
        return (jnp.max(jnp.abs(a - ref)) / jnp.max(ref),
                jnp.max(jnp.abs(b - ref)) / jnp.max(ref))

    ea, eb = _check(x_re, x_im)
    print(f"# on-chip rel err dif {float(ea):.2e} dit {float(eb):.2e}",
          flush=True)

    for n1 in (128, 256):
        timed(f"spec_dif_{n1}",
              fb(lambda x, n1=n1: fourstep.dif_spectrum_mag(x * window, n1)))
        timed(f"spec_dit_{n1}",
              fb(lambda x, n1=n1: fourstep.dit_spectrum_mag(x * window, n1)))

    def chain_pipeline(x):
        mag = pipelines.fir_fft_chain.__wrapped__(x, taps.astype(x.dtype),
                                                  window)
        return x * (0.5 + mag[0] * 1e-30)

    timed("CHAIN_pipeline", chain_pipeline)

    def chain_dif(x):
        filt = conv_ops._toeplitz_conv_impl(x, taps.astype(x.dtype), True,
                                            "highest")
        mag = fourstep.dif_spectrum_mag(filt * window, 128)
        return filt * (0.5 + mag[0] * 1e-30)

    timed("CHAIN_dif128", chain_dif)


if __name__ == "__main__":
    main()
