"""Stage-level on-chip breakdown of the flagship spectrum tail (round-2
perf push).  Slope-timed (ITERS vs 3*ITERS in-jit loops) like bench.py.

Stages at 4M (n1=128, n2=32768, L2=256):
  conv_win       Toeplitz FIR + window
  stage1         B = F @ A (MXU DFT over rows)
  stage1_tw      C = (F @ A) * T   (twiddle fused in XLA epilogue?)
  kernel_from_C  Pallas rowfft_mag, twiddle outside
  kernel_from_B  Pallas rowfft_mag, twiddle streamed into kernel
  transpose      M.transpose(2,1,0).reshape(-1)
  xla_tail       fourstep.dif_spectrum_mag (full XLA tail)
  pl_tail        B/T-fold kernel + transpose (full Pallas tail)
  CHAIN64_xla / CHAIN64_pl   whole chain at n1=64 (stage-1 MACs halve)
"""
import sys
import time

import numpy as np

N = 1 << 22
M = 128
ITERS = 50
REPS = 3


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
    from basic_dsp_tpu import pipelines
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

    n1, n2 = 128, N // 128
    L2 = n2 // 128
    Fr, Fi, Tr, Ti = fourstep._dif_planes(n1, n2)
    Fd = (jnp.asarray(Fr), jnp.asarray(Fi))
    Td = (jnp.asarray(Tr), jnp.asarray(Ti))

    def conv_win(x, fb):
        taps_c = taps_re.astype(jnp.complex64)
        xs = x * (1.0 + fb * 1e-30)
        filt = conv_ops.toeplitz_conv(xs, taps_c, True)
        return filt * window.astype(filt.dtype)

    def s_conv(x, fb):
        return jnp.real(conv_win(x, fb))[0]

    def _stage1(xw):
        F = jax.lax.complex(*Fd)
        A = xw.reshape(n1, n2)
        return jnp.matmul(F, A, precision="highest")

    def s_stage1(x, fb):
        return jnp.real(_stage1(conv_win(x, fb)))[0, 0]

    def s_stage1_tw(x, fb):
        T = jax.lax.complex(*Td)
        C = _stage1(conv_win(x, fb)) * T
        return jnp.real(C)[0, 0]

    def s_kernel_from_C(x, fb):
        T = jax.lax.complex(*Td)
        C = _stage1(conv_win(x, fb)) * T
        Mm = sp.rowfft_mag(jnp.real(C), jnp.imag(C), shift=True)
        return Mm[0, 0, 0]

    def s_kernel_from_B(x, fb):
        B = _stage1(conv_win(x, fb))
        Mm = sp.rowfft_mag(jnp.real(B), jnp.imag(B), shift=True,
                           Tr=Td[0], Ti=Td[1])
        return Mm[0, 0, 0]

    def s_pl_tail(x, fb):
        B = _stage1(conv_win(x, fb))
        Mm = sp.rowfft_mag(jnp.real(B), jnp.imag(B), shift=True,
                           Tr=Td[0], Ti=Td[1])
        return Mm.transpose(2, 1, 0).reshape(-1)[0]

    def s_xla_tail(x, fb):
        return fourstep.dif_spectrum_mag(conv_win(x, fb), 128)[0]

    def s_chain64_xla(x, fb):
        return fourstep.dif_spectrum_mag(conv_win(x, fb), 64)[0]

    def s_chain64_pl(x, fb):
        return sp.dif_spectrum_mag_pallas(conv_win(x, fb), 64)[0]

    stages = {
        "conv_win": s_conv,
        "stage1": s_stage1,
        "stage1_tw": s_stage1_tw,
        "kernel_from_C": s_kernel_from_C,
        "kernel_from_B": s_kernel_from_B,
        "pl_tail": s_pl_tail,
        "xla_tail": s_xla_tail,
        "CHAIN64_xla": s_chain64_xla,
        "CHAIN64_pl": s_chain64_pl,
    }

    which = sys.argv[1:] or list(stages)

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

    for name in which:
        fn = stages[name]
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
            print(f"{name:14s} {ms:7.3f} ms/iter  {N / ms / 1e3:8.1f} "
                  f"Msamp/s  (spread {spd * 100:.0f}%)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
