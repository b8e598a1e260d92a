"""Chain-variant slope bench (round-2 perf push, VERDICT r1 #1).

Measures bench.py-style per-iteration slopes for flagship-chain variants:

  V0_current           bench.py as shipped: complex taps, feedback on x
  V1_realtaps          taps stay f32 -> 2-plane Toeplitz conv (half the MXU)
  V2_taps_feedback     + feedback applied to the 128-tap kernel, not the 4M
                       signal (same dependency chain, no extra 64 MB pass)
  V3_factored_twiddle  + DIF twiddle as a (128,L)x(128,n2/L) factored outer
                       product computed in-trace (saves the 32 MB T read)
  V4_iota_twiddle      + DIF twiddle from broadcasted_iota cos/sin (VPU)

Each variant: jit fori_loop at ITERS and 3*ITERS, median of REPS, slope.
Correctness of V3/V4 spectra checked at 64k against jnp before timing.
"""
from __future__ import annotations

import sys
import time

import numpy as np

N = 1 << 22
M = 128
ITERS = 30
REPS = 3


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from basic_dsp_tpu import pipelines
    from basic_dsp_tpu.ops import conv_ops, fourstep
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

    # ---- factored / iota twiddle DIF spectrum variants -----------------
    def dif_planes_F(n1):
        k1 = np.arange(n1)
        F = np.exp(-2j * np.pi * np.outer(k1, k1) / n1).astype(np.complex64)
        return (jnp.asarray(F.real.copy()), jnp.asarray(F.imag.copy()))

    def factored_T(n1, n2, L, shift):
        """Tlo (n1,L), Thi (n1,n2/L) planes with T = Thi[:,hi]*Tlo[:,lo],
        j2 = hi*L + lo; fftshift sign (-1)^j2 folded into Tlo (L even)."""
        k1 = np.arange(n1)[:, None]
        lo = np.arange(L)[None, :]
        hi = np.arange(n2 // L)[None, :]
        Tlo = np.exp(-2j * np.pi * (k1 * lo) / (n1 * n2)).astype(np.complex64)
        if shift:
            Tlo = Tlo * np.where(lo % 2 == 0, 1.0, -1.0).astype(np.float32)
        Thi = np.exp(-2j * np.pi * (k1 * hi) / (n1 * n2 // L)
                     ).astype(np.complex64)
        return (jnp.asarray(Tlo.real.copy()), jnp.asarray(Tlo.imag.copy()),
                jnp.asarray(Thi.real.copy()), jnp.asarray(Thi.imag.copy()))

    def spec_factored(xw, n1, n2, L, Fp, Tp):
        F = jax.lax.complex(Fp[0], Fp[1])
        Tlo = jax.lax.complex(Tp[0], Tp[1])
        Thi = jax.lax.complex(Tp[2], Tp[3])
        A = xw.reshape(n1, n2)
        B = jnp.matmul(F, A, precision="highest")
        C3 = (B.reshape(n1, n2 // L, L)
              * Thi[:, :, None] * Tlo[:, None, :])
        D = jnp.fft.fft(C3.reshape(n1, n2), axis=-1)
        return jnp.abs(D).T.reshape(-1)

    def _stockham_planes(n1):
        """Per-stage twiddle (re, im) numpy planes for the autosort radix-2
        DIF FFT along axis 0; stage s has block size m = n1 >> s."""
        planes = []
        m = n1
        while m > 1:
            half = m // 2
            w = np.exp(-2j * np.pi * np.arange(half) / m).astype(np.complex64)
            planes.append((w.real.copy(), w.imag.copy()))
            m = half
        return planes

    def stockham_axis0(a2, n1, planes):
        """Natural-order FFT along axis 0 of (n1, K): autosort radix-2 —
        middle-axis halving slices + elementwise + axis-0 concat only, so
        XLA can fuse the whole butterfly chain into one pass (no matmul,
        no bit-reversal gather)."""
        K = a2.shape[1]
        a = a2.reshape(1, n1, K)
        l, m = 1, n1
        for wre, wim in planes:
            half = m // 2
            w = jax.lax.complex(jnp.asarray(wre), jnp.asarray(wim)
                                )[None, :, None]
            even = a[:, :half, :]
            odd = a[:, half:, :]
            a = jnp.concatenate([even + odd, (even - odd) * w], axis=0)
            l, m = 2 * l, half
        return a.reshape(n1, K)

    def spec_stockham(xw, n1, n2, planes, Tp):
        Tr, Ti = Tp
        T = jax.lax.complex(jnp.asarray(Tr), jnp.asarray(Ti))
        A = xw.reshape(n1, n2)
        B = stockham_axis0(A, n1, planes)
        D = jnp.fft.fft(B * T, axis=-1)
        return jnp.abs(D).T.reshape(-1)

    def shifted_T(n1, n2):
        """Precomputed DIF twiddle with the fftshift sign fold, as numpy
        (re, im) planes (mirrors fourstep._dif_planes + sign)."""
        k1 = np.arange(n1)
        T = np.exp(-2j * np.pi * np.outer(k1, np.arange(n2)) / (n1 * n2)
                   ).astype(np.complex64)
        T = T * np.where(np.arange(n2) % 2 == 0, 1.0, -1.0
                         ).astype(np.float32)
        return (np.ascontiguousarray(T.real), np.ascontiguousarray(T.imag))

    def spec_iota(xw, n1, n2, Fp):
        F = jax.lax.complex(Fp[0], Fp[1])
        A = xw.reshape(n1, n2)
        B = jnp.matmul(F, A, precision="highest")
        k1 = jax.lax.broadcasted_iota(jnp.float32, (n1, n2), 0)
        j2 = jax.lax.broadcasted_iota(jnp.float32, (n1, n2), 1)
        ang = (-2.0 * np.pi / (n1 * n2)) * (k1 * j2)
        sign = 1.0 - 2.0 * (jnp.mod(j2, 2.0))     # (-1)^j2 fftshift fold
        T = jax.lax.complex(jnp.cos(ang) * sign, jnp.sin(ang) * sign)
        D = jnp.fft.fft(B * T, axis=-1)
        return jnp.abs(D).T.reshape(-1)

    # ---- correctness check at 64k --------------------------------------
    n_chk = 1 << 16
    n1c, n2c = fourstep.factor(n_chk)
    Fc = dif_planes_F(n1c)
    Tc = factored_T(n1c, n2c, 256, True)

    @jax.jit
    def _check(xr, xi):
        xc = xr + 1j * xi
        ref = jnp.abs(jnp.fft.fftshift(jnp.fft.fft(xc)))
        a = spec_factored(xc, n1c, n2c, 256, Fc, Tc)
        b = spec_iota(xc, n1c, n2c, Fc)
        return (jnp.max(jnp.abs(a - ref)) / jnp.max(ref),
                jnp.max(jnp.abs(b - ref)) / jnp.max(ref))

    ea, eb = _check(x_re[:n_chk], x_im[:n_chk])
    print(f"# factored rel err {float(ea):.2e}  iota {float(eb):.2e}",
          flush=True)

    # ---- chain variants -------------------------------------------------
    n1, n2 = fourstep.factor(N)
    F = dif_planes_F(n1)
    T = factored_T(n1, n2, 256, True)

    def v0(x, fb):
        mag = pipelines.fir_fft_chain.__wrapped__(
            x * (1.0 + fb * 1e-30), taps_re.astype(jnp.complex64), window)
        return mag[0]

    def v1(x, fb):
        mag = pipelines.fir_fft_chain.__wrapped__(
            x * (1.0 + fb * 1e-30), taps_re, window)
        return mag[0]

    def v2(x, fb):
        mag = pipelines.fir_fft_chain.__wrapped__(
            x, taps_re * (1.0 + fb * 1e-30), window)
        return mag[0]

    def _conv_win(x, fb):
        filt = conv_ops._toeplitz_conv_impl(
            x, taps_re * (1.0 + fb * 1e-30), True, "highest")
        return filt * window.astype(filt.dtype)

    def v3(x, fb):
        return spec_factored(_conv_win(x, fb), n1, n2, 256, F, T)[0]

    def v4(x, fb):
        return spec_iota(_conv_win(x, fb), n1, n2, F)[0]

    # Round 2 of variants: V1-V4 showed the 2-plane real-taps conv is a
    # pessimization (interleaved-complex relayout); isolate the remaining
    # ideas with complex taps.  The complex cast happens IN-TRACE: an eager
    # complex device array closed over by jit becomes a program constant,
    # which cannot cross the host<->device boundary on axon.

    def v5(x, fb):
        taps_c = taps_re.astype(jnp.complex64)
        mag = pipelines.fir_fft_chain.__wrapped__(
            x, taps_c * (1.0 + fb * 1e-30), window)
        return mag[0]

    def _conv_win_c(x, fb):
        taps_c = taps_re.astype(jnp.complex64)
        filt = conv_ops._toeplitz_conv_impl(
            x, taps_c * (1.0 + fb * 1e-30), True, "highest")
        return filt * window.astype(filt.dtype)

    def v7(x, fb):
        xw = _conv_win_c(x, fb)
        return fourstep.dif_spectrum_mag(xw, 256)[0]

    def v8(x, fb):
        return spec_factored(_conv_win_c(x, fb), n1, n2, 256, F, T)[0]

    def v9(x, fb):
        xw = _conv_win_c(x, fb)
        return fourstep.dif_spectrum_mag(xw, 64)[0]

    variants = {"V0_current": v0, "V1_realtaps": v1, "V2_taps_feedback": v2,
                "V3_factored_twiddle": v3, "V4_iota_twiddle": v4,
                "V5_tapsfb_complex": v5, "V7_n1_256": v7,
                "V8_factored_ctaps": v8, "V9_n1_64": v9}

    which = sys.argv[1:] or list(variants)

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
        fn = variants[name]
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

        (t1, _), (t3, sp) = med(r1), med(r3)
        ms = (t3 - t1) / (2 * ITERS) * 1e3
        print(f"{name:22s} {ms:7.3f} ms/iter  {N / ms / 1e3:8.1f} Msamp/s  "
              f"(spread {sp * 100:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
