"""On-chip correctness + slope bench for the Pallas kernels, now that
Mosaic compiles on this runtime (probe_pallas.py: PALLAS_OK).

Compares, at 4M complex64 / 128 real taps:
  fir_pallas.fir_conv      vs conv_ops.toeplitz_conv   (same semantics)
  overlap_save_pallas      vs conv_ops.overlap_save    (fft_len 4096)
and a chain variant with the Pallas FIR feeding the DIF spectrum.
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

    from basic_dsp_tpu.ops import conv_ops, fourstep
    from basic_dsp_tpu.kernels import fir_pallas, overlap_save_pallas as osp
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

    # ---- correctness at 64k (compiled, on-chip) ------------------------
    n_chk = 1 << 16

    def _mk_check(kernel):
        @jax.jit
        def _check(xr, xi):
            x = xr + 1j * xi
            taps = taps_re.astype(jnp.complex64)
            ref = conv_ops.toeplitz_conv(x, taps, True)
            a = kernel(x, taps)
            scale = jnp.max(jnp.abs(ref))
            return jnp.max(jnp.abs(a - ref)) / scale
        return _check

    checks = {
        "fir_pallas": lambda x, h: fir_pallas.fir_conv(x, h, True),
        "os_pallas": lambda x, h: osp.overlap_save_pallas(x, h, True, 4096),
    }
    broken = set()
    for cname, k in checks.items():
        try:
            e = float(_mk_check(k)(x_re[:n_chk], x_im[:n_chk]))
            print(f"# on-chip rel err {cname}: {e:.2e}", flush=True)
        except Exception as ex:
            broken.add(cname)
            print(f"# {cname} FAILED: {type(ex).__name__}: "
                  f"{str(ex)[:300]}", flush=True)

    # ---- variants ------------------------------------------------------
    def conv_toeplitz(x, fb):
        taps = taps_re.astype(jnp.complex64)
        return conv_ops.toeplitz_conv(x * (1.0 + fb * 1e-30), taps, True)

    def conv_fir_pallas(x, fb):
        taps = taps_re.astype(jnp.complex64)
        return fir_pallas.fir_conv(x * (1.0 + fb * 1e-30), taps, True)

    def conv_os_pallas(x, fb):
        taps = taps_re.astype(jnp.complex64)
        return osp.overlap_save_pallas(x * (1.0 + fb * 1e-30), taps, True,
                                       4096)

    def chain_cur(x, fb):
        filt = conv_toeplitz(x, fb)
        return fourstep.dif_spectrum_mag(filt * window.astype(filt.dtype),
                                         128)
    def chain_pallas_fir(x, fb):
        filt = conv_fir_pallas(x, fb)
        return fourstep.dif_spectrum_mag(filt * window.astype(filt.dtype),
                                         128)

    variants = {
        "conv_toeplitz": conv_toeplitz,
        "conv_fir_pallas": conv_fir_pallas,
        "conv_os_pallas": conv_os_pallas,
        "CHAIN_current": chain_cur,
        "CHAIN_pallas_fir": chain_pallas_fir,
    }

    which = sys.argv[1:] or list(variants)
    skip = {"conv_fir_pallas": "fir_pallas", "CHAIN_pallas_fir": "fir_pallas",
            "conv_os_pallas": "os_pallas"}
    which = [w for w in which if skip.get(w) not in broken]

    def make(fn, iters):
        @jax.jit
        def run(xr, xi):
            x = xr + 1j * xi

            def body(_, carry):
                x, fb = carry
                out = fn(x, fb)
                return x, jnp.abs(out.reshape(-1)[0])

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
        print(f"{name:18s} {ms:7.3f} ms/iter  {N / ms / 1e3:8.1f} Msamp/s  "
              f"(spread {sp * 100:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
