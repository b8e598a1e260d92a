"""On-chip A/B: flagship chain n1 sweep.

Hypothesis (VERDICT r5 item 1): at n1=64 the spectrum kernel's row FFT
(L2=512) runs one radix-4 Stockham stage on the VPU plus a 32-piece
assembly concat — the measured ~0.2 ms of non-dot in-kernel time.  At
n1=256, L2=128=m0: the row FFT is PURE MXU dots (no Stockham stage, no
piece permute), and stage 1 stays bytes-bound (const-weight matmuls
presplit to ~60 TFLOPS).  n1=128 (L2=256, one radix-2 stage) is the
midpoint.

Floor discipline: vs_baseline is ALWAYS reported against the n1=64
formulation's 12.35 GFLOP compute floor (0.401 ms) — a bigger stage-1
must win on the clock, not by inflating its own floor.
"""
import sys
import time

import numpy as np


ITERS = 50


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

    def make(iters, n1, wide=False):
        @jax.jit
        def chain_iters(x_re, x_im):
            def body(_, carry):
                mag = pipelines.fir_fft_chain_planar.__wrapped__(
                    x_re * (1.0 + carry * 1e-30), x_im, taps_re, window,
                    n1=n1, wide=wide)
                return mag * 1e-3

            return jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((n,), jnp.float32))

        return chain_iters

    # parity check at n1=256 vs n1=64 (both through the kernel)
    ref = pipelines.fir_fft_chain_planar(x_re, x_im, taps_re, window, n1=64)
    for n1 in (128, 256):
        got = pipelines.fir_fft_chain_planar(x_re, x_im, taps_re, window,
                                             n1=n1)
        err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        print(f"# parity n1={n1} vs 64: rel {err:.2e}", flush=True)
        assert err < 1e-5, err

    for n1 in (64, 128, 256):
        for wide in ((False, True) if n1 == 256 else (False,)):
            r1, r3 = make(ITERS, n1, wide), make(3 * ITERS, n1, wide)
            for _ in range(2):
                float(r1(x_re, x_im)[0]); float(r3(x_re, x_im)[0])
            slopes = []
            for _ in range(3):
                t0 = time.perf_counter(); float(r1(x_re, x_im)[0])
                t1 = time.perf_counter(); float(r3(x_re, x_im)[0])
                t2 = time.perf_counter()
                s = ((t2 - t1) - (t1 - t0)) / (2 * ITERS)
                if s > 0:
                    slopes.append(s)
            med = sorted(slopes)[len(slopes) // 2] if slopes else float("nan")
            print(f"n1={n1} wide={int(wide)}: {med * 1e3:.4f} ms/iter "
                  f"(vs 0.401 floor: {0.401e-3 / med:.3f})"
                  if slopes else f"n1={n1}: no positive slope", flush=True)


if __name__ == "__main__":
    main()
