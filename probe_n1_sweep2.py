"""Follow-up to probe_n1_sweep: micro-variants at the winning n1=128
geometry (L2=256, one radix-2 Stockham stage, c=2).

Arms: wide lane dots (skip the post-finish slice+stack), ROWS_PER_BLOCK
in {4, 8, 16} (grid-block size vs VMEM pressure), and n1=128 vs the old
n1=64 default re-measured in the same session for drift control.
"""
import sys
import time

import numpy as np

ITERS = 50


def main():
    import jax
    import jax.numpy as jnp

    from basic_dsp_tpu import pipelines
    from basic_dsp_tpu.kernels import spectrum_pallas
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

    def make(iters, n1, wide, salt):
        # distinct function object per arm (trace cache is
        # identity-keyed, CLAUDE.md)
        @jax.jit
        def chain_iters(x_re, x_im, _salt=salt):
            def body(_, carry):
                mag = pipelines.fir_fft_chain_planar.__wrapped__(
                    x_re * (1.0 + carry * 1e-30), x_im, taps_re, window,
                    n1=n1, wide=wide)
                return mag * 1e-3

            return jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((n,), jnp.float32))

        return chain_iters

    salt = [0]

    def measure(n1, wide, rows):
        spectrum_pallas.ROWS_PER_BLOCK = rows
        salt[0] += 1
        r1, r3 = make(ITERS, n1, wide, salt[0]), \
            make(3 * ITERS, n1, wide, -salt[0])
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
        print(f"n1={n1} wide={int(wide)} rows={rows}: {med * 1e3:.4f} "
              f"ms/iter (vs 0.401 floor: {0.401e-3 / med:.3f})", flush=True)
        return med

    for n1, wide, rows in ((128, False, 8), (128, True, 8),
                           (128, False, 16), (128, False, 4),
                           (128, True, 16), (64, False, 8)):
        try:
            measure(n1, wide, rows)
        except Exception as e:
            print(f"n1={n1} wide={int(wide)} rows={rows}: FAIL "
                  f"{type(e).__name__}: {e}", flush=True)
    spectrum_pallas.ROWS_PER_BLOCK = 8


if __name__ == "__main__":
    main()
