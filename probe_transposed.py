"""On-chip A/B: kernel-side transposed output vs the XLA magnitude
transpose in the flagship planar chain.

transposed=True keeps the whole (128, L2, n1) magnitude output
VMEM-resident across grid steps and each step writes its block through an
in-VMEM (rows, L2, 128) -> (128, L2, rows) transpose, eliminating the
separate 16 MB-read + 16 MB-write XLA transpose pass.  The open question
is Mosaic's cost for the block transpose (lane<->sublane relayouts).
Flip the chain default if (b)/(d) win; keep gated off if Mosaic rejects
the constant-index accumulator block or the relayout dominates.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from basic_dsp_tpu import pipelines
from basic_dsp_tpu.windows import HammingWindow
from basic_dsp_tpu.conv_types import RaisedCosineFunction

ITERS = 50


def main():
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
    chain = pipelines.fir_fft_chain_planar.__wrapped__

    # Parity first (cheap, full-vector check on-chip).
    base = chain(x_re, x_im, taps_re, window, n1=64)
    for name, kw in [("transposed", dict(transposed=True)),
                     ("fused+transposed", dict(fused=True, transposed=True))]:
        try:
            got = chain(x_re, x_im, taps_re, window, n1=64, **kw)
            err = float(jnp.max(jnp.abs(got - base)) / jnp.max(base))
            print(f"parity {name}: rel err {err:.2e}")
        except Exception as e:  # Mosaic may reject — that's the answer.
            print(f"parity {name}: FAILED {type(e).__name__}: {e}")

    def make(iters, **kw):
        @jax.jit
        def run(xr, xi):
            def body(_, fb):
                mag = chain(xr * (1.0 + fb * 1e-33), xi, taps_re, window,
                            n1=64, **kw)
                return mag
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((n,), jnp.float32))
        return run

    def slope(**kw):
        r1, r3 = make(ITERS, **kw), make(3 * ITERS, **kw)
        for _ in range(2):
            float(jnp.max(r1(x_re, x_im)))
            float(jnp.max(r3(x_re, x_im)))

        def med(r):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.max(r(x_re, x_im)))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[1]

        return (med(r3) - med(r1)) / (2 * ITERS) * 1e3

    for name, kw in [("(a) baseline        ", {}),
                     ("(b) transposed      ", dict(transposed=True)),
                     ("(c) fused           ", dict(fused=True)),
                     ("(d) fused+transposed", dict(fused=True,
                                                   transposed=True))]:
        try:
            print(f"{name}: {slope(**kw):.3f} ms/iter")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
