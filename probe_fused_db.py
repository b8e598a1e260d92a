"""On-chip A/B: flagship chain with the XLA stage-1 vs the fully-fused
Pallas kernel (double-buffered panel DMA).  Round-2 serial version
measured 0.778 vs 0.559 ms; if the double-buffered fused path wins,
flip `fused=True` in bench.py / pipelines default."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from basic_dsp_tpu import pipelines
from basic_dsp_tpu.windows import HammingWindow
from basic_dsp_tpu.conv_types import RaisedCosineFunction

ITERS = 50


def main():
    n, m = 1 << 22, 128
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

    def make(iters, fused):
        @jax.jit
        def run(xr, xi):
            def body(_, fb):
                return chain(xr * (1.0 + fb * 1e-33), xi, taps_re, window,
                             n1=64, fused=fused)
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((n,), jnp.float32))
        return run

    def slope(fused):
        r1, r3 = make(ITERS, fused), make(3 * ITERS, fused)
        for _ in range(2):
            float(jnp.max(r1(x_re, x_im))); float(jnp.max(r3(x_re, x_im)))

        def med(r):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter(); float(jnp.max(r(x_re, x_im)))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[1]

        return (med(r3) - med(r1)) / (2 * ITERS) * 1e3

    print("xla stage-1        : %.3f ms/iter" % slope(False))
    print("fused double-buffer: %.3f ms/iter" % slope(True))
    # numeric parity on-chip
    a = jax.jit(lambda a_, b_: chain(a_, b_, taps_re, window, n1=64))(
        x_re, x_im)
    b = jax.jit(lambda a_, b_: chain(a_, b_, taps_re, window, n1=64,
                                     fused=True))(x_re, x_im)
    err = float(jnp.max(jnp.abs(a - b)) / jnp.max(a))
    print("fused rel err vs xla-stage1:", err)


if __name__ == "__main__":
    main()
