"""DCE audit of bench.py's headline loop.

bench.py's fori_loop carry is ``mag[0]`` — a single spectrum sample.
Every DFT output depends on every input, so the FFT/FIR stages cannot be
pruned, but the FINAL magnitude transpose (32 MB of the 240 MB roofline
model) produces mostly-unused elements and could in principle be
slice-propagated away, inflating the headline.  This probe times the
identical chain with (a) the mag[0] carry and (b) an array carry that
folds EVERY output element into the next iteration's input.  If (b) is
materially slower, bench.py must switch to (b).
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

    def make_scalar(iters):
        @jax.jit
        def run(xr, xi):
            def body(_, fb):
                mag = chain(xr * (1.0 + fb * 1e-30), xi, taps_re, window,
                            n1=64)
                return mag[0]
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return run

    def make_array(iters):
        @jax.jit
        def run(xr, xi):
            def body(_, fb):
                # fb is the full previous spectrum (values ~1e3); the
                # 1e-33 scale lands inside the input multiply, so the
                # array carry adds NO extra full-signal pass vs scalar.
                return chain(xr * (1.0 + fb * 1e-33), xi, taps_re, window,
                             n1=64)
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((n,), jnp.float32))
        return run

    def slope(mk):
        r1, r3 = mk(ITERS), mk(3 * ITERS)
        for _ in range(2):
            float(jnp.max(r1(x_re, x_im))); float(jnp.max(r3(x_re, x_im)))

        def med(r):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter(); float(jnp.max(r(x_re, x_im)))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[1]

        return (med(r3) - med(r1)) / (2 * ITERS) * 1e3

    print("scalar mag[0] carry : %.3f ms/iter" % slope(make_scalar))
    print("array  full carry   : %.3f ms/iter" % slope(make_array))


if __name__ == "__main__":
    main()
