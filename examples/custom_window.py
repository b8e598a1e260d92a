"""Custom convolution kernels and windows — port of reference
examples/custom_window.rs.

Shows the user-extension contracts: subclass ``RealImpulseResponse`` (or
``RealFrequencyResponse`` / ``ComplexImpulseResponse`` /
``ComplexFrequencyResponse`` / ``WindowFunction``) with a vectorized
``calc`` and the library treats it exactly like a built-in kernel.  The
reference's scalar ``calc(&self, x: f64) -> f64`` becomes an array
function (it is traced into the jit program, so it must stay jax-
compatible; use ``jnp.where`` instead of Python branches).
"""
import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import basic_dsp_tpu as bd


class Identity(bd.RealImpulseResponse):
    """calc(0) == 1, zero elsewhere: convolution with it is a no-op at
    integer sampling (reference custom_window.rs Identity)."""

    is_symmetric = True

    def calc(self, x):
        x = jnp.asarray(x)
        return jnp.where(x == 0.0, 1.0, 0.0).astype(
            jnp.result_type(x, jnp.float32))


class Welch(bd.WindowFunction):
    """A window the library does not ship: 1 - ((n - N/2) / (N/2))^2."""

    is_symmetric = True

    def window(self, n, length):
        n = jnp.asarray(n)
        length = jnp.asarray(length, dtype=jnp.result_type(n, jnp.float32))
        half = (length - 1.0) / 2.0
        return 1.0 - ((n.astype(half.dtype) - half) / half) ** 2


def main():
    number_of_symbols = 100
    data = bd.to_real_time_vec(np.zeros(number_of_symbols, dtype=np.float32))
    out = data.convolve(Identity(), 1.0, 12)
    print(f"convolved {out.points()} points with a custom kernel")

    rng = np.random.default_rng(0)
    sig = bd.to_real_time_vec(rng.normal(size=256).astype(np.float32))
    spectrum = sig.windowed_fft(Welch())
    print(f"windowed_fft with a custom window: {spectrum.points()} bins, "
          f"peak magnitude {float(np.abs(spectrum.to_numpy()).max()):.3f}")


if __name__ == "__main__":
    main()
