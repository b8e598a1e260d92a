"""Vectors are pytrees: whole op chains jit-fuse into one XLA program —
the design that subsumes the reference's removed combined_ops layer
(Changelog.md:77).  Also covers user-defined windows and convolution
functions (the reference's `*_custom` surface)."""
import jax
import jax.numpy as jnp
import numpy as np

import basic_dsp_tpu as bd
from tools import assert_vector_eq, create_complex_data, create_data


def test_jit_over_vector_chain():
    data = create_complex_data(1, 256)

    @jax.jit
    def chain(v: bd.ComplexTimeVector) -> bd.RealFreqVector:
        return (v.scale(2.0 + 0j)
                .apply_window(bd.HammingWindow())
                .fft()
                .magnitude())

    v = bd.to_complex_time_vec(data)
    out = chain(v)
    assert isinstance(out, bd.RealFreqVector)
    expected = (v.scale(2.0 + 0j).apply_window(bd.HammingWindow())
                .fft().magnitude())
    assert_vector_eq(out.array, expected.array, tol=1e-9)


def test_jit_retrace_cache():
    """Same shapes reuse the compiled program (pytree aux is stable)."""
    calls = {"n": 0}

    @jax.jit
    def op(v):
        calls["n"] += 1
        return v.sin().scale(3.0)

    a = bd.to_real_time_vec(create_data(1, 128))
    b = bd.to_real_time_vec(create_data(2, 128))
    op(a)
    op(b)
    assert calls["n"] == 1  # traced once


def test_custom_window_class():
    """Any WindowFunction subclass works (reference apply_custom_window)."""

    class Welch(bd.WindowFunction):
        def window(self, n, length):
            n = jnp.asarray(n, dtype=jnp.float64)
            c = (length - 1) / 2.0
            return 1.0 - ((n - c) / c) ** 2

    data = create_data(3, 64)
    out = bd.to_real_time_vec(data).apply_window(Welch())
    n = np.arange(64)
    c = 63 / 2
    assert_vector_eq(out.array, data * (1 - ((n - c) / c) ** 2), tol=1e-9)


def test_custom_impulse_response():
    """Any object with vectorized calc works for convolve/interpolatef
    (reference convolve_custom / interpolatef_custom)."""

    class Triangle(bd.RealImpulseResponse):
        is_symmetric = True

        def calc(self, x):
            return jnp.maximum(0.0, 1.0 - jnp.abs(jnp.asarray(x)))

    data = np.zeros(16)
    data[8] = 1.0
    out = bd.to_real_time_vec(data).convolve(Triangle(), 0.5, 3)
    # Triangle sampled at 0.5 spacing: [0, .5, 1, .5, 0] around the dirac.
    expected = np.zeros(16)
    expected[6:11] = [0, 0.5, 1.0, 0.5, 0]
    assert_vector_eq(out.array, expected, tol=1e-9)


def test_custom_frequency_response():
    class Brick(bd.RealFrequencyResponse):
        is_symmetric = True

        def calc_freq(self, x):
            return jnp.where(jnp.abs(jnp.asarray(x)) <= 0.5, 1.0, 0.0)

    v = bd.to_complex_freq_vec(np.ones(8, dtype=complex))
    out = v.multiply_frequency_response(Brick(), 1.0)
    got = np.asarray(out.array).real
    # j = -|i - 4| over 8 bins, max 4 -> x = j/4: kept where |j| <= 2.
    expected = [0, 0, 1, 1, 1, 1, 1, 0]
    assert_vector_eq(got, expected, tol=1e-9)


def test_lut_through_convolve():
    rc = bd.RaisedCosineFunction(0.35)
    lut = bd.RealTimeLinearTableLookup.from_conv_function(rc, 0.05, 100)
    data = np.zeros(10)
    data[5] = 1.0
    direct = bd.to_real_time_vec(data).convolve(rc, 0.2, 5)
    via_lut = bd.to_real_time_vec(data).convolve(lut, 0.2, 5)
    assert_vector_eq(via_lut.array, direct.array, tol=1e-3)
