"""Octave-generated golden spectrum from reference
tests/time_freq_test.rs:44-116 — pins the full fft + magnitude pipeline
against an external (GNU Octave) reference."""
import numpy as np

import basic_dsp_tpu as bd
from tools import assert_vector_eq

FFT64_GOLDEN = [
    0.9292870138334854, 0.9306635099648193, 0.9348162621613968,
    0.9418153274362542, 0.9517810621190216, 0.9648895430587848,
    0.9813809812325847, 1.0015726905449405, 1.0258730936123666,
    1.0548108445331859, 1.0890644245480268, 1.1295083134069603,
    1.1772879726812928, 1.2339182289598294, 1.301437989279902,
    1.3826534754026867, 1.4815340275011206, 1.6038793282853527,
    1.7585157812279568, 1.9595783851339075, 2.2312382613655144,
    2.6185925930596348, 3.2167138068850805, 4.266740801517487,
    6.612395930080317, 16.722094841103452, 23.622177170007486,
    6.303697095969605, 3.404295797341746, 2.210968575749469,
    1.5819040732615888, 1.246194569535693, 1.1367683431144981,
    1.2461951854260518, 1.581903667468762, 2.210968517938972,
    3.40429586037563, 6.303698000270388, 23.622176749343343,
    16.722094721382852, 6.612395731182459, 4.266740005002631,
    3.216713364304185, 2.618592497323997, 2.23123801189946,
    1.9595783052844522, 1.7585159098930296, 1.6038802182584422,
    1.4815339648659298, 1.3826531545500815, 1.3014374693633786,
    1.2339180461884898, 1.177287968900429, 1.1295077116182717,
    1.0890636132326164, 1.0548115826822455, 1.0258732601724936,
    1.0015721588901556, 0.9813817215431422, 0.9648899510832059,
    0.951781283968659, 0.9418152796531379, 0.9348164516683282,
    0.9306639008658044,
]


def sinusoid_vector():
    """Reference new_sinusoid_vector (time_freq_test.rs:221-231)."""
    n, f, phi = 64, 0.1, 0.25
    r = np.arange(n, dtype=np.float64) * f
    return (bd.to_real_time_vec(r).scale(2.0 * np.pi).offset(phi).cos())


def test_fft_vector64_golden():
    v = sinusoid_vector().to_complex()
    result = v.fft().magnitude()
    assert_vector_eq(result.array, FFT64_GOLDEN, tol=1e-6)


def test_window_real_vs_complex():
    """time_freq_test.rs:35-42: windowing a complex-promoted vector equals
    windowing the real vector."""
    v = sinusoid_vector()
    complex_windowed = v.to_complex().apply_window(bd.HammingWindow()).to_real()
    real_windowed = v.apply_window(bd.HammingWindow())
    assert_vector_eq(complex_windowed.array, real_windowed.array, tol=1e-12)


def test_fft_ifft_vector64():
    v = sinusoid_vector().to_complex()
    back = v.fft().ifft()
    assert_vector_eq(back.to_real().array, sinusoid_vector().array, tol=1e-9)


def test_plain_fft_plain_ifft_large():
    """time_freq_test.rs:13-32: plain round trip with 1/points scaling."""
    rng = np.random.default_rng(201511212)
    for _ in range(3):
        n = rng.integers(5000, 10000)
        data = (rng.uniform(-10, 10, n) + 1j * rng.uniform(-10, 10, n))
        v = bd.to_complex_time_vec(data)
        result = v.plain_fft().scale(1.0 / n + 0.0j).plain_ifft()
        assert result.is_complex()
        assert_vector_eq(result.array, data, tol=1e-8)
