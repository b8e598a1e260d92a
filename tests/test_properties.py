"""Property sweeps over size ranges — the analog of the reference's
``parameterized_vector_test`` (tests/tools/mod.rs:225-321), which runs every
property on both the single-threaded and thread-fan-out ranges.  Here the
two regimes are the direct/whole-signal paths vs the blocked/sharded paths
(size thresholds in DspConfig), plus agreement against numpy references."""
import numpy as np
import pytest

import basic_dsp_tpu as bd
from tools import (assert_vector_eq, create_complex_data, create_data,
                   multitone, scaled_tol)

# Reference ranges: RANGE_SINGLE_CORE 10k-100k, RANGE_MULTI_CORE 100k-200k
# (tools/mod.rs:216-223).  Sizes below and above the dispatch thresholds.
SIZES = [1001, 10_000, 50_001, 120_000]


@pytest.mark.parametrize("n", SIZES)
def test_elementary_vs_numpy(n):
    a = create_data(n, n)
    b = create_data(n + 1, n) + 20.0  # avoid /0
    va, vb = bd.to_real_time_vec(a), bd.to_real_time_vec(b)
    assert_vector_eq(va.add(vb).array, a + b, tol=1e-12)
    assert_vector_eq(va.sub(vb).array, a - b, tol=1e-12)
    assert_vector_eq(va.mul(vb).array, a * b, tol=1e-9)
    assert_vector_eq(va.div(vb).array, a / b, tol=1e-12)
    assert_vector_eq(va.scale(3.5).offset(-1.0).array, a * 3.5 - 1.0,
                     tol=1e-9)


@pytest.mark.parametrize("n", SIZES)
def test_fft_round_trip_sweep(n):
    data = create_complex_data(n, n)
    v = bd.to_complex_time_vec(data)
    assert_vector_eq(v.fft().ifft().array, data, tol=1e-7)


@pytest.mark.parametrize("n", SIZES)
def test_statistics_vs_numpy_sweep(n):
    data = create_data(n, n)
    s = bd.to_real_time_vec(data).statistics()
    assert s.count == n
    assert abs(s.average - data.mean()) < scaled_tol(1e-9)
    assert abs(s.rms - np.sqrt((data ** 2).mean())) < scaled_tol(1e-9)
    assert s.min_index == data.argmin() and s.max_index == data.argmax()


@pytest.mark.parametrize("n", [10_000, 120_000])
def test_conv_identity_sweep(n):
    """conv == freq multiplication across the dispatch thresholds
    (tests/convolution_test.rs:141 forces the overlap-save path with
    >10k sizes)."""
    x = create_complex_data(n, n, dtype=np.complex64)
    h = create_complex_data(33, 33, dtype=np.complex64)
    a = bd.to_complex_time_vec(x)
    b = bd.to_complex_time_vec(h)
    conv = a.convolve_signal(b)
    # Direct circular conv via numpy FFT with the centered-kernel layout.
    c = 33 - 33 // 2
    g = np.zeros(n, dtype=np.complex64)
    g[:33] = h
    g = np.roll(g, -(c - 1))
    expected = np.fft.ifft(np.fft.fft(x) * np.fft.fft(g))
    assert_vector_eq(conv.array, expected, tol=2e-2)


@pytest.mark.parametrize("n", [10_000, 44_100])
def test_interpolatef_vs_interpft_sweep(n):
    """Cross-algorithm agreement on a smooth signal (the
    interpolation_test.rs contract, tolerance 0.1-0.2)."""
    data = multitone(n, n).astype(np.float32)
    v = bd.to_real_time_vec(data).to_complex()
    f = v.interpolatef(bd.SincFunction(), 2.0, 0.0, 12)
    ft = v.interpft(2 * n)
    fa = np.asarray(f.to_real().array)
    fta = np.asarray(ft.to_real().array)
    assert_vector_eq(fa[100:-100], fta[100:-100], tol=0.2)


@pytest.mark.parametrize("n", [10_000, 100_000])
def test_sum_and_dot_sweep(n):
    a = create_data(n, n, dtype=np.float32)
    b = create_data(n + 2, n, dtype=np.float32)
    va, vb = bd.to_real_time_vec(a), bd.to_real_time_vec(b)
    exact = float(np.dot(a.astype(np.float64), b.astype(np.float64)))
    assert abs(va.dot_product_prec(vb) - exact) < 1e-6 * abs(exact) + 1e-6
    assert abs(va.sum_prec() - a.astype(np.float64).sum()) < 1e-9
