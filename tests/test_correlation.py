"""Correlation goldens ported from reference
time_freq/correlation.rs:166-216."""
import numpy as np

import basic_dsp_tpu as bd
from tools import assert_vector_eq


def from_interleaved(floats):
    arr = np.asarray(floats, dtype=float)
    return bd.to_complex_time_vec(arr[0::2] + 1j * arr[1::2])


def test_correlation_doc_example():
    """correlation.rs:47-62."""
    v = bd.to_complex_time_vec(np.array([1 + 1j, 2 + 2j, 3 + 3j]))
    arg = bd.to_complex_time_vec(np.array([3 + 3j, 2 + 2j, 1 + 1j]))
    prepared = arg.prepare_argument_padded()
    out = v.correlate(prepared)
    expected = [2 + 0j, 8 + 0j, 20 + 0j, 24 + 0j, 18 + 0j]
    assert_vector_eq(out.array, expected, tol=1e-4)


def test_time_correlation():
    """correlation.rs:170-198."""
    a = from_interleaved([
        0.0800, 0.0, 0.1876, 0.1170, 0.4601, 0.4132, 0.7700, 0.7500, 0.9723,
        0.9698, 0.9723, 0.9698, 0.7700, 0.7500, 0.4601, 0.4132, 0.1876,
        0.1170, 0.0800, 0.0])
    b = from_interleaved([
        0.1000, -0.6366, 0.3000, 0.0, 0.5000, 0.2122, 0.7000, 0.0, 0.9000,
        -0.1273, 0.9000, 0.0, 0.7000, 0.0909, 0.5000, 0.0, 0.3000, -0.0707,
        0.1000, 0.0])
    expected = [
        0.0080, 0.0000, 0.0428, 0.0174, 0.1340, 0.0897, 0.3356, 0.2827,
        0.7192, 0.6479, 1.3058, 1.1946, 2.0175, 1.8757, 2.7047, 2.5665,
        3.2186, 3.0874, 3.4409, 3.2994, 3.2291, 3.1287, 2.5801, 2.7264,
        1.7085, 2.1882, 0.8637, 1.6369, 0.2319, 1.1420, -0.0878, 0.7078,
        -0.1208, 0.3523, -0.0317, 0.1311, 0.0080, 0.0509]
    prepared = b.prepare_argument_padded()
    out = a.correlate(prepared)
    assert_vector_eq(out.interleaved(), expected, tol=0.1)


def test_time_correlation2():
    """correlation.rs:200-215."""
    a = from_interleaved([1.0, 1.0, 2.0, 1.0, 3.0, 1.0])
    b = from_interleaved([4.0, 1.0, 5.0, 1.0, 6.0, 1.0])
    expected = [7.0, 5.0, 19.0, 8.0, 35.0, 9.0, 25.0, 4.0, 13.0, 1.0]
    prepared = b.prepare_argument_padded()
    out = a.correlate(prepared)
    assert_vector_eq(out.interleaved(), expected, tol=0.1)


def test_correlation_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=32) + 1j * rng.normal(size=32)
    y = rng.normal(size=32) + 1j * rng.normal(size=32)
    a = bd.to_complex_time_vec(x)
    b = bd.to_complex_time_vec(y)
    out = np.asarray(a.correlate(b.prepare_argument_padded()).array)
    expected = np.correlate(x, y, mode="full")
    assert_vector_eq(out, expected, tol=1e-8)
