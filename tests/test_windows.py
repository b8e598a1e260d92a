"""Window goldens ported from reference window_functions.rs:156-183."""
import numpy as np

from basic_dsp_tpu import (BlackmanHarrisWindow, HammingWindow,
                           RectangularWindow, TriangularWindow)
from tools import assert_vector_eq


def sample(window, n):
    return np.asarray(window.sample(n))


def test_triangular_window():
    assert_vector_eq(sample(TriangularWindow(), 5),
                     [0.2, 0.6, 1.0, 0.6, 0.2], tol=1e-4)


def test_hamming_window():
    assert_vector_eq(sample(HammingWindow(), 5),
                     [0.08, 0.54, 1.0, 0.54, 0.08], tol=1e-4)


def test_blackman_harris_window():
    assert_vector_eq(sample(BlackmanHarrisWindow(), 5),
                     [0.0001, 0.2175, 1.0000, 0.2175, 0.0001], tol=1e-4)


def test_rectangular_window():
    assert_vector_eq(sample(RectangularWindow(), 5), np.ones(5), tol=1e-12)
