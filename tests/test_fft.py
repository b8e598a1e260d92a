"""FFT family goldens and identities.

Ported from reference doc examples (time_to_freq.rs:24-61,
freq_to_time.rs:26-63, freq.rs:22-31), swap-halves tests
(vector_types/mod.rs:689-713, data_reorganization.rs:564-597), and
tests/time_freq_test.rs round trips.
"""
import numpy as np
import pytest

import basic_dsp_tpu as bd
from tools import assert_vector_eq, create_complex_data, create_data


def test_plain_fft_golden():
    v = bd.to_complex_time_vec(np.array([1.0, -0.5 + 0.8660254j,
                                         -0.5 - 0.8660254j]))
    result = v.plain_fft()
    assert_vector_eq(result.array, [0.0, 3.0, 0.0], tol=1e-4)
    assert isinstance(result, bd.ComplexFreqVector)


def test_fft_golden():
    v = bd.to_complex_time_vec(np.array([1.0, -0.5 + 0.8660254j,
                                         -0.5 - 0.8660254j]))
    result = v.fft()
    assert_vector_eq(result.array, [0.0, 0.0, 3.0], tol=1e-4)


def test_plain_ifft_golden():
    v = bd.to_complex_freq_vec(np.array([0.0, 1.0, 0.0], dtype=complex))
    result = v.plain_ifft()
    assert_vector_eq(result.array,
                     [1.0, -0.5 + 0.8660254j, -0.5 - 0.8660254j], tol=1e-4)
    assert isinstance(result, bd.ComplexTimeVector)


def test_ifft_golden():
    v = bd.to_complex_freq_vec(np.array([0.0, 0.0, 3.0], dtype=complex))
    result = v.ifft()
    assert_vector_eq(result.array,
                     [1.0, -0.5 + 0.8660254j, -0.5 - 0.8660254j], tol=1e-4)


def test_fft_delta_becomes_rbw():
    v = bd.to_complex_time_vec(create_complex_data(1, 11), delta=0.2)
    result = v.fft()
    assert result.delta() == pytest.approx(0.2 * 11)


def test_mirror_golden():
    v = bd.to_complex_freq_vec(np.array([1 + 2j, 3 + 4j, 5 + 6j]))
    result = v.mirror()
    assert_vector_eq(result.array,
                     [1 + 2j, 3 + 4j, 5 + 6j, 5 - 6j, 3 - 4j], tol=1e-12)


def test_swap_halves_even():
    v = bd.to_real_time_vec([1.0, 2.0, 3.0, 4.0])
    assert_vector_eq(v.swap_halves().array, [3.0, 4.0, 1.0, 2.0], tol=0)


def test_swap_halves_real_odd():
    v = bd.to_real_time_vec(np.arange(1.0, 12.0))
    assert_vector_eq(v.swap_halves().array,
                     [7.0, 8.0, 9.0, 10.0, 11.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
                     tol=0)


def test_fft_shift_odd_forward():
    """Odd-length rotation semantics (vector_types/mod.rs:689-713, matches
    GNU Octave).  fft_shift requires a complex frequency vector (freq.rs
    trait bound); swap_halves is the any-flavor variant with the same
    forward rotation (data_reorganization.rs)."""
    v = bd.to_complex_freq_vec(np.arange(1.0, 10.0) + 0j)
    assert_vector_eq(v.fft_shift().array,
                     np.array([6.0, 7.0, 8.0, 9.0, 1.0, 2.0, 3.0, 4.0, 5.0])
                     + 0j, tol=0)
    r = bd.to_real_freq_vec(np.arange(1.0, 10.0))
    assert_vector_eq(r.swap_halves().array,
                     [6.0, 7.0, 8.0, 9.0, 1.0, 2.0, 3.0, 4.0, 5.0], tol=0)


def test_ifft_shift_odd():
    v = bd.to_complex_freq_vec(np.arange(1.0, 10.0) + 0j)
    assert_vector_eq(v.ifft_shift().array,
                     np.array([5.0, 6.0, 7.0, 8.0, 9.0, 1.0, 2.0, 3.0, 4.0])
                     + 0j, tol=0)


def test_fft_shift_real_vector_raises():
    """Typed real vectors lack FrequencyDomainOperations (freq.rs:42-51:
    N: ComplexNumberSpace) — the Python analog raises."""
    import pytest as _pytest
    from basic_dsp_tpu.errors import DspError
    with _pytest.raises(DspError):
        bd.to_real_freq_vec(np.arange(4.0)).fft_shift()


@pytest.mark.parametrize("n", [64, 100, 101, 10000])
def test_fft_ifft_round_trip(n):
    data = create_complex_data(42, n)
    v = bd.to_complex_time_vec(data)
    result = v.fft().ifft()
    assert_vector_eq(result.array, data, tol=1e-8)
    assert isinstance(result, bd.ComplexTimeVector)


@pytest.mark.parametrize("n", [64, 128])
def test_plain_fft_ifft_round_trip_needs_scale(n):
    data = create_complex_data(7, n)
    v = bd.to_complex_time_vec(data)
    result = v.plain_fft().plain_ifft().scale(1.0 / n)
    assert_vector_eq(result.array, data, tol=1e-8)


def test_windowed_fft_round_trip():
    data = create_complex_data(3, 64)
    v = bd.to_complex_time_vec(data)
    w = bd.HammingWindow()
    result = v.windowed_fft(w).windowed_ifft(w)
    assert_vector_eq(result.array, data, tol=1e-8)


def test_real_fft_matches_numpy():
    data = create_data(5, 33)
    v = bd.to_real_time_vec(data)
    result = v.plain_fft()
    assert_vector_eq(result.array, np.fft.fft(data), tol=1e-8)


@pytest.mark.parametrize("n", [33, 101, 1001])
def test_plain_sfft_sifft_round_trip(n):
    """Reference tests/real_test.rs:581-605: plain_sfft -> plain_sifft ->
    scale(1/n) reproduces the input; mirror(plain_sfft) == plain_fft."""
    data = create_data(9, n)
    v = bd.to_real_time_vec(data)
    half = v.plain_sfft()
    assert half.points() == n // 2 + 1
    mirrored = half.mirror()
    full = bd.to_real_time_vec(data).plain_fft()
    assert_vector_eq(mirrored.array, full.array, tol=1e-6)
    back = half.plain_sifft().scale(1.0 / n)
    assert isinstance(back, bd.RealTimeVector)
    assert back.points() == n
    assert_vector_eq(back.array, data, tol=1e-6)


def test_sfft_requires_odd_length():
    v = bd.to_real_time_vec(create_data(1, 10))
    with pytest.raises(bd.DspError):
        v.sfft()


def test_sfft_matches_full_fft_half():
    data = create_data(11, 41)
    full = bd.to_real_time_vec(data).plain_fft()
    half = bd.to_real_time_vec(data).plain_sfft()
    assert_vector_eq(half.array, np.asarray(full.array)[:21], tol=1e-8)


def test_gen_vector_fft_wrong_domain_marks_erroneous():
    v = bd.to_gen_dsp_vec([1.0, 2.0], is_complex=False,
                          domain=bd.DataDomain.FREQUENCY)
    out = v.plain_fft()
    assert out.is_erroneous()


def test_typed_vector_wrong_domain_raises():
    v = bd.to_complex_freq_vec(np.array([1.0 + 0j, 2.0]))
    with pytest.raises(bd.DspError):
        v.plain_fft()
