"""Complex arithmetic details, modeled on reference tests/complex_test.rs:
each op vs a hand-written numpy reference over random data."""
import numpy as np
import pytest

import basic_dsp_tpu as bd
from tools import assert_vector_eq, create_complex_data


@pytest.fixture
def pair():
    return create_complex_data(1, 1000), create_complex_data(2, 1000)


def test_complex_mul(pair):
    a, b = pair
    out = bd.to_complex_time_vec(a).mul(bd.to_complex_time_vec(b))
    assert_vector_eq(out.array, a * b, tol=1e-9)


def test_complex_div(pair):
    a, b = pair
    out = bd.to_complex_time_vec(a).div(bd.to_complex_time_vec(b))
    assert_vector_eq(out.array, a / b, tol=1e-9)


def test_complex_offset_scale(pair):
    a, _ = pair
    v = bd.to_complex_time_vec(a)
    out = v.offset(2 - 3j).scale(1 + 1j)
    assert_vector_eq(out.array, (a + (2 - 3j)) * (1 + 1j), tol=1e-9)


def test_complex_offset_on_real_vector_errors():
    v = bd.to_real_time_vec([1.0, 2.0])
    with pytest.raises(bd.DspError):
        v.offset(1 + 2j)
    g = bd.to_gen_dsp_vec([1.0, 2.0], is_complex=False)
    assert g.offset(1 + 2j).is_erroneous()


def test_phase_matches_atan2(pair):
    a, _ = pair
    out = bd.to_complex_time_vec(a).phase()
    assert_vector_eq(out.array, np.arctan2(a.imag, a.real), tol=1e-12)


def test_multiply_complex_exponential_delta():
    """b is also scaled by delta (complex_ops.rs:81-105 code, which differs
    from its doc comment)."""
    a_coef, b_coef, delta = 0.5, 1.5, 2.0
    data = create_complex_data(3, 64)
    v = bd.to_complex_time_vec(data, delta=delta)
    out = v.multiply_complex_exponential(a_coef, b_coef)
    i = np.arange(64)
    expected = data * np.exp(1j * (a_coef * delta * i + b_coef * delta))
    assert_vector_eq(out.array, expected, tol=1e-9)


def test_statistics_split_interleave_semantics():
    """Element j goes to bucket j%len with index j//len
    (statistics.rs:398-429)."""
    data = np.arange(12.0)
    stats = bd.to_real_time_vec(data).statistics_split(3)
    for k in range(3):
        sub = data[k::3]
        assert stats[k].sum == sub.sum()
        assert stats[k].max_index == len(sub) - 1


def test_statistics_split_cap():
    v = bd.to_real_time_vec(np.arange(32.0))
    with pytest.raises(bd.DspError):
        v.statistics_split(17)  # STATS_VEC_CAPACTIY == 16


def test_gen_vector_runtime_transitions():
    """Gen vectors track domain/space at runtime through op chains."""
    g = bd.to_gen_dsp_vec(np.arange(8.0), is_complex=False)
    f = g.plain_fft()
    assert isinstance(f, bd.GenDspVector)
    assert f.is_complex() and f.domain() == bd.DataDomain.FREQUENCY
    t = f.plain_ifft()
    assert t.domain() == bd.DataDomain.TIME
