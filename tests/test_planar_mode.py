"""Planar-complex mode: the representation for runtimes where complex
dtypes cannot cross jit program boundaries (see _planar.py).  Every op
family must produce identical results with the mode on."""
import numpy as np
import pytest

import basic_dsp_tpu as bd
from basic_dsp_tpu import _planar
from tools import (TOL_SCALE, assert_vector_eq, create_complex_data,
                   create_data, scaled_tol)


@pytest.fixture(autouse=True)
def planar_on():
    _planar.set_planar_complex(True)
    yield
    _planar.set_planar_complex(False)


def cvec(n, seed=1):
    data = create_complex_data(seed, n)
    v = bd.to_complex_time_vec(data)
    assert _planar.is_planar(v._data), "planar mode must store planes"
    return v, data


def test_construct_and_to_numpy():
    v, data = cvec(64)
    np.testing.assert_allclose(v.to_numpy(), data)
    assert v.points() == 64 and v.is_complex()


def test_elementary_planar():
    v, data = cvec(128)
    out = v.scale(2.0 + 1j).offset(1 - 1j)
    assert_vector_eq(out.to_numpy(), data * (2 + 1j) + (1 - 1j), tol=1e-9)
    w, other = cvec(128, seed=2)
    assert_vector_eq(v.mul(w).to_numpy(), data * other, tol=1e-9)


def test_fft_round_trip_planar():
    v, data = cvec(256)
    back = v.fft().ifft()
    assert_vector_eq(back.to_numpy(), data, tol=1e-8)


def test_windowed_fft_planar():
    v, data = cvec(64)
    got = v.windowed_fft(bd.HammingWindow()).magnitude().to_numpy()
    w = np.asarray(bd.HammingWindow().sample(64))
    expected = np.abs(np.fft.fftshift(np.fft.fft(data * w)))
    assert_vector_eq(got, expected, tol=1e-6 * expected.max())


def test_convolve_signal_planar():
    v, data = cvec(100)
    h = create_complex_data(3, 7)
    hv = bd.to_complex_time_vec(h)
    out = v.convolve_signal(hv)
    _planar.set_planar_complex(False)
    ref = (bd.to_complex_time_vec(data)
           .convolve_signal(bd.to_complex_time_vec(h)))
    _planar.set_planar_complex(True)
    assert_vector_eq(out.to_numpy(), ref.to_numpy(), tol=1e-8)


def test_interpolatef_planar():
    v, data = cvec(64)
    out = v.interpolatef(bd.SincFunction(), 1.5, 0.0, 8)
    assert out.points() == 96
    _planar.set_planar_complex(False)
    ref = (bd.to_complex_time_vec(data)
           .interpolatef(bd.SincFunction(), 1.5, 0.0, 8))
    _planar.set_planar_complex(True)
    assert_vector_eq(out.to_numpy(), ref.to_numpy(), tol=1e-8)


def test_statistics_planar():
    v, data = cvec(100)
    s = v.statistics()
    norms = np.abs(data)
    assert s.count == 100
    assert abs(s.sum - data.sum()) < scaled_tol(1e-9)
    assert s.min_index == norms.argmin()
    assert abs(v.sum_prec() - data.sum()) < scaled_tol(1e-9)
    split = v.statistics_split(4)
    assert abs(split[1].sum - data[1::4].sum()) < scaled_tol(1e-9)


def test_correlation_planar():
    v, data = cvec(32)
    w, other = cvec(32, seed=5)
    out = v.correlate(w.prepare_argument_padded())
    expected = np.correlate(data, other, mode="full")
    assert_vector_eq(out.to_numpy(), expected, tol=1e-8)


def test_sfft_planar():
    data = create_data(7, 101)
    half = bd.to_real_time_vec(data).plain_sfft()
    back = half.plain_sifft().scale(1.0 / 101)
    assert_vector_eq(back.to_numpy(), data, tol=1e-6)


def test_matrix_planar():
    data = create_complex_data(9, 2 * 64).reshape(2, 64)
    mat = bd.to_complex_time_mat(data)
    assert _planar.is_planar(mat._data)
    mag = mat.fft().magnitude()
    expected = np.abs(np.fft.fftshift(np.fft.fft(data, axis=-1), axes=-1))
    assert_vector_eq(mag.to_numpy(), expected, tol=1e-6 * expected.max())
    sums = mat.sum()
    np.testing.assert_allclose(np.asarray(sums), data.sum(axis=-1),
                               rtol=1e-7 * TOL_SCALE)


def test_mixed_mode_interop():
    """A planar vector convolved with a non-planar kernel works (unwrap is
    per-argument)."""
    v, data = cvec(50)
    _planar.set_planar_complex(False)
    h = bd.to_complex_time_vec(create_complex_data(3, 5))
    _planar.set_planar_complex(True)
    out = v.convolve_signal(h)
    assert out.points() == 50


def test_smaller_ops_planar():
    """add/sub/mul/div_smaller tile through the funnel — eager jnp.tile on
    PlanarComplex used to raise (advisor r1 #1)."""
    v, data = cvec(64)
    w, other = cvec(16, seed=3)
    tiled = np.tile(other, 4)
    assert_vector_eq(v.add_smaller(w).to_numpy(), data + tiled, tol=1e-9)
    assert_vector_eq(v.sub_smaller(w).to_numpy(), data - tiled, tol=1e-9)
    assert_vector_eq(v.mul_smaller(w).to_numpy(), data * tiled, tol=1e-9)
    assert_vector_eq(v.div_smaller(w).to_numpy(), data / tiled, tol=1e-7)


def test_rededicate_planar():
    """complex<->real interleave reinterpretation inside the funnel
    (advisor r1 #2)."""
    v, data = cvec(32)
    r = v.rededicate_to(bd.NumberSpace.REAL, bd.DataDomain.TIME)
    assert not r.is_complex()
    inter = np.empty(64, dtype=np.float64)
    inter[0::2], inter[1::2] = data.real, data.imag
    assert_vector_eq(r.to_numpy(), inter, tol=1e-9)
    back = r.rededicate_to(bd.NumberSpace.COMPLEX, bd.DataDomain.TIME)
    assert back.is_complex() and _planar.is_planar(back._data)
    assert_vector_eq(back.to_numpy(), data, tol=1e-9)


def test_set_mag_phase_planar():
    """set_mag_phase via the funnel — eager complex exp used to escape the
    planar invariant (advisor r1 #3)."""
    v, data = cvec(48)
    mag, phase = v.magnitude(), v.phase()
    rebuilt = v.set_mag_phase(mag, phase)
    assert _planar.is_planar(rebuilt._data)
    assert_vector_eq(rebuilt.to_numpy(), data, tol=1e-7)


def test_interleave_freq_constructor_planar():
    re = create_data(11, 24)
    im = create_data(12, 24)
    v = bd.interleave_to_complex_freq_vec(re, im)
    assert _planar.is_planar(v._data)
    assert_vector_eq(v.to_numpy(), re + 1j * im, tol=1e-9)


def test_gen_erroneous_planar():
    g = bd.to_gen_dsp_vec(np.ones(4), is_complex=False)
    bad = g.conj()
    assert bad.is_erroneous()
