"""Per-op agreement against hand-written references over seeded random
data — the structure of reference tests/real_test.rs and complex_test.rs
(e.g. real_add, real_test.rs:11-43), run across the single-path and
blocked-path size regimes."""
import numpy as np
import pytest

import basic_dsp_tpu as bd
from tools import assert_vector_eq, create_complex_data, create_data

SIZES = [1001, 50_000]


@pytest.mark.parametrize("n", SIZES)
def test_real_trig_family(n):
    data = create_data(n, n) * 0.1
    v = bd.to_real_time_vec(data)
    for name, ref in [("sin", np.sin), ("cos", np.cos), ("tan", np.tan),
                      ("sinh", np.sinh), ("cosh", np.cosh),
                      ("tanh", np.tanh), ("atan", np.arctan),
                      ("asinh", np.arcsinh)]:
        assert_vector_eq(getattr(v, name)().array, ref(data), tol=1e-9,
                         msg=name)
    clipped = np.clip(data, -0.99, 0.99)
    vc = bd.to_real_time_vec(clipped)
    assert_vector_eq(vc.asin().array, np.arcsin(clipped), tol=1e-9)
    assert_vector_eq(vc.acos().array, np.arccos(clipped), tol=1e-9)
    assert_vector_eq(vc.atanh().array, np.arctanh(clipped), tol=1e-7)


@pytest.mark.parametrize("n", SIZES)
def test_real_power_family(n):
    data = np.abs(create_data(n, n)) + 0.5
    v = bd.to_real_time_vec(data)
    assert_vector_eq(v.sqrt().array, np.sqrt(data), tol=1e-9)
    assert_vector_eq(v.square().array, data * data, tol=1e-7)
    assert_vector_eq(v.ln().array, np.log(data), tol=1e-9)
    assert_vector_eq(v.exp().array, np.exp(data), tol=1e-6)
    assert_vector_eq(v.root(3.0).array, data ** (1 / 3), tol=1e-9)
    assert_vector_eq(v.powf(2.5).array, data ** 2.5, tol=1e-6)
    assert_vector_eq(v.log(10.0).array, np.log10(data), tol=1e-9)
    assert_vector_eq(v.expf(2.0).array, 2.0 ** data, tol=1e-6)


@pytest.mark.parametrize("n", SIZES)
def test_complex_elementary_vs_reference(n):
    a = create_complex_data(n, n)
    b = create_complex_data(n + 1, n)
    va, vb = bd.to_complex_time_vec(a), bd.to_complex_time_vec(b)
    assert_vector_eq(va.add(vb).array, a + b, tol=1e-12)
    assert_vector_eq(va.mul(vb).array, a * b, tol=1e-9)
    assert_vector_eq(va.div(vb).array, a / b, tol=1e-9)
    assert_vector_eq(va.conj().array, np.conj(a), tol=0)
    assert_vector_eq(va.magnitude().array, np.abs(a), tol=1e-9)
    assert_vector_eq(va.phase().array, np.angle(a), tol=1e-12)


@pytest.mark.parametrize("n", SIZES)
def test_complex_sum_and_stats_vs_reference(n):
    a = create_complex_data(n, n)
    v = bd.to_complex_time_vec(a)
    assert abs(v.sum() - a.sum()) < 1e-6 * n
    assert abs(v.sum_sq() - (a * a).sum()) < 1e-6 * n
    s = v.statistics()
    norms = np.abs(a)
    assert s.min_index == norms.argmin()
    assert s.max_index == norms.argmax()


@pytest.mark.parametrize("n", [1001, 4097])
def test_real_fft_family_vs_numpy(n):
    """real_fft_test32 structure (tests/real_test.rs:581-605).  f64 data:
    the reference's absolute 1e-10 conj-symmetry gate on bin 0
    (freq_to_time.rs:204-213) is tighter than f32 FFT noise at larger n —
    a faithful parity quirk."""
    data = create_data(n, n)
    half = bd.to_real_time_vec(data).plain_sfft()
    np_half = np.fft.fft(data)[: n // 2 + 1]
    assert_vector_eq(half.array, np_half, tol=np.abs(np_half).max() * 1e-5)
    back = half.plain_sifft().scale(1.0 / n)
    assert_vector_eq(back.array, data, tol=1e-3)


def test_setitem_mutation_parity():
    """Reference FloatIndexMut/ComplexIndexMut
    (vec_impl_and_indexers.rs:16-64): single-sample writes."""
    v = bd.to_real_time_vec(np.arange(8, dtype=np.float32))
    v[3] = 99.0
    assert v[3] == 99.0 and v[2] == 2.0
    v[1:3] = np.asarray([7.0, 8.0], np.float32)
    assert v[1] == 7.0 and v[2] == 8.0

    c = bd.to_complex_time_vec(np.arange(4).astype(np.complex64))
    c[2] = 1 - 2j
    assert c[2] == 1 - 2j
    c[0] = 5
    assert c[0] == 5 + 0j

    m = bd.to_real_time_mat(np.zeros((3, 4), np.float32))
    m[1, 2] = 5.0
    assert m[1, 2] == 5.0 and m[0, 0] == 0.0

    import pytest
    with pytest.raises(TypeError):
        v[np.array([1, 2])] = 0.0
