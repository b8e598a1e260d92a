"""Elementary ops, statistics, reorganization — goldens from reference doc
examples and inline tests (general/*.rs)."""
import numpy as np
import pytest

import basic_dsp_tpu as bd
from tools import (assert_vector_eq, create_complex_data, create_data,
                   scaled_tol)


def test_add_sub_mul_div():
    a = bd.to_real_time_vec([1.0, 2.0])
    b = bd.to_real_time_vec([10.0, 11.0])
    assert_vector_eq(a.add(b).array, [11.0, 13.0], tol=0)
    assert_vector_eq(a.sub(b).array, [-9.0, -9.0], tol=0)
    assert_vector_eq(a.mul(b).array, [10.0, 22.0], tol=0)
    c = bd.to_real_time_vec([10.0, 22.0])
    d = bd.to_real_time_vec([2.0, 11.0])
    assert_vector_eq(c.div(d).array, [5.0, 2.0], tol=0)


def test_binary_size_mismatch():
    a = bd.to_real_time_vec([1.0, 2.0])
    b = bd.to_real_time_vec([1.0, 2.0, 3.0])
    with pytest.raises(bd.DspError):
        a.add(b)


def test_binary_meta_mismatch():
    a = bd.to_real_time_vec([1.0, 2.0])
    b = bd.to_complex_time_vec(np.array([1.0 + 0j]))
    with pytest.raises(bd.DspError):
        a.add(b)


def test_smaller_ops():
    """elementary.rs:180-268 doc examples."""
    a = bd.to_real_time_vec([10.0, 11.0, 12.0, 13.0])
    b = bd.to_real_time_vec([1.0, 2.0])
    assert_vector_eq(a.add_smaller(b).array, [11.0, 13.0, 13.0, 15.0], tol=0)
    assert_vector_eq(a.sub_smaller(b).array, [9.0, 9.0, 11.0, 11.0], tol=0)
    assert_vector_eq(a.mul_smaller(b).array, [10.0, 22.0, 12.0, 26.0], tol=0)
    c = bd.to_real_time_vec([10.0, 12.0, 12.0, 14.0])
    assert_vector_eq(c.div_smaller(b).array, [10.0, 6.0, 12.0, 7.0], tol=0)


def test_scale_offset():
    v = bd.to_real_time_vec([1.0, 2.0])
    assert_vector_eq(v.scale(2.0).array, [2.0, 4.0], tol=0)
    assert_vector_eq(v.offset(2.0).array, [3.0, 4.0], tol=0)


def test_complex_scale():
    v = bd.to_complex_time_vec(np.array([1.0 + 1j, 2.0 + 2j]))
    assert_vector_eq(v.scale(2.0 + 0j).array, [2.0 + 2j, 4.0 + 4j], tol=0)


def test_abs_wrap_unwrap():
    v = bd.to_real_time_vec([1.0, -2.0])
    assert_vector_eq(v.abs().array, [1.0, 2.0], tol=0)
    v = bd.to_real_time_vec([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0])
    wrapped = v.wrap(4.0)
    assert_vector_eq(wrapped.array,
                     [1.0, 2.0, 3.0, 0.0, 1.0, 2.0, 3.0, 0.0], tol=1e-12)
    unwrapped = wrapped.unwrap(4.0)
    assert_vector_eq(unwrapped.array,
                     [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0], tol=1e-12)


def test_conj_and_mul_exp():
    v = bd.to_complex_time_vec(np.array([1 + 2j, 3 + 4j]))
    assert_vector_eq(v.conj().array, [1 - 2j, 3 - 4j], tol=0)
    out = v.multiply_complex_exponential(2.0, 3.0)
    expected = [-1.2722325 - 1.838865j, 4.6866837 - 1.7421241j]
    assert_vector_eq(out.array, expected, tol=1e-4)


def test_complex_to_real_family():
    v = bd.to_complex_time_vec(np.array([3 + 4j, -5 + 12j]))
    assert_vector_eq(v.magnitude().array, [5.0, 13.0], tol=1e-12)
    assert_vector_eq(v.magnitude_squared().array, [25.0, 169.0], tol=1e-9)
    assert_vector_eq(v.to_real().array, [3.0, -5.0], tol=0)
    assert_vector_eq(v.to_imag().array, [4.0, 12.0], tol=0)
    assert isinstance(v.magnitude(), bd.RealTimeVector)
    re, im = v.get_real_imag()
    mag, ph = v.get_mag_phase()
    rebuilt = v.set_real_imag(re, im)
    assert_vector_eq(rebuilt.array, v.array, tol=0)
    rebuilt2 = v.set_mag_phase(mag, ph)
    assert_vector_eq(rebuilt2.array, v.array, tol=1e-9)


def test_to_complex():
    v = bd.to_real_time_vec([1.0, 2.0])
    c = v.to_complex()
    assert isinstance(c, bd.ComplexTimeVector)
    assert_vector_eq(c.array, [1.0 + 0j, 2.0 + 0j], tol=0)


def test_diff_cumsum():
    v = bd.to_real_time_vec([2.0, 3.0, 2.0, 6.0])
    assert_vector_eq(v.diff().array, [1.0, -1.0, 4.0], tol=0)
    assert_vector_eq(v.diff_with_start().array, [2.0, 1.0, -1.0, 4.0], tol=0)
    w = bd.to_real_time_vec([2.0, 1.0, -1.0, 4.0])
    assert_vector_eq(w.cum_sum().array, [2.0, 3.0, 2.0, 6.0], tol=0)
    cv = bd.to_complex_time_vec(np.array([2 + 2j, 3 + 3j, 5 + 5j]))
    assert_vector_eq(cv.diff().array, [1 + 1j, 2 + 2j], tol=0)


def test_zero_pad():
    v = bd.to_complex_time_vec(np.arange(1.0, 11.0))  # 5 complex points
    assert_vector_eq(v.zero_pad(9, "end").interleaved(),
                     [1, 2, 3, 4, 5, 6, 7, 8, 9, 10] + [0.0] * 8, tol=0)
    assert_vector_eq(v.zero_pad(10, "surround").interleaved(),
                     [0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10,
                      0, 0, 0, 0], tol=0)
    assert_vector_eq(v.zero_pad(10, "center").interleaved(),
                     [1, 2, 3, 4, 5, 6, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                      7, 8, 9, 10], tol=0)


def test_zero_pad_surround_even_diff():
    """zero_pad_b_surround_odd_signal_test (data_reorganization.rs:685-698)."""
    v = bd.to_complex_time_vec(np.arange(1.0, 13.0))  # 6 complex points
    assert_vector_eq(v.zero_pad(10, "surround").interleaved(),
                     [0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12,
                      0, 0, 0, 0], tol=0)


def test_zero_interleave():
    v = bd.to_real_time_vec([1.0, 2.0, 3.0, 4.0, 5.0])
    assert_vector_eq(v.zero_interleave(2).array,
                     [1, 0, 2, 0, 3, 0, 4, 0, 5, 0], tol=0)
    c = bd.to_complex_time_vec(np.array([1.0, 2.0, 3.0, 4.0]))
    assert_vector_eq(c.zero_interleave(2).interleaved(),
                     [1, 2, 0, 0, 3, 4, 0, 0], tol=0)


def test_split_merge():
    v = bd.to_real_time_vec(np.arange(1.0, 11.0))
    parts = v.split_into(2)
    assert_vector_eq(parts[0].array, [1, 3, 5, 7, 9], tol=0)
    assert_vector_eq(parts[1].array, [2, 4, 6, 8, 10], tol=0)
    merged = parts[0].merge(parts)
    assert_vector_eq(merged.array, np.arange(1.0, 11.0), tol=0)


def test_reverse():
    v = bd.to_real_time_vec(np.arange(1.0, 9.0))
    assert_vector_eq(v.reverse().array, np.arange(8.0, 0.0, -1.0), tol=0)
    c = bd.to_complex_time_vec(np.array([1 + 2j, 3 + 4j]))
    assert_vector_eq(c.reverse().array, [3 + 4j, 1 + 2j], tol=0)


def test_statistics_real():
    data = create_data(1, 1000)
    stats = bd.to_real_time_vec(data).statistics()
    assert stats.count == 1000
    assert abs(stats.sum - data.sum()) < scaled_tol(1e-6)
    assert abs(stats.average - data.mean()) < scaled_tol(1e-9)
    assert abs(stats.rms - np.sqrt((data ** 2).mean())) < scaled_tol(1e-9)
    assert stats.min == data.min() and stats.min_index == data.argmin()
    assert stats.max == data.max() and stats.max_index == data.argmax()


def test_statistics_complex():
    """statistics.rs doc example (statistics.rs:47-65)."""
    v = bd.to_complex_time_vec(np.array([1 + 2j, 3 + 4j, 5 + 6j]))
    s = v.statistics()
    assert s.sum == 9 + 12j
    assert s.count == 3
    assert s.average == 3 + 4j
    assert abs(s.rms - (3.4027193 + 4.3102784j)) < 1e-4
    assert s.min == 1 + 2j and s.min_index == 0
    assert s.max == 5 + 6j and s.max_index == 2


def test_statistics_split():
    """statistics.rs:81-93 doc example."""
    v = bd.to_complex_time_vec(np.array([1 + 2j, 3 + 4j, 5 + 6j]))
    result = v.statistics_split(2)
    assert result[0].sum == 6 + 8j
    assert result[1].sum == 3 + 4j


def test_sum_and_sum_sq():
    v = bd.to_complex_time_vec(np.array([1 + 2j, 3 + 4j, 5 + 6j]))
    assert v.sum() == 9 + 12j
    assert v.sum_sq() == -21 + 88j


def test_dot_product():
    a = bd.to_real_time_vec([1.0, 2.0, 3.0])
    b = bd.to_real_time_vec([4.0, 5.0, 6.0])
    assert a.dot_product(b) == 32.0
    ca = bd.to_complex_time_vec(np.array([1 + 1j, 2 + 2j]))
    cb = bd.to_complex_time_vec(np.array([3 + 1j, 4 + 2j]))
    # Reference multiplies pairs without conjugation.
    expected = (1 + 1j) * (3 + 1j) + (2 + 2j) * (4 + 2j)
    assert ca.dot_product(cb) == expected


def test_prec_ops():
    data = create_data(2, 10000, dtype=np.float32)
    v = bd.to_real_time_vec(data)
    assert abs(v.sum_prec() - np.sum(data.astype(np.float64))) < 1e-3
    s = v.statistics_prec()
    assert abs(s.average - data.astype(np.float64).mean()) < 1e-6


def test_trig_and_powers():
    data = create_data(3, 100) * 0.1
    v = bd.to_real_time_vec(data)
    assert_vector_eq(v.sin().array, np.sin(data), tol=1e-12)
    assert_vector_eq(v.cos().array, np.cos(data), tol=1e-12)
    assert_vector_eq(v.tan().array, np.tan(data), tol=1e-10)
    assert_vector_eq(v.square().array, data * data, tol=1e-12)
    p = bd.to_real_time_vec(np.abs(data) + 1.0)
    assert_vector_eq(p.sqrt().array, np.sqrt(np.abs(data) + 1.0), tol=1e-12)
    assert_vector_eq(p.ln().array, np.log(np.abs(data) + 1.0), tol=1e-12)
    assert_vector_eq(p.log(10.0).array, np.log10(np.abs(data) + 1.0),
                     tol=1e-12)
    assert_vector_eq(p.root(3.0).array, (np.abs(data) + 1.0) ** (1 / 3),
                     tol=1e-12)


def test_complex_trig():
    data = create_complex_data(4, 50) * 0.1
    v = bd.to_complex_time_vec(data)
    assert_vector_eq(v.sin().array, np.sin(data), tol=1e-9)
    assert_vector_eq(v.exp().array, np.exp(data), tol=1e-9)
    assert_vector_eq(v.sqrt().array, np.sqrt(data), tol=1e-9)


def test_approx_ops():
    """Cephes-polynomial fast-math family (ops/approx_ops.py): sse_mathfun
    accuracy grade (~1e-6 relative on the valid range), and genuinely a
    different evaluation than the exact path (the reference's approx
    functions are distinct SIMD polynomials, approximations.rs)."""
    data = np.abs(create_data(5, 1000)) + 1.0
    v = bd.to_real_time_vec(data)
    assert_vector_eq(v.ln_approx().array, np.log(data), tol=1e-5)
    w = bd.to_real_time_vec(create_data(6, 1000))
    assert_vector_eq(w.exp_approx().array, np.exp(np.asarray(w.array)),
                     tol=1e-4 * float(np.exp(np.asarray(w.array)).max()))
    assert_vector_eq(w.sin_approx().array, np.sin(np.asarray(w.array)),
                     tol=2e-6)
    assert_vector_eq(w.cos_approx().array, np.cos(np.asarray(w.array)),
                     tol=2e-6)
    assert_vector_eq(v.log_approx(10.0).array, np.log10(data), tol=1e-5)
    assert_vector_eq(v.powf_approx(1.5).array, data ** 1.5,
                     tol=1e-4 * float((data ** 1.5).max()))
    assert_vector_eq(w.expf_approx(2.0).array,
                     2.0 ** np.asarray(w.array),
                     tol=1e-4 * float((2.0 ** np.asarray(w.array)).max()))
    # Not vacuous: the polynomial path must differ from the exact path
    # somewhere (bitwise), like the reference's separate SIMD evaluators.
    exact = np.sin(np.asarray(w.array, dtype=np.float32))
    approx = np.asarray(w.sin_approx().array, dtype=np.float32)
    assert np.any(exact != approx)


def test_map_inplace_and_aggregate():
    v = bd.to_real_time_vec([1.0, 2.0, 3.0])
    out = v.map_inplace(lambda x, i, arg: x * i + arg, argument=1.0)
    assert_vector_eq(out.array, [1.0, 3.0, 7.0], tol=0)
    total = v.map_aggregate(lambda x, i, arg: x * 2, lambda m: float(m.sum()))
    assert total == 12.0


def test_rededicate():
    c = bd.to_complex_time_vec(np.array([1 + 2j, 3 + 4j]))
    r = c.rededicate_to(bd.NumberSpace.REAL, bd.DataDomain.TIME)
    assert isinstance(r, bd.RealTimeVector)
    assert_vector_eq(r.array, [1.0, 2.0, 3.0, 4.0], tol=0)
    back = r.rededicate_to(bd.NumberSpace.COMPLEX, bd.DataDomain.FREQUENCY)
    assert isinstance(back, bd.ComplexFreqVector)
    assert_vector_eq(back.array, [1 + 2j, 3 + 4j], tol=0)


def test_gen_vector_erroneous_protocol():
    """Operations on wrong-flavor Gen vectors mark erroneous instead of
    raising (vector_types/mod.rs:213-229)."""
    v = bd.to_gen_dsp_vec([1.0, 2.0], is_complex=False)
    out = v.conj()  # complex-only op on real data
    assert out.is_erroneous()
    assert len(out) == 0


def test_resize():
    v = bd.to_real_time_vec([1.0, 2.0, 3.0, 4.0])
    assert_vector_eq(v.resize(2).array, [1.0, 2.0], tol=0)
    assert_vector_eq(v.resize(6).array, [1, 2, 3, 4, 0, 0], tol=0)


def test_parity_aliases():
    v = bd.to_complex_time_vec(np.array([3 + 4j, 1 + 0j]))
    assert_vector_eq(v.magnitude_b().array, [5.0, 1.0], tol=0)
    assert_vector_eq(v.to_real_b().array, [3.0, 1.0], tol=0)
    assert v.set_delta(0.5).delta() == 0.5
    delta, domain, space = v.get_meta_data()
    assert domain == bd.DataDomain.TIME
    r = v.rededicate(bd.NumberSpace.REAL, bd.DataDomain.TIME)
    assert isinstance(r, bd.RealTimeVector)


def test_apply_linear_phase_is_delay():
    """Linear phase in frequency domain == circular time shift."""
    data = create_complex_data(1, 32)
    v = bd.to_complex_time_vec(data)
    shifted = v.plain_fft().apply_linear_phase(-3.0).plain_ifft().scale(1 / 32)
    assert_vector_eq(shifted.array, np.roll(data, 3), tol=1e-8)


def test_merge_stats_and_cols():
    """Partial-merge semantics (statistics.rs:211-250) — the cross-shard
    reduction path."""
    data = create_data(7, 1000)
    parts = [bd.to_real_time_vec(data[:300]).statistics(),
             bd.to_real_time_vec(data[300:]).statistics()]
    # Fix indices to be global before merging (partials are per-chunk).
    parts[1].min_index += 300
    parts[1].max_index += 300
    merged = bd.merge_stats(parts)
    full = bd.to_real_time_vec(data).statistics()
    assert merged.count == 1000
    assert abs(merged.sum - full.sum) < scaled_tol(1e-9)
    assert abs(merged.rms - full.rms) < scaled_tol(1e-9)
    assert merged.min == full.min and merged.min_index == full.min_index
    # Column-wise merge for split statistics.
    s1 = bd.to_real_time_vec(data[:300]).statistics_split(3)
    cols = bd.merge_stats_cols([s1, s1])
    assert cols[0].count == 2 * s1[0].count
    assert bd.Statistics.empty().count == 0
