"""C ABI interop tests — drives libbasic_dsp_tpu.so via ctypes, mirroring
the reference's ctypes consumer (examples/basic_dsp_example.py) and its
error-code contract (interop/src/lib.rs:107-141)."""
import ctypes
import os
import subprocess

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
LIB = os.path.join(REPO, "interop", "build", "libbasic_dsp_tpu.so")


class VectorResult(ctypes.Structure):
    _fields_ = [("result_code", ctypes.c_int32),
                ("vector", ctypes.c_void_p)]


class ScalarResult(ctypes.Structure):
    _fields_ = [("result_code", ctypes.c_int32),
                ("result", ctypes.c_double)]


class ComplexResult(ctypes.Structure):
    _fields_ = [("result_code", ctypes.c_int32),
                ("real", ctypes.c_double),
                ("imag", ctypes.c_double)]


class RealStatistics(ctypes.Structure):
    _fields_ = [("sum", ctypes.c_double), ("count", ctypes.c_uint64),
                ("average", ctypes.c_double), ("rms", ctypes.c_double),
                ("min", ctypes.c_double), ("min_index", ctypes.c_uint64),
                ("max", ctypes.c_double), ("max_index", ctypes.c_uint64)]


def _build_if_needed():
    if os.path.exists(LIB):
        return True
    build = os.path.join(REPO, "interop", "build")
    os.makedirs(build, exist_ok=True)
    try:
        subprocess.run(["cmake", "-G", "Ninja", ".."], cwd=build, check=True,
                       capture_output=True)
        subprocess.run(["ninja"], cwd=build, check=True, capture_output=True)
    except Exception:
        return False
    return os.path.exists(LIB)


@pytest.fixture(scope="module")
def lib():
    if not _build_if_needed():
        pytest.skip("interop library not built and cmake/ninja unavailable")
    lib = ctypes.CDLL(LIB)
    lib.bdsp_init.restype = ctypes.c_int32
    assert lib.bdsp_init() == 0, "bdsp_init failed"

    lib.new64.restype = ctypes.c_void_p
    lib.new64.argtypes = [ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
                          ctypes.c_size_t, ctypes.c_double]
    lib.from_data64.restype = ctypes.c_void_p
    lib.from_data64.argtypes = [ctypes.c_int32, ctypes.c_int32,
                                ctypes.c_double,
                                ctypes.POINTER(ctypes.c_double),
                                ctypes.c_size_t]
    lib.get_value64.restype = ctypes.c_double
    lib.get_value64.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    lib.get_points64.restype = ctypes.c_size_t
    lib.get_points64.argtypes = [ctypes.c_void_p]
    lib.get_delta64.restype = ctypes.c_double
    lib.get_delta64.argtypes = [ctypes.c_void_p]
    lib.is_complex64.restype = ctypes.c_int32
    lib.is_complex64.argtypes = [ctypes.c_void_p]
    lib.get_data64.restype = ctypes.c_int32
    lib.get_data64.argtypes = [ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_double),
                               ctypes.c_size_t]
    for name in ["real_offset64", "real_scale64", "sin64", "fft64", "ifft64",
                 "to_complex64", "magnitude64", "abs64"]:
        fn = getattr(lib, name)
        fn.restype = VectorResult
    lib.real_offset64.argtypes = [ctypes.c_void_p, ctypes.c_double]
    lib.real_scale64.argtypes = [ctypes.c_void_p, ctypes.c_double]
    lib.sin64.argtypes = [ctypes.c_void_p]
    lib.fft64.argtypes = [ctypes.c_void_p]
    lib.ifft64.argtypes = [ctypes.c_void_p]
    lib.to_complex64.argtypes = [ctypes.c_void_p]
    lib.magnitude64.argtypes = [ctypes.c_void_p]
    lib.abs64.argtypes = [ctypes.c_void_p]
    lib.add64.restype = VectorResult
    lib.add64.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.convolve_signal64.restype = VectorResult
    lib.convolve_signal64.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.real_sum64.restype = ScalarResult
    lib.real_sum64.argtypes = [ctypes.c_void_p]
    lib.real_statistics64.restype = ctypes.c_int32
    lib.real_statistics64.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(RealStatistics)]
    lib.delete_vector64.argtypes = [ctypes.c_void_p]
    return lib


def make_vec(lib, data, is_complex=0, domain=0, delta=1.0):
    arr = np.ascontiguousarray(data, dtype=np.float64)
    ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    return lib.from_data64(is_complex, domain, delta, ptr, arr.size)


def read_vec(lib, handle, n):
    out = np.zeros(n, dtype=np.float64)
    got = lib.get_data64(handle, out.ctypes.data_as(
        ctypes.POINTER(ctypes.c_double)), n)
    return out[:got]


def test_new_offset_reference_example(lib):
    """Mirrors examples/basic_dsp_example.py: new + repeated offset."""
    vec = lib.new64(0, 0, 0.0, 1000, 1.0)
    assert lib.get_value64(vec, 0) == 0.0
    for _ in range(5):
        res = lib.real_offset64(vec, 5.0)
        assert res.result_code == 0
        vec = res.vector
    assert lib.get_value64(vec, 0) == 25.0
    lib.delete_vector64(vec)


def test_sin_and_sum(lib):
    vec = make_vec(lib, [0.0, np.pi / 2, np.pi])
    res = lib.sin64(vec)
    assert res.result_code == 0
    data = read_vec(lib, res.vector, 3)
    np.testing.assert_allclose(data, [0.0, 1.0, 0.0], atol=1e-12)
    s = lib.real_sum64(res.vector)
    assert s.result_code == 0
    assert abs(s.result - 1.0) < 1e-12
    lib.delete_vector64(res.vector)


def test_fft_roundtrip(lib):
    rng = np.random.default_rng(0)
    inter = rng.normal(size=32)  # 16 complex points interleaved
    vec = make_vec(lib, inter, is_complex=1)
    assert lib.is_complex64(vec) == 1
    assert lib.get_points64(vec) == 16
    res = lib.fft64(vec)
    assert res.result_code == 0
    res = lib.ifft64(res.vector)
    assert res.result_code == 0
    back = read_vec(lib, res.vector, 32)
    np.testing.assert_allclose(back, inter, atol=1e-9)
    lib.delete_vector64(res.vector)


def test_error_code_on_wrong_flavor(lib):
    # The C ABI operates on runtime-typed (Gen) vectors; wrong-flavor ops
    # follow the erroneous-marker protocol and report -1, matching the
    # reference's get_error_marker (interop/src/lib.rs:144-151).
    vec = make_vec(lib, [1.0, 2.0])
    res = lib.magnitude64(vec)
    assert res.result_code == -1
    lib.delete_vector64(res.vector)


def test_add_and_statistics(lib):
    a = make_vec(lib, [1.0, 2.0, 3.0])
    b = make_vec(lib, [10.0, 20.0, 30.0])
    res = lib.add64(a, b)
    assert res.result_code == 0
    np.testing.assert_allclose(read_vec(lib, res.vector, 3),
                               [11.0, 22.0, 33.0])
    stats = RealStatistics()
    assert lib.real_statistics64(res.vector, ctypes.byref(stats)) == 0
    assert stats.sum == 66.0
    assert stats.count == 3
    assert stats.max == 33.0 and stats.max_index == 2
    lib.delete_vector64(res.vector)
    lib.delete_vector64(b)


def test_convolution_via_c_abi(lib):
    x = np.arange(10.0)
    inter_x = np.zeros(20)
    inter_x[0::2] = x
    h = np.zeros(6)
    h[4] = 1.0  # complex kernel [0, 0, 1] interleaved
    a = make_vec(lib, inter_x, is_complex=1)
    b = make_vec(lib, h, is_complex=1)
    res = lib.convolve_signal64(a, b)
    assert res.result_code == 0
    mag = lib.magnitude64(res.vector)
    assert mag.result_code == 0
    out = read_vec(lib, mag.vector, 10)
    np.testing.assert_allclose(out, [9, 0, 1, 2, 3, 4, 5, 6, 7, 8],
                               atol=1e-6)
    lib.delete_vector64(mag.vector)
    lib.delete_vector64(b)


MAP_CB = ctypes.CFUNCTYPE(ctypes.c_double, ctypes.c_double, ctypes.c_size_t,
                          ctypes.c_void_p)


def test_getters_and_set_real_imag(lib):
    lib.get_real64.restype = ctypes.c_void_p
    lib.get_real64.argtypes = [ctypes.c_void_p]
    lib.get_imag64.restype = ctypes.c_void_p
    lib.get_imag64.argtypes = [ctypes.c_void_p]
    lib.set_real_imag64.restype = VectorResult
    lib.set_real_imag64.argtypes = [ctypes.c_void_p] * 3
    inter = np.array([1.0, 2.0, 3.0, 4.0])
    v = make_vec(lib, inter, is_complex=1)
    re = lib.get_real64(v)
    im = lib.get_imag64(v)
    np.testing.assert_allclose(read_vec(lib, re, 2), [1.0, 3.0])
    np.testing.assert_allclose(read_vec(lib, im, 2), [2.0, 4.0])
    res = lib.set_real_imag64(v, im, re)  # swapped
    assert res.result_code == 0
    np.testing.assert_allclose(read_vec(lib, res.vector, 4),
                               [2.0, 1.0, 4.0, 3.0])
    lib.delete_vector64(res.vector)
    lib.delete_vector64(re)
    lib.delete_vector64(im)


def test_split_merge_c_abi(lib):
    lib.split_into64.restype = ctypes.c_int32
    lib.split_into64.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_void_p),
                                 ctypes.c_size_t]
    lib.merge64.restype = VectorResult
    lib.merge64.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_void_p), ctypes.c_size_t]
    v = make_vec(lib, np.arange(1.0, 11.0))
    targets = (ctypes.c_void_p * 2)()
    assert lib.split_into64(v, targets, 2) == 0
    np.testing.assert_allclose(read_vec(lib, targets[0], 5), [1, 3, 5, 7, 9])
    res = lib.merge64(targets[0], targets, 2)
    assert res.result_code == 0
    np.testing.assert_allclose(read_vec(lib, res.vector, 10),
                               np.arange(1.0, 11.0))
    lib.delete_vector64(res.vector)
    lib.delete_vector64(targets[1])
    lib.delete_vector64(v)


def test_map_inplace_c_callback(lib):
    lib.map_inplace_real64.restype = VectorResult
    lib.map_inplace_real64.argtypes = [ctypes.c_void_p, MAP_CB,
                                       ctypes.c_void_p]
    lib.map_aggregate_real64.restype = ScalarResult
    lib.map_aggregate_real64.argtypes = [ctypes.c_void_p, MAP_CB,
                                         ctypes.c_void_p]
    cb = MAP_CB(lambda value, idx, _: value * idx + 1.0)
    v = make_vec(lib, [1.0, 2.0, 3.0])
    res = lib.map_inplace_real64(v, cb, None)
    assert res.result_code == 0
    np.testing.assert_allclose(read_vec(lib, res.vector, 3), [1.0, 3.0, 7.0])
    agg = lib.map_aggregate_real64(res.vector, MAP_CB(
        lambda value, idx, _: value * 2.0), None)
    assert agg.result_code == 0
    assert agg.result == 22.0
    lib.delete_vector64(res.vector)


def test_statistics_split_c_abi(lib):
    lib.real_statistics_split64.restype = ctypes.c_int32
    lib.real_statistics_split64.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.POINTER(RealStatistics)]
    v = make_vec(lib, [1.0, 10.0, 2.0, 20.0, 3.0, 30.0])
    out = (RealStatistics * 2)()
    assert lib.real_statistics_split64(v, 2, out) == 2
    assert out[0].sum == 6.0
    assert out[1].sum == 60.0
    lib.delete_vector64(v)


def test_prec_reductions_c_abi(lib):
    lib.real_sum_prec64.restype = ScalarResult
    lib.real_sum_prec64.argtypes = [ctypes.c_void_p]
    data = np.random.default_rng(0).uniform(-10, 10, 10000)
    v = make_vec(lib, data)
    s = lib.real_sum_prec64(v)
    assert s.result_code == 0
    assert abs(s.result - data.sum()) < 1e-9
    lib.delete_vector64(v)


WINDOW_CB = ctypes.CFUNCTYPE(ctypes.c_double, ctypes.c_void_p,
                             ctypes.c_size_t, ctypes.c_size_t)
CONV_CB = ctypes.CFUNCTYPE(ctypes.c_double, ctypes.c_void_p, ctypes.c_double)


def test_apply_custom_window_c_callback(lib):
    lib.apply_custom_window64.restype = VectorResult
    lib.apply_custom_window64.argtypes = [ctypes.c_void_p, WINDOW_CB,
                                          ctypes.c_void_p, ctypes.c_int32]
    cb = WINDOW_CB(lambda data, n, points: float(n + 1))
    v = make_vec(lib, [1.0, 2.0, 3.0])
    res = lib.apply_custom_window64(v, cb, None, 1)
    assert res.result_code == 0
    np.testing.assert_allclose(read_vec(lib, res.vector, 3),
                               [1.0, 4.0, 9.0])
    lib.delete_vector64(res.vector)


def test_convolve_custom_c_callback(lib):
    lib.convolve_custom64.restype = VectorResult
    lib.convolve_custom64.argtypes = [ctypes.c_void_p, CONV_CB,
                                      ctypes.c_void_p, ctypes.c_int32,
                                      ctypes.c_double, ctypes.c_size_t]
    # Triangle impulse response via C callback.
    cb = CONV_CB(lambda data, x: max(0.0, 1.0 - abs(x)))
    data = np.zeros(16)
    data[8] = 1.0
    v = make_vec(lib, data)
    res = lib.convolve_custom64(v, cb, None, 1, 0.5, 3)
    assert res.result_code == 0
    out = read_vec(lib, res.vector, 16)
    expected = np.zeros(16)
    expected[6:11] = [0, 0.5, 1.0, 0.5, 0]
    np.testing.assert_allclose(out, expected, atol=1e-9)
    lib.delete_vector64(res.vector)


class ComplexStatistics(ctypes.Structure):
    _fields_ = [("sum_re", ctypes.c_double), ("sum_im", ctypes.c_double),
                ("count", ctypes.c_uint64),
                ("average_re", ctypes.c_double),
                ("average_im", ctypes.c_double),
                ("rms_re", ctypes.c_double), ("rms_im", ctypes.c_double),
                ("min_re", ctypes.c_double), ("min_im", ctypes.c_double),
                ("min_index", ctypes.c_uint64),
                ("max_re", ctypes.c_double), ("max_im", ctypes.c_double),
                ("max_index", ctypes.c_uint64)]


# Callbacks returning the BdspComplex struct by value need cffi — ctypes
# cannot build callbacks with struct result types.
@pytest.fixture(scope="module")
def cffi_lib(lib):
    cffi = pytest.importorskip("cffi")
    ffi = cffi.FFI()
    ffi.cdef("""
    typedef struct { int32_t result_code; void *vector; } VectorResult;
    typedef struct { int32_t result_code; double real; double imag; }
        ComplexResult;
    typedef struct { double re, im; } BdspComplex;
    typedef BdspComplex (*bdsp_map_complex_fn)(double, double, size_t,
                                               const void *);
    typedef BdspComplex (*bdsp_agg_complex_fn)(BdspComplex, BdspComplex,
                                               const void *);
    typedef BdspComplex (*bdsp_conv_complex_fn)(const void *, double);
    VectorResult map_inplace_complex64(void *, bdsp_map_complex_fn,
                                       const void *);
    ComplexResult map_aggregate_complex64(void *, bdsp_map_complex_fn,
                                          bdsp_agg_complex_fn, const void *);
    VectorResult convolve_complex64(void *, bdsp_conv_complex_fn,
                                    const void *, int32_t, double, size_t);
    """)
    return ffi, ffi.dlopen(LIB)


def test_raw_data_access(lib):
    """data64/complex_data64 raw pointers + get_allocated_len64."""
    lib.data64.restype = ctypes.POINTER(ctypes.c_double)
    lib.data64.argtypes = [ctypes.c_void_p]
    lib.complex_data64.restype = ctypes.POINTER(ctypes.c_double)
    lib.complex_data64.argtypes = [ctypes.c_void_p]
    lib.get_allocated_len64.restype = ctypes.c_size_t
    lib.get_allocated_len64.argtypes = [ctypes.c_void_p]
    v = make_vec(lib, [1.0, 2.0, 3.0])
    p = lib.data64(v)
    assert [p[i] for i in range(3)] == [1.0, 2.0, 3.0]
    assert lib.get_allocated_len64(v) == 3
    c = make_vec(lib, [1.0, 2.0, 3.0, 4.0], is_complex=1)
    pc = lib.complex_data64(c)  # interleaved re,im pairs
    assert [pc[i] for i in range(4)] == [1.0, 2.0, 3.0, 4.0]
    lib.delete_vector64(v)
    lib.delete_vector64(c)


def test_overwrite_data_and_set_len(lib):
    lib.overwrite_data64.restype = VectorResult
    lib.overwrite_data64.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_double),
                                     ctypes.c_size_t]
    lib.set_len64.restype = VectorResult
    lib.set_len64.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    v = make_vec(lib, [1.0, 2.0, 3.0])
    new = np.array([9.0, 8.0, 7.0, 6.0])
    res = lib.overwrite_data64(
        v, new.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), 4)
    assert res.result_code == 0
    np.testing.assert_allclose(read_vec(lib, res.vector, 4), new)
    res = lib.set_len64(res.vector, 2)
    assert res.result_code == 0
    assert lib.get_points64(res.vector) == 2
    np.testing.assert_allclose(read_vec(lib, res.vector, 2), [9.0, 8.0])
    lib.delete_vector64(res.vector)


def test_new_with_performance_options(lib):
    """Threading knobs accepted for parity (XLA owns scheduling)."""
    lib.new_with_performance_options64.restype = ctypes.c_void_p
    lib.new_with_performance_options64.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_double, ctypes.c_size_t,
        ctypes.c_double, ctypes.c_size_t]
    lib.new_with_detailed_performance_options64.restype = ctypes.c_void_p
    lib.new_with_detailed_performance_options64.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_double, ctypes.c_size_t,
        ctypes.c_double] + [ctypes.c_size_t] * 5
    v = lib.new_with_performance_options64(0, 0, 2.0, 8, 1.0, 4)
    assert lib.get_points64(v) == 8
    assert lib.get_value64(v, 0) == 2.0
    w = lib.new_with_detailed_performance_options64(
        0, 0, 3.0, 4, 1.0, 4, 1000, 2000, 3000, 4000)
    assert lib.get_value64(w, 0) == 3.0
    lib.delete_vector64(v)
    lib.delete_vector64(w)


def test_pair_getters(lib):
    lib.get_real_imag64.restype = ctypes.c_int32
    lib.get_real_imag64.argtypes = [ctypes.c_void_p] * 3
    lib.get_mag_phase64.restype = ctypes.c_int32
    lib.get_mag_phase64.argtypes = [ctypes.c_void_p] * 3
    v = make_vec(lib, [3.0, 4.0, 0.0, 2.0], is_complex=1)
    re = lib.new64(0, 0, 0.0, 1, 1.0)
    im = lib.new64(0, 0, 0.0, 1, 1.0)
    assert lib.get_real_imag64(v, re, im) == 0
    np.testing.assert_allclose(read_vec(lib, re, 2), [3.0, 0.0])
    np.testing.assert_allclose(read_vec(lib, im, 2), [4.0, 2.0])
    mag = lib.new64(0, 0, 0.0, 1, 1.0)
    ph = lib.new64(0, 0, 0.0, 1, 1.0)
    assert lib.get_mag_phase64(v, mag, ph) == 0
    np.testing.assert_allclose(read_vec(lib, mag, 2), [5.0, 2.0])
    np.testing.assert_allclose(read_vec(lib, ph, 2),
                               [np.arctan2(4, 3), np.pi / 2])
    for h in (v, re, im, mag, ph):
        lib.delete_vector64(h)


def test_complex_divide(lib):
    lib.complex_divide64.restype = VectorResult
    lib.complex_divide64.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                     ctypes.c_double]
    v = make_vec(lib, [4.0, 2.0], is_complex=1)  # 4+2j
    res = lib.complex_divide64(v, 1.0, 1.0)      # / (1+1j) = 3 - 1j
    assert res.result_code == 0
    np.testing.assert_allclose(read_vec(lib, res.vector, 2), [3.0, -1.0],
                               atol=1e-12)
    lib.delete_vector64(res.vector)


def test_powf_expf_reference_spellings(lib):
    lib.powf64.restype = VectorResult
    lib.powf64.argtypes = [ctypes.c_void_p, ctypes.c_double]
    lib.expf64.restype = VectorResult
    lib.expf64.argtypes = [ctypes.c_void_p, ctypes.c_double]
    v = make_vec(lib, [2.0, 3.0])
    res = lib.powf64(v, 2.0)
    assert res.result_code == 0
    np.testing.assert_allclose(read_vec(lib, res.vector, 2), [4.0, 9.0])
    res = lib.expf64(res.vector, 10.0)  # 10^x
    assert res.result_code == 0
    np.testing.assert_allclose(read_vec(lib, res.vector, 2), [1e4, 1e9],
                               rtol=1e-12)
    lib.delete_vector64(res.vector)


def test_by_id_convolve_spellings(lib):
    """convolve64/multiply_frequency_response64 (reference names) equal the
    convolve_real64/..._real64 spellings."""
    lib.convolve64.restype = VectorResult
    lib.convolve64.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                               ctypes.c_double, ctypes.c_double,
                               ctypes.c_size_t]
    lib.convolve_real64.restype = VectorResult
    lib.convolve_real64.argtypes = lib.convolve64.argtypes
    data = np.zeros(16)
    data[8] = 1.0
    a = lib.convolve64(make_vec(lib, data.copy()), 1, 0.35, 0.5, 5)
    b = lib.convolve_real64(make_vec(lib, data.copy()), 1, 0.35, 0.5, 5)
    assert a.result_code == 0 and b.result_code == 0
    np.testing.assert_allclose(read_vec(lib, a.vector, 16),
                               read_vec(lib, b.vector, 16))
    lib.delete_vector64(a.vector)
    lib.delete_vector64(b.vector)
    lib.multiply_frequency_response64.restype = VectorResult
    lib.multiply_frequency_response64.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_double, ctypes.c_double]
    f = make_vec(lib, np.ones(8), is_complex=1, domain=1)
    res = lib.multiply_frequency_response64(f, 0, 0.0, 2.0)
    assert res.result_code == 0
    lib.delete_vector64(res.vector)


def test_prepare_argument_unpadded(lib):
    lib.prepare_argument64.restype = VectorResult
    lib.prepare_argument64.argtypes = [ctypes.c_void_p]
    v = make_vec(lib, [1.0, 0.0, 2.0, 0.0], is_complex=1)
    res = lib.prepare_argument64(v)
    assert res.result_code == 0
    # Unpadded: stays at 2 points (padded variant would go to 4).
    assert lib.get_points64(res.vector) == 2
    lib.delete_vector64(res.vector)


def test_complex_statistics_families(lib):
    lib.complex_statistics_prec64.restype = ctypes.c_int32
    lib.complex_statistics_prec64.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ComplexStatistics)]
    lib.complex_statistics_split64.restype = ctypes.c_int32
    lib.complex_statistics_split64.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.POINTER(ComplexStatistics)]
    lib.complex_statistics_split_prec64.restype = ctypes.c_int32
    lib.complex_statistics_split_prec64.argtypes = \
        lib.complex_statistics_split64.argtypes
    lib.real_statistics_split_prec64.restype = ctypes.c_int32
    lib.real_statistics_split_prec64.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.POINTER(RealStatistics)]
    inter = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0])
    v = make_vec(lib, inter, is_complex=1)
    st = ComplexStatistics()
    assert lib.complex_statistics_prec64(v, ctypes.byref(st)) == 0
    assert st.sum_re == 16.0 and st.sum_im == 20.0 and st.count == 4
    out = (ComplexStatistics * 2)()
    assert lib.complex_statistics_split64(v, 2, out) == 2
    assert out[0].sum_re == 1.0 + 5.0   # elements 0, 2
    assert out[1].sum_re == 3.0 + 7.0   # elements 1, 3
    outp = (ComplexStatistics * 2)()
    assert lib.complex_statistics_split_prec64(v, 2, outp) == 2
    assert outp[0].sum_im == 2.0 + 6.0
    r = make_vec(lib, [1.0, 10.0, 2.0, 20.0])
    outr = (RealStatistics * 2)()
    assert lib.real_statistics_split_prec64(r, 2, outr) == 2
    assert outr[0].sum == 3.0 and outr[1].sum == 30.0
    lib.delete_vector64(v)
    lib.delete_vector64(r)


def test_map_complex_c_callbacks(lib, cffi_lib):
    ffi, clib = cffi_lib
    # map: multiply by i, plus index on the real part
    cb = ffi.callback("BdspComplex(double, double, size_t, const void*)",
                      lambda re, im, idx, _: (-im + idx, re))
    v = make_vec(lib, [1.0, 2.0, 3.0, 4.0], is_complex=1)
    res = clib.map_inplace_complex64(ffi.cast("void*", v), cb, ffi.NULL)
    assert res.result_code == 0
    handle = int(ffi.cast("uintptr_t", res.vector))
    np.testing.assert_allclose(read_vec(lib, handle, 4),
                               [-2.0, 1.0, -3.0, 3.0])
    ident = ffi.callback("BdspComplex(double, double, size_t, const void*)",
                         lambda re, im, idx, _: (re, im))
    summ = ffi.callback(
        "BdspComplex(BdspComplex, BdspComplex, const void*)",
        lambda a, b, _: (a.re + b.re, a.im + b.im))
    agg = clib.map_aggregate_complex64(ffi.cast("void*", handle), ident,
                                       summ, ffi.NULL)
    assert agg.result_code == 0
    assert agg.real == -5.0 and agg.imag == 4.0
    # real vector -> InputMustBeComplex (3)
    r = make_vec(lib, [1.0, 2.0])
    bad = clib.map_inplace_complex64(ffi.cast("void*", r), cb, ffi.NULL)
    assert bad.result_code == 3
    lib.delete_vector64(handle)
    lib.delete_vector64(r)


def test_convolve_complex_custom_callback(lib, cffi_lib):
    ffi, clib = cffi_lib
    # Purely imaginary triangle: delta conv -> i * triangle.
    cb = ffi.callback("BdspComplex(const void*, double)",
                      lambda data, x: (0.0, max(0.0, 1.0 - abs(x))))
    data = np.zeros(32)
    data[16] = 1.0  # complex delta at point 8
    v = make_vec(lib, data, is_complex=1)
    res = clib.convolve_complex64(ffi.cast("void*", v), cb, ffi.NULL,
                                  0, 0.5, 3)
    assert res.result_code == 0
    handle = int(ffi.cast("uintptr_t", res.vector))
    out = read_vec(lib, handle, 32)
    expected = np.zeros(32)
    expected[13:22:2] = [0, 0.5, 1.0, 0.5, 0]  # imaginary lanes
    np.testing.assert_allclose(out, expected, atol=1e-9)
    lib.delete_vector64(handle)


def test_interpolate_custom_c_callback(lib):
    lib.interpolate_custom64.restype = VectorResult
    lib.interpolate_custom64.argtypes = [ctypes.c_void_p, CONV_CB,
                                         ctypes.c_void_p, ctypes.c_int32,
                                         ctypes.c_size_t, ctypes.c_double]
    cb = CONV_CB(lambda data, x: 1.0)  # all-pass frequency response
    v = make_vec(lib, np.sin(np.linspace(0, 2 * np.pi, 17)[:16]))
    res = lib.interpolate_custom64(v, cb, None, 1, 32, 0.0)
    assert res.result_code == 0
    assert lib.get_points64(res.vector) == 32
    lib.delete_vector64(res.vector)


def test_windowed_custom_symmetric_ffts(lib):
    lib.windowed_custom_sfft64.restype = VectorResult
    lib.windowed_custom_sfft64.argtypes = [ctypes.c_void_p, WINDOW_CB,
                                           ctypes.c_void_p, ctypes.c_int32]
    lib.windowed_custom_sifft64.restype = VectorResult
    lib.windowed_custom_sifft64.argtypes = lib.windowed_custom_sfft64.argtypes
    lib.sfft64.restype = VectorResult
    lib.sfft64.argtypes = [ctypes.c_void_p]
    lib.plain_sfft64.restype = VectorResult
    lib.plain_sfft64.argtypes = [ctypes.c_void_p]
    lib.fft_shift64.restype = VectorResult
    lib.fft_shift64.argtypes = [ctypes.c_void_p]
    cb = WINDOW_CB(lambda data, n, points: 1.0)  # rectangular
    x = np.sin(np.arange(9))
    # With a rectangular window, windowed_custom_sfft == sfft.
    a = lib.windowed_custom_sfft64(make_vec(lib, x.copy()), cb, None, 1)
    b = lib.sfft64(make_vec(lib, x.copy()))
    assert a.result_code == 0 and b.result_code == 0
    np.testing.assert_allclose(read_vec(lib, a.vector, 10),
                               read_vec(lib, b.vector, 10), atol=1e-9)
    lib.delete_vector64(a.vector)
    lib.delete_vector64(b.vector)
    # sifft expects an fft_shift'ed plain half-spectrum (it undoes the
    # shift, scales by 1/points, then inverts); h = 5 points here.
    half = lib.plain_sfft64(make_vec(lib, x.copy()))
    assert half.result_code == 0
    shifted = lib.fft_shift64(half.vector)
    assert shifted.result_code == 0
    scaled = lib.real_scale64(shifted.vector, 5.0)
    assert scaled.result_code == 0
    back = lib.windowed_custom_sifft64(scaled.vector, cb, None, 1)
    assert back.result_code == 0
    out = read_vec(lib, back.vector, 9) / 9.0  # unscaled inverse
    np.testing.assert_allclose(out, x, atol=1e-9)
    lib.delete_vector64(back.vector)


def test_vector_spellings(lib):
    lib.add_vector64.restype = VectorResult
    lib.add_vector64.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    a = make_vec(lib, [1.0, 2.0])
    b = make_vec(lib, [10.0, 20.0])
    res = lib.add_vector64(a, b)
    assert res.result_code == 0
    np.testing.assert_allclose(read_vec(lib, res.vector, 2), [11.0, 22.0])
    lib.delete_vector64(res.vector)
    lib.delete_vector64(b)


def test_f32_surface(lib):
    """The 32-bit facade works alongside the 64-bit one."""
    lib.new32.restype = ctypes.c_void_p
    lib.new32.argtypes = [ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
                          ctypes.c_size_t, ctypes.c_float]
    lib.get_value32.restype = ctypes.c_float
    lib.get_value32.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    lib.real_offset32.restype = VectorResult
    lib.real_offset32.argtypes = [ctypes.c_void_p, ctypes.c_float]
    lib.delete_vector32.argtypes = [ctypes.c_void_p]
    v = lib.new32(0, 0, 1.5, 64, 1.0)
    res = lib.real_offset32(v, 2.5)
    assert res.result_code == 0
    assert abs(lib.get_value32(res.vector, 0) - 4.0) < 1e-6
    lib.delete_vector32(res.vector)
