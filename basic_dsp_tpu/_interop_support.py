"""Python-side dispatch for the C ABI interop layer.

The native library (interop/src/interop.cpp) embeds CPython and forwards
every C call through :func:`call`, which executes the vector operation and
returns ``(result_code, result)`` instead of raising — the exact protocol of
the reference interop crate (error codes interop/src/lib.rs:107-141,
``VectorInteropResult`` lib.rs:202-212).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

from .errors import DspError, ErrorReason
from .meta import DataDomain, NumberSpace
from .vector import GenDspVector, DspVector
from . import conv_types, windows

# Error codes: reference interop/src/lib.rs:107-141.
_ERROR_CODES = {
    ErrorReason.INPUT_MUST_HAVE_THE_SAME_SIZE: 1,
    ErrorReason.INPUT_META_DATA_MUST_AGREE: 2,
    ErrorReason.INPUT_MUST_BE_COMPLEX: 3,
    ErrorReason.INPUT_MUST_BE_REAL: 4,
    ErrorReason.INPUT_MUST_BE_IN_TIME_DOMAIN: 5,
    ErrorReason.INPUT_MUST_BE_IN_FREQUENCY_DOMAIN: 6,
    ErrorReason.INVALID_ARGUMENT_LENGTH: 7,
    ErrorReason.INPUT_MUST_BE_CONJ_SYMMETRIC: 8,
    ErrorReason.INPUT_MUST_HAVE_AN_ODD_LENGTH: 9,
    ErrorReason.ARGUMENT_FUNCTION_MUST_BE_SYMMETRIC: 10,
    ErrorReason.INVALID_NUMBER_OF_ARGUMENTS_FOR_COMBINED_OP: 11,
    ErrorReason.INPUT_MUST_NOT_BE_EMPTY: 12,
    ErrorReason.INPUT_MUST_HAVE_AN_EVEN_LENGTH: 13,
    ErrorReason.TYPE_CAN_NOT_RESIZE: 14,
}

_WINDOWS = {
    0: windows.TriangularWindow,
    1: windows.HammingWindow,
    2: windows.BlackmanHarrisWindow,
    3: windows.RectangularWindow,
}


def translate_window(window_id: int):
    """Reference translate_to_window_function (lib.rs:153-165)."""
    return _WINDOWS.get(int(window_id), windows.RectangularWindow)()


def translate_conv_function(function_id: int, rolloff: float):
    """Reference translate_to_real_convolution_function (lib.rs:167-179):
    0 = sinc, otherwise raised cosine."""
    if int(function_id) == 0:
        return conv_types.SincFunction()
    return conv_types.RaisedCosineFunction(rolloff)


def translate_padding_option(value: int) -> str:
    """Reference translate_to_padding_option (lib.rs:193-199)."""
    return {0: "end", 1: "surround"}.get(int(value), "center")


def new_vector(is_complex: int, domain: int, init_value: float, length: int,
               delta: float, use_f64: int) -> GenDspVector:
    """Reference new32/new64 (facade32.rs:21-40)."""
    import jax.numpy as jnp
    dom = DataDomain.TIME if domain == 0 else DataDomain.FREQUENCY
    np_rdtype = np.float64 if use_f64 else np.float32
    if is_complex:
        # `length` counts interleaved float elements, like the reference.
        n = length // 2
        host = np.full((n,), complex(init_value, init_value),
                       dtype=np.complex128 if use_f64 else np.complex64)
        return GenDspVector(host, delta, dom, NumberSpace.COMPLEX)
    data = jnp.asarray(np.full((length,), init_value, dtype=np_rdtype))
    return GenDspVector(data, delta, dom, NumberSpace.REAL)


def from_interleaved(is_complex: int, domain: int, delta: float,
                     data: np.ndarray) -> GenDspVector:
    import jax.numpy as jnp
    dom = DataDomain.TIME if domain == 0 else DataDomain.FREQUENCY
    if is_complex:
        arr = np.asarray(data)
        cplx = arr[0::2] + 1j * arr[1::2]
        return GenDspVector(cplx, delta, dom, NumberSpace.COMPLEX)
    return GenDspVector(jnp.asarray(np.asarray(data)), delta, dom,
                        NumberSpace.REAL)


def get_value(vec: DspVector, index: int) -> float:
    """Interleaved float element access (reference get_value32)."""
    return float(vec.interleaved()[index])


def set_value(vec: DspVector, index: int, value: float) -> DspVector:
    inter = vec.interleaved().copy()
    inter[index] = value
    return from_interleaved(1 if vec.is_complex() else 0,
                            0 if vec.domain() == DataDomain.TIME else 1,
                            vec.delta(), inter)


def get_interleaved(vec: DspVector) -> np.ndarray:
    return np.ascontiguousarray(vec.interleaved(), dtype=np.float64)


def replace_interleaved(vec: DspVector, data) -> DspVector:
    """New vector with the same metadata but new interleaved data (used by
    the C-callback map_inplace path)."""
    return from_interleaved(1 if vec.is_complex() else 0,
                            0 if vec.domain() == DataDomain.TIME else 1,
                            vec.delta(), np.asarray(data))


def split_list(vec: DspVector, n: int):
    return vec.split_into(n)


def merge_list(vec: DspVector, sources):
    return vec.merge(list(sources))


class _ForeignWindow(windows.WindowFunction):
    """Window backed by a C function pointer
    (reference ForeignWindowFunction, interop/src/lib.rs:244-290):
    ``REAL fn(const void* data, size_t n, size_t points)``."""

    def _key(self):
        # Distinct C callbacks must never compare equal (value identity
        # from the base class would collapse them to their type).
        return (type(self), self._fn_ptr, self._data)

    def __init__(self, fn_ptr: int, data_ptr: int, is_symmetric: bool):
        import ctypes
        self.is_symmetric = bool(is_symmetric)
        self._fn_ptr = int(fn_ptr)
        self._cb = ctypes.CFUNCTYPE(ctypes.c_double, ctypes.c_void_p,
                                    ctypes.c_size_t,
                                    ctypes.c_size_t)(fn_ptr)
        self._data = data_ptr

    def window(self, n, length):
        # Returns numpy: sampled host-side, enters traces as a constant.
        n_arr = np.atleast_1d(np.asarray(n))
        points = int(np.asarray(length))
        vals = np.array([self._cb(self._data, int(v), points)
                         for v in n_arr], dtype=np.float64)
        return vals.reshape(np.shape(n))


class _ForeignRealFunction(conv_types.RealImpulseResponse,
                           conv_types.RealFrequencyResponse):
    """Impulse/frequency response backed by a C function pointer
    (reference Foreign{Real,Complex}ConvolutionFunction,
    interop/src/lib.rs:292-377): ``REAL fn(const void* data, REAL x)``."""

    _no_jit = True  # host callback: must evaluate eagerly, never traced

    def _key(self):
        # Distinct C callbacks must never compare equal (value identity
        # from the base class would collapse them to their type).
        return (type(self), self._fn_ptr, self._data)

    def __init__(self, fn_ptr: int, data_ptr: int, is_symmetric: bool):
        import ctypes
        self.is_symmetric = bool(is_symmetric)
        self._fn_ptr = int(fn_ptr)
        self._cb = ctypes.CFUNCTYPE(ctypes.c_double, ctypes.c_void_p,
                                    ctypes.c_double)(fn_ptr)
        self._data = data_ptr

    def _eval(self, x):
        # Returns numpy: sampled host-side, enters traces as a constant.
        arr = np.asarray(x, dtype=np.float64)
        vals = np.array([self._cb(self._data, float(v))
                         for v in arr.ravel()], dtype=np.float64)
        return vals.reshape(arr.shape)

    def calc(self, x):
        return self._eval(x)

    def calc_freq(self, x):
        return self._eval(x)


class _ForeignComplexFunction(conv_types.ComplexImpulseResponse,
                              conv_types.ComplexFrequencyResponse):
    """Complex-valued impulse/frequency response backed by a C function
    pointer returning a {double re, im} struct (reference
    ForeignComplexConvolutionFunction, interop/src/lib.rs:313-377)."""

    _no_jit = True  # host callback: must evaluate eagerly, never traced

    def _key(self):
        return (type(self), self._fn_ptr, self._data)

    def __init__(self, fn_ptr: int, data_ptr: int, is_symmetric: bool):
        import ctypes

        class _BC(ctypes.Structure):
            _fields_ = [("re", ctypes.c_double), ("im", ctypes.c_double)]

        self.is_symmetric = bool(is_symmetric)
        self._fn_ptr = int(fn_ptr)
        self._cb = ctypes.CFUNCTYPE(_BC, ctypes.c_void_p,
                                    ctypes.c_double)(fn_ptr)
        self._data = data_ptr

    def _eval(self, x):
        # Returns numpy: sampled host-side, enters traces as a constant.
        arr = np.asarray(x, dtype=np.float64)
        vals = np.empty(arr.size, dtype=np.complex128)
        for i, v in enumerate(arr.ravel()):
            r = self._cb(self._data, float(v))
            vals[i] = complex(r.re, r.im)
        return vals.reshape(arr.shape)

    def calc(self, x):
        return self._eval(x)

    def calc_freq(self, x):
        return self._eval(x)


def make_foreign_window(fn_ptr: int, data_ptr: int, is_symmetric: int):
    return _ForeignWindow(fn_ptr, data_ptr, bool(is_symmetric))


def make_foreign_complex_fn(fn_ptr: int, data_ptr: int, is_symmetric: int):
    return _ForeignComplexFunction(fn_ptr, data_ptr, bool(is_symmetric))


def make_foreign_real_fn(fn_ptr: int, data_ptr: int, is_symmetric: int):
    return _ForeignRealFunction(fn_ptr, data_ptr, bool(is_symmetric))


def call(vec: DspVector, method: str, *args) -> Tuple[int, Any]:
    """Executes ``vec.method(*args)``; returns (result_code, result).

    result_code 0 = ok; >0 = error per the reference code table; the
    result is the (possibly invalidated) vector so storage handles stay
    usable, mirroring TransRes (vector_types/mod.rs:44-48).
    """
    try:
        result = getattr(vec, method)(*args)
    except DspError as e:
        return _ERROR_CODES.get(e.reason, -1), vec
    except Exception:
        return -1, vec
    if isinstance(result, DspVector) and result.is_erroneous():
        return -1, result
    return 0, result
