"""FFT interpolation (interpft) through the C ABI from plain ctypes —
the analog of reference examples/interpolation.py (which drives
``interpft64`` in basic_dsp.dll from Python and compares the result with
``scipy.signal.resample``).

20 samples of cos(-x^2/6) are upsampled to 100 points; interpft performs
FFT zero-padding resampling, which matches scipy.signal.resample exactly
(both implement the Octave interpft algorithm).  Writes
``interpolation.png`` instead of opening a window.

Run: make interop && python examples/interpolation.py
(BDSP_PLATFORM=cpu to force the CPU backend.)
"""
import ctypes
import os
import sys

import numpy as np

LIB = os.path.join(os.path.dirname(__file__), "..", "interop", "build",
                   "libbasic_dsp_tpu.so")


class VectorResult(ctypes.Structure):
    _fields_ = [("result_code", ctypes.c_int32),
                ("vector", ctypes.c_void_p)]


def main(out_png="interpolation.png"):
    if not os.path.exists(LIB):
        print("build the library first: make interop", file=sys.stderr)
        return 1
    lib = ctypes.CDLL(LIB)
    lib.bdsp_init.restype = ctypes.c_int32
    if lib.bdsp_init() != 0:
        lib.bdsp_last_error.restype = ctypes.c_char_p
        print("init failed:", lib.bdsp_last_error(), file=sys.stderr)
        return 1

    lib.new64.restype = ctypes.c_void_p
    lib.new64.argtypes = [ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
                          ctypes.c_size_t, ctypes.c_double]
    lib.set_value64.restype = None
    lib.set_value64.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                ctypes.c_double]
    lib.get_value64.restype = ctypes.c_double
    lib.get_value64.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    lib.interpft64.restype = VectorResult
    lib.interpft64.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    lib.delete_vector64.restype = None
    lib.delete_vector64.argtypes = [ctypes.c_void_p]

    src_len, dst_len = 20, 100
    x = np.linspace(0, 10, src_len, endpoint=False)
    y1 = np.cos(-x ** 2 / 6.0)

    vec = ctypes.c_void_p(lib.new64(0, 0, 0.0, src_len, 1.0))
    for i in range(src_len):
        lib.set_value64(vec, i, float(y1[i]))
    res = lib.interpft64(vec, dst_len)
    assert res.result_code == 0, res.result_code
    vec = ctypes.c_void_p(res.vector)
    y2 = np.array([lib.get_value64(vec, i) for i in range(dst_len)])
    lib.delete_vector64(vec)

    xnew = np.linspace(0, 10, dst_len, endpoint=False)
    try:
        from scipy import signal
        f = signal.resample(y1, dst_len)
        err = float(np.max(np.abs(f - y2)))
        print(f"max |scipy.resample - interpft64| = {err:.3e}")
    except ImportError:
        f = None
        print("scipy not available — skipping the cross-check")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.plot(x, y1, "go-", label="data")
    if f is not None:
        plt.plot(xnew, f, ".-", label="resampled scipy")
    plt.plot(xnew, y2, "--", label="resampled basic_dsp_tpu")
    plt.plot(10, y1[0], "ro")
    plt.legend(loc="best")
    plt.savefig(out_png, dpi=100)
    print(f"wrote {out_png}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
