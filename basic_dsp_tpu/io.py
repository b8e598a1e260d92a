"""WAV IO — the data-loading path.

Uses the native C++ reader/writer from the interop library when built
(interop/src/wavio.cpp — the analog of the reference examples' `hound`
dependency), with a pure-Python stdlib fallback.  Returns (frames,
channels) float32 arrays in [-1, 1].
"""
from __future__ import annotations

import ctypes
import os
import wave
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "interop", "build",
                         "libbasic_dsp_tpu.so")
_lib = None


def _native():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _lib = False
        return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bdsp_read_wav.restype = ctypes.POINTER(ctypes.c_float)
        lib.bdsp_read_wav.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_int32),
                                      ctypes.POINTER(ctypes.c_int32),
                                      ctypes.POINTER(ctypes.c_int64)]
        lib.bdsp_write_wav.restype = ctypes.c_int32
        lib.bdsp_write_wav.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_int32, ctypes.c_int32,
                                       ctypes.c_int64, ctypes.c_int32]
        lib.bdsp_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Returns ((frames, channels) float32 in [-1, 1], sample_rate)."""
    lib = _native()
    if lib:
        ch = ctypes.c_int32()
        rate = ctypes.c_int32()
        frames = ctypes.c_int64()
        ptr = lib.bdsp_read_wav(path.encode(), ctypes.byref(ch),
                                ctypes.byref(rate), ctypes.byref(frames))
        if ptr:
            n = frames.value * ch.value
            data = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
            lib.bdsp_free(ptr)
            return data.reshape(frames.value, ch.value), rate.value
    # Fallback: stdlib wave (PCM16/PCM32 only).
    with wave.open(path, "rb") as r:
        n = r.getnframes()
        raw = r.readframes(n)
        width = r.getsampwidth()
        if width == 2:
            data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) \
                / 32768.0
        elif width == 4:
            data = np.frombuffer(raw, dtype=np.int32).astype(np.float32) \
                / 2147483648.0
        else:
            raise ValueError(f"unsupported sample width {width}")
        return data.reshape(n, r.getnchannels()), r.getframerate()


def write_wav(path: str, frames: np.ndarray, rate: int,
              bits: int = 16) -> None:
    """Writes (frames, channels) float32 in [-1, 1] as PCM16 or float32."""
    frames = np.atleast_2d(np.asarray(frames, dtype=np.float32))
    if frames.shape[0] < frames.shape[1] and frames.shape[0] <= 8:
        frames = frames.T  # accept (channels, frames) too
    lib = _native()
    if lib:
        flat = np.ascontiguousarray(frames.reshape(-1))
        code = lib.bdsp_write_wav(
            path.encode(), flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frames.shape[1], rate, frames.shape[0], bits)
        if code == 0:
            return
    if bits != 16:
        raise ValueError("python fallback writes PCM16 only")
    pcm = np.clip(frames.reshape(-1) * 32767.0, -32768, 32767) \
        .astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(frames.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
