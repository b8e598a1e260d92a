"""WAV IO: native C++ reader/writer round trips and agrees with the
stdlib fallback."""
import os

import numpy as np
import pytest

from basic_dsp_tpu import io as bdio


def test_native_roundtrip_pcm16(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.uniform(-0.9, 0.9, (1000, 2)).astype(np.float32)
    path = str(tmp_path / "t16.wav")
    bdio.write_wav(path, frames, 44100, bits=16)
    back, rate = bdio.read_wav(path)
    assert rate == 44100 and back.shape == (1000, 2)
    np.testing.assert_allclose(back, frames, atol=1.0 / 16000)


def test_native_roundtrip_float32(tmp_path):
    if not bdio._native():
        pytest.skip("native wav io not built")
    rng = np.random.default_rng(1)
    frames = rng.uniform(-1, 1, (500, 1)).astype(np.float32)
    path = str(tmp_path / "tf32.wav")
    bdio.write_wav(path, frames, 16000, bits=32)
    back, rate = bdio.read_wav(path)
    assert rate == 16000
    np.testing.assert_allclose(back, frames, atol=0)


def test_native_and_fallback_agree(tmp_path):
    if not bdio._native():
        pytest.skip("native wav io not built")
    rng = np.random.default_rng(2)
    frames = rng.uniform(-0.5, 0.5, (256, 2)).astype(np.float32)
    path = str(tmp_path / "x.wav")
    bdio.write_wav(path, frames, 8000, bits=16)
    native, _ = bdio.read_wav(path)
    import wave
    with wave.open(path, "rb") as r:
        raw = np.frombuffer(r.readframes(r.getnframes()), dtype=np.int16)
    fallback = (raw.astype(np.float32) / 32768.0).reshape(-1, 2)
    np.testing.assert_allclose(native, fallback, atol=1e-6)


def test_read_missing_file():
    with pytest.raises(Exception):
        bdio.read_wav("/nonexistent/nope.wav")
