"""End-to-end example chains run and produce sane output (the reference's
examples/ are its integration demos: modulation.rs, crosstalk.rs,
slow_down_music.rs)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import basic_dsp_tpu as bd


def test_modulation_chain(tmp_path):
    from modulation import Prbs15
    prbs = Prbs15()
    n = 512
    ch2 = np.array([prbs.next() for _ in range(n)])
    ch1 = np.array([prbs.next() for _ in range(n)])
    assert set(np.unique(ch1)) <= {-0.5, 0.5}
    iq = bd.interleave_to_complex_time_vec(ch1, ch2)
    shaped = iq.interpolatef(bd.RaisedCosineFunction(0.35), 10.0, 0.0, 10)
    assert shaped.points() == 10 * n
    # Pulse shaping preserves the symbol values at symbol instants
    # (raised cosine has zero ISI at integer symbol offsets).
    sampled = np.asarray(shaped.to_real().array)[::10]
    assert np.abs(sampled - ch1).max() < 1e-3


def test_crosstalk_chain(tmp_path):
    from crosstalk import main, write_stereo_wav, read_stereo_wav
    rng = np.random.default_rng(0)
    src = str(tmp_path / "src.wav")
    dst = str(tmp_path / "dst.wav")
    n = 1024
    write_stereo_wav(src, rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
                     44100)
    main(src, dst)
    ch1, ch2, rate = read_stereo_wav(dst)
    assert rate == 44100 and len(ch1) == n
    assert np.abs(ch1).max() > 0


def test_slow_down_chain(tmp_path):
    from crosstalk import write_stereo_wav, read_stereo_wav
    import slow_down_music
    rng = np.random.default_rng(1)
    src = str(tmp_path / "src.wav")
    dst = str(tmp_path / "dst.wav")
    n = 1000
    t = np.arange(n)
    write_stereo_wav(src, 0.5 * np.sin(2 * np.pi * 0.01 * t),
                     0.5 * np.cos(2 * np.pi * 0.01 * t), 44100)
    slow_down_music.main(src, dst)
    ch1, ch2, rate = read_stereo_wav(dst)
    assert len(ch1) == 1500


def test_streaming_pipeline_example(capsys):
    from streaming_pipeline import main
    main(3)
    out = capsys.readouterr().out
    assert "resampled 768" in out and out.count("chunk") == 3
