"""Slow-down example — port of reference examples/slow_down_music.rs.

Interpolates a stereo track by 1.5x (sinc interpolatef) while keeping the
sample rate, so playback is slower with mostly preserved pitch.

Usage: python slow_down_music.py <source.wav> <dest.wav>
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import basic_dsp_tpu as bd
from crosstalk import read_stereo_wav, write_stereo_wav


def main(source, dest):
    ch1, ch2, rate = read_stereo_wav(source)
    # Stereo-as-complex, like the reference: interleaved samples form one
    # complex vector so both channels interpolate together.
    complex_vec = bd.interleave_to_complex_time_vec(ch1, ch2)
    slowed = complex_vec.interpolatef(bd.SincFunction(), 1.5, 0.0, 10)
    out = slowed.to_numpy()
    write_stereo_wav(dest, out.real, out.imag, rate)
    print(f"Finished processing {slowed.points()} samples")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1], sys.argv[2])
