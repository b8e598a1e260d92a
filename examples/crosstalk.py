"""Crosstalk example — port of reference examples/crosstalk.rs.

Reads a stereo wav, treats the two channels as a 2xN matrix, applies a 2x2
MIMO convolution (attenuation + echo on the diagonal, crosstalk
off-diagonal), writes the result.

Usage: python crosstalk.py <source.wav> <dest.wav>
"""
import os
import struct
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import basic_dsp_tpu as bd


def read_stereo_wav(path):
    from basic_dsp_tpu import io as bdio
    frames, rate = bdio.read_wav(path)
    assert frames.shape[1] == 2, "expect stereo"
    return frames[:, 0], frames[:, 1], rate


def write_stereo_wav(path, ch1, ch2, rate):
    from basic_dsp_tpu import io as bdio
    bdio.write_wav(path, np.stack([ch1, ch2], axis=1), rate, bits=16)


def main(source, dest):
    ch1, ch2, rate = read_stereo_wav(source)

    mat = bd.from_rows([bd.to_real_time_vec(ch1), bd.to_real_time_vec(ch2)])
    # Same kernels as the reference: the diagonal attenuates and adds a
    # <1 ms echo; the off-diagonal leaks 30% into the other channel.
    attenuation = np.array([0.2, 0.0, 0.0, 0.5, 0.0, 0.0, 0.0])
    crosstalk = np.array([0.0, 0.0, 0.0, 0.3, 0.0, 0.0, 0.0])
    imp = np.stack([np.stack([attenuation, crosstalk]),
                    np.stack([crosstalk, attenuation])])
    out = mat.convolve_mat(imp)
    rows = out.rows()
    write_stereo_wav(dest, np.asarray(rows[0].array), np.asarray(rows[1].array),
                     rate)
    print(f"Finished processing {rows[0].points()} samples")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1], sys.argv[2])
