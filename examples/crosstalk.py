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
    with wave.open(path, "rb") as r:
        assert r.getnchannels() == 2, "expect stereo"
        n = r.getnframes()
        raw = r.readframes(n)
        width = r.getsampwidth()
        if width == 2:
            data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32767.0
        elif width == 4:
            data = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483647.0
        else:
            raise ValueError(f"unsupported sample width {width}")
        frames = data.reshape(-1, 2)
        return frames[:, 0], frames[:, 1], r.getframerate()


def write_stereo_wav(path, ch1, ch2, rate):
    frames = np.stack([ch1, ch2], axis=1).reshape(-1)
    pcm = np.clip(frames * 32767.0, -32768, 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


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
