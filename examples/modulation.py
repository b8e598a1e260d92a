"""Baseband modulation chain — port of reference examples/modulation.rs.

PRBS15 symbols -> IQ vector -> raised-cosine pulse shaping (interpolatef
x10) -> real passband signal.  Writes CSV files like the reference.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import basic_dsp_tpu as bd


class Prbs15:
    """PRBS15 pseudo-random bit sequence (modulation.rs:43-57)."""

    def __init__(self):
        self.lfsr = 0x1

    def next(self) -> float:
        bit = (self.lfsr ^ (self.lfsr >> 14)) & 0x1
        self.lfsr = (self.lfsr >> 1) | (bit << 14)
        return bit - 0.5

    def fill(self, n: int) -> np.ndarray:
        return np.array([self.next() for _ in range(n)])


def main(out_dir="."):
    number_of_symbols = 10000
    prbs = Prbs15()
    for i in range(3):
        # Note the reference interleaves: channel2 gets the first bit.
        ch2 = np.empty(number_of_symbols)
        ch1 = np.empty(number_of_symbols)
        for k in range(number_of_symbols):
            ch2[k] = prbs.next()
            ch1[k] = prbs.next()

        complex_vec = bd.interleave_to_complex_time_vec(ch1, ch2)
        shaped = complex_vec.interpolatef(
            bd.RaisedCosineFunction(0.35), 10.0, 0.0, 10)
        arr = shaped.to_numpy()
        np.savetxt(os.path.join(out_dir, f"baseband_time{i}.csv"),
                   np.stack([arr.real, arr.imag], axis=1), delimiter=", ")

        real = shaped.to_real()
        np.savetxt(os.path.join(out_dir, f"modulated_time{i}.csv"),
                   real.to_numpy())
    print("wrote baseband_time{0..2}.csv and modulated_time{0..2}.csv")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
