"""A/B channelize_and_demod entries at cfg5 geometry: complex-in
(bench cfg5's `(re+carry) + 1j*im`) vs direct planar planes — does XLA
cancel the complex pack/unpack round trip?"""
import numpy as np
import jax.numpy as jnp

from basic_dsp_tpu.parallel import channelizer
from basic_dsp_tpu.kernels import channelizer_pallas as ckp
from basic_dsp_tpu.parallel.channelizer import _merged_tap_rows
from bench_all import timed, tunnel_probe


def main():
    print(f"# tunnel probe {tunnel_probe():.2f} us", flush=True)
    n = 1 << 22
    C = 1024
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.normal(size=n).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
    proto = jnp.asarray((np.hamming(C * 8) / C).astype(np.float32))
    n1 = C // 128
    S = n // C

    def complex_in(a, b, p, carry):
        x = (a + carry) + 1j * b
        return channelizer.channelize_and_demod(x, p, C)

    def planes_in(a, b, p, carry):
        tm = _merged_tap_rows(p, C)
        zr, zi = ckp.channelize_demod_pallas(a + carry, b, tm, C,
                                             demod=False)
        ang = jnp.arctan2(zi, zr)
        return ang.reshape(S, n1, 128).transpose(2, 1, 0).reshape(C, S)

    for name, fn in [("complex_in", complex_in), ("planes_in", planes_in)]:
        dt = timed(fn, xr, xi, proto, iters=30)
        print(f"{name:11s} {dt*1e3:8.4f} ms  {n/dt/1e9:6.2f} GS/s",
              flush=True)


if __name__ == "__main__":
    main()
