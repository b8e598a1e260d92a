"""Isolate the channelizer megakernel's FIR stage cost: A/B tp1=9 (real
prototype) vs tp1=1 (delta prototype) at cfg5 geometry — if they tie,
the 9 sublane-shifted row reads are cheap and the slack is elsewhere."""
import numpy as np
import jax.numpy as jnp

from basic_dsp_tpu.kernels import channelizer_pallas as ckp
from bench_all import timed, tunnel_probe


def main():
    print(f"# tunnel probe {tunnel_probe():.2f} us", flush=True)
    n = 1 << 22
    C = 1024
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.normal(size=n).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
    tm9 = jnp.asarray((np.random.default_rng(1).normal(size=(9, C)) / C)
                      .astype(np.float32))
    tm1 = jnp.asarray((np.ones((1, C)) / C).astype(np.float32))

    n1 = C // 128
    S = n // C

    for name, tm in [("tp1=9", tm9), ("tp1=1", tm1)]:
        def fn(a, b, t, carry, name=name):
            zr, zi = ckp.channelize_demod_pallas(a + carry, b, t, C,
                                                 demod=False)
            ang = jnp.arctan2(zi, zr)
            return ang.reshape(S, n1, 128).transpose(2, 1, 0).reshape(C, S)
        dt = timed(fn, xr, xi, tm, iters=30)
        print(f"{name}  {dt*1e3:8.4f} ms", flush=True)

    # kernel WITHOUT the final atan2+transpose (raw z planes, array carry
    # over both planes) - bounds the kernel-only time.
    def fn_k(a, b, t, carry):
        zr, zi = ckp.channelize_demod_pallas(a + carry, b, t, C,
                                             demod=False)
        return zr + zi
    dt = timed(fn_k, xr, xi, tm9, iters=30)
    print(f"kernel-only (z sum)  {dt*1e3:8.4f} ms", flush=True)


if __name__ == "__main__":
    main()
