"""A/B the channelizer megakernel tile size + demod mode at cfg5
geometry (which R pipelines best; what atan2 costs in-kernel)."""
import numpy as np
import jax.numpy as jnp

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

    for R in (128, 256, 512, 1024):
        for demod in (True, False):
            def fn(a, b, p, carry, R=R, demod=demod):
                tm = _merged_tap_rows(p, C)
                out = ckp.channelize_demod_pallas(a + carry, b, tm, C,
                                                  tile_rows=R, demod=demod)
                if not demod:
                    out = jnp.arctan2(out[1], out[0])
                n1 = C // 128
                S = n // C
                return out.reshape(S, n1, 128).transpose(2, 1, 0).reshape(C, S)
            try:
                dt = timed(fn, xr, xi, proto, iters=30)
                print(f"R={R:5d} demod={int(demod)}  {dt*1e3:8.4f} ms  "
                      f"{n/dt/1e9:6.2f} GS/s", flush=True)
            except Exception as e:
                print(f"R={R:5d} demod={int(demod)}  FAILED {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    main()
