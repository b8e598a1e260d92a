"""On-chip validation + A/B of the Pallas channelizer megakernel
(kernels/channelizer_pallas.py) vs the XLA pipeline at bench cfg5
geometry (4M samples, 1024 channels, 8 taps/phase)."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from basic_dsp_tpu import config
from basic_dsp_tpu.kernels import channelizer_pallas as ckp
from basic_dsp_tpu.parallel import channelizer
from bench_all import timed, tunnel_probe


def main():
    print(f"# tunnel probe {tunnel_probe():.2f} us", flush=True)
    n = 1 << 22
    C = 1024
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.normal(size=n).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
    proto = jnp.asarray((np.hamming(C * 8) / C).astype(np.float32))

    # 1. kernel probe-compile + parity at a small size (on-chip).
    print("runtime_ok:", ckp.runtime_ok(), flush=True)
    ns = 1024 * C
    xs_r, xs_i = xr[:ns], xi[:ns]
    cfg_off = dataclasses.replace(config.default_config(),
                                  use_pallas_channelizer=False)
    cfg_on = dataclasses.replace(config.default_config(),
                                 use_pallas_channelizer=True)
    import jax

    # DISTINCT function objects per config: jax.jit's global trace cache
    # is keyed on the function identity, so re-jitting the same function
    # after a config flip silently reuses the first trace.
    def run_off(a, b, p):  # complex only inside jit (axon boundary rule)
        return channelizer.channelize_and_demod(a + 1j * b, p, C)

    def run_on(a, b, p):
        return channelizer.channelize_and_demod(a + 1j * b, p, C)

    config._default_config = cfg_off
    ref = np.asarray(jax.jit(run_off)(xs_r, xs_i, proto))
    config._default_config = cfg_on
    got = np.asarray(jax.jit(run_on)(xs_r, xs_i, proto))
    d = np.abs(np.angle(np.exp(1j * (got - ref))))
    print(f"parity: wrapped-angle diff max {d.max():.2e} "
          f"frac>1e-3 {float((d > 1e-3).mean()):.2e}", flush=True)

    # 2. A/B timing at bench size.
    def chain(xr_, xi_, p, carry):
        x = (xr_ + carry) + 1j * xi_
        return channelizer.channelize_and_demod(x, p, C)

    for name, cfg in [("xla", cfg_off), ("pallas", cfg_on)]:
        config._default_config = cfg
        dt = timed(chain, xr, xi, proto, iters=30)
        gsps = n / dt / 1e9
        print(f"{name:7s} {dt*1e3:8.4f} ms  {gsps:6.2f} GS/s  "
              f"vs56B-floor {0.2868/(dt*1e3):.3f}", flush=True)


if __name__ == "__main__":
    main()
