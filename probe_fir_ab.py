"""VERDICT r3 #9: on-chip A/B of kernels/fir_pallas.fir_conv vs the XLA
toeplitz_conv at m in {16, 64, 128, 202}, real and complex, 4M samples.
Winner gets wired behind the config gate; loser is deleted.

All device math under jit (eager ops are unreliable on the axon tunnel);
parity slices are prepared on the host."""
import numpy as np
import jax
import jax.numpy as jnp

from basic_dsp_tpu.ops import conv_ops
from basic_dsp_tpu.kernels import fir_pallas
from bench_all import timed, tunnel_probe

n = 1 << 22


def main():
    print(f"# tunnel probe {tunnel_probe():.2f} us", flush=True)
    rng = np.random.default_rng(0)
    xr_np = rng.normal(size=n).astype(np.float32)
    xi_np = rng.normal(size=n).astype(np.float32)
    xr = jnp.asarray(xr_np)
    xi = jnp.asarray(xi_np)
    xs = jnp.asarray(xr_np[:1 << 16])

    for m in (16, 64, 128, 202):
        h_r = jnp.asarray(rng.normal(size=m).astype(np.float32))
        hc_np = (rng.normal(size=m) + 1j * rng.normal(size=m)).astype(
            np.complex64)
        hcr = jnp.asarray(hc_np.real)
        hci = jnp.asarray(hc_np.imag)

        # parity once per geometry (both jitted; distinct fns per path)
        ref = np.asarray(jax.jit(
            lambda a, h: conv_ops.toeplitz_conv(a, h, False))(xs, h_r))
        got = np.asarray(jax.jit(
            lambda a, h: fir_pallas.fir_conv(a, h, False))(xs, h_r))
        err = float(np.max(np.abs(ref - got)))
        print(f"m={m:4d} real parity {err:.2e}", flush=True)

        def xla_r(a, carry):
            return conv_ops.toeplitz_conv(a + carry, h_r, False)

        def pl_r(a, carry):
            return fir_pallas.fir_conv(a + carry, h_r, False)

        def xla_c(a, b, carry):
            return conv_ops.toeplitz_conv((a + carry) + 1j * b,
                                          hcr + 1j * hci, True)

        def pl_c(a, b, carry):
            return fir_pallas.fir_conv((a + carry) + 1j * b,
                                       hcr + 1j * hci, True)

        for name, fn, args in [("xla_real", xla_r, (xr,)),
                               ("pl_real", pl_r, (xr,)),
                               ("xla_cplx", xla_c, (xr, xi)),
                               ("pl_cplx", pl_c, (xr, xi))]:
            try:
                dt = timed(fn, *args, iters=30)
                print(f"m={m:4d} {name:9s} {dt*1e3:8.4f} ms", flush=True)
            except Exception as e:
                print(f"m={m:4d} {name:9s} FAILED {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    main()
