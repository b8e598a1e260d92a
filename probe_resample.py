"""On-chip validation + A/B of the Pallas banded resampler (round 4).

1. runtime_ok() probe compile.
2. Parity vs the XLA banded path at the bench geometry (1M, x1.5).
3. Slope-timed A/B: XLA path vs kernel, single plane and cfg3 (both
   planes), plus the full dispatched interpolatef (should pick the
   kernel on TPU automatically).
"""
import numpy as np
import jax
import jax.numpy as jnp

from basic_dsp_tpu.ops import interp_ops
from basic_dsp_tpu.kernels import resample_pallas as rsp
from basic_dsp_tpu.conv_types import SincFunction
from bench_all import timed, tunnel_probe

P, Q, L = 3, 2, 10
n = 1 << 20
out_len = n * P // Q


def main():
    print(f"# tunnel probe {tunnel_probe():.2f} us")
    print("runtime_ok:", rsp.runtime_ok())

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.normal(size=n).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
    fun = SincFunction()
    taps, offs = interp_ops.polyphase_taps(fun, P, Q, 0.0, L, np.float32)
    taps_np = np.asarray(jax.device_get(taps))
    c = interp_ops._choose_c(P, Q)

    @jax.jit
    def xla_plane(x):
        return interp_ops._direct_apply(
            _ext(x), interp_ops._direct_band_matrix(
                taps_np, P, Q, offs, L, np.dtype(np.float32), c),
            P, Q, -(-out_len // (c * P)), c)[..., :out_len]

    def _ext(x):
        B, span = c * P, c * Q
        W = interp_ops._band_W(P, Q, L, c)
        nb = -(-out_len // B)
        need = nb * span + W
        k = L % n
        pieces = [x[n - k:]] if k else []
        remaining = need - k
        while remaining > 0:
            take = min(remaining, n)
            pieces.append(x[:take])
            remaining -= take
        return jnp.concatenate(pieces, axis=-1)

    @jax.jit
    def pl_plane(x):
        return rsp.resample_direct_pallas(x, taps_np, P, Q, tuple(offs),
                                          L, out_len, c)

    ref = np.asarray(xla_plane(xr))
    got = np.asarray(pl_plane(xr))
    err = float(np.max(np.abs(ref - got)))
    print(f"parity kernel-vs-XLA maxerr {err:.3e} "
          f"(scale {float(np.abs(ref).max()):.2f})")
    assert err < 1e-4, err

    def cfg3_xla(a, b, carry):
        return jnp.concatenate([xla_plane(a + carry), xla_plane(b)])

    def cfg3_pl(a, b, carry):
        return jnp.concatenate([pl_plane(a + carry), pl_plane(b)])

    def cfg3_dispatch(a, b, carry):
        re = interp_ops.interpolatef(a + carry, fun, 1.5, 0.0, L, 1.0)
        im = interp_ops.interpolatef(b, fun, 1.5, 0.0, L, 1.0)
        return jnp.concatenate([re, im])

    for name, fn in [("xla_2pl", cfg3_xla), ("pallas_2pl", cfg3_pl),
                     ("dispatch", cfg3_dispatch)]:
        dt = timed(fn, xr, xi, iters=20)
        print(f"{name:10s} {dt*1e3:8.4f} ms  (floor 0.0784)")


if __name__ == "__main__":
    main()
