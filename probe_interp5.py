"""Round-4 cfg3 variants: eliminate the windows materialization.

probe_interp4 stage split: mm 0.037/plane, ext_only 0.087, win_only
0.099, full 0.193 (floor 0.078).  The slack is data movement.  Variants:

  noop      : fold-overhead calibration (passthrough of (n,))
  extnoop   : ext build consumed directly by the fold (no +carry add)
  ctwo      : out = X0 @ M[:span] + X1 @ Mpad, X0/X1 CONTIGUOUS slices
              of ext free-reshaped to (nb, span) — no windows concat.
              Extra flops (Mpad half zero) traded for zero relayout.
  wide1     : ONE matmul Xfull @ [M[:span] | Mpad] then shifted add of
              the two halves.
  ctwo2     : ctwo with both planes' rows stacked into one matmul.
"""
import numpy as np
import jax
import jax.numpy as jnp

from basic_dsp_tpu.ops import interp_ops
from basic_dsp_tpu.conv_types import SincFunction
from basic_dsp_tpu import config
from bench_all import timed

P, Q, L = 3, 2, 10
n = 1 << 20
out_len = n * P // Q


def main():
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.normal(size=n).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
    fun = SincFunction()
    taps, offs = interp_ops.polyphase_taps(fun, P, Q, 0.0, L, np.float32)
    c = interp_ops._choose_c(P, Q)
    M = interp_ops._direct_band_matrix(taps, P, Q, offs, L,
                                       np.dtype(np.float32), c)
    B, span, W = c * P, c * Q, interp_ops._band_W(P, Q, L, c)
    nb = -(-out_len // B)
    assert W == span + 128, (W, span)
    prec = config.matmul_precision()

    M_np = np.asarray(jax.device_get(M))
    Ma = jnp.asarray(M_np[:span])                        # (span, B)
    Mpad_np = np.zeros((span, B), M_np.dtype)
    Mpad_np[:W - span] = M_np[span:]
    Mpad = jnp.asarray(Mpad_np)
    Mwide = jnp.asarray(np.concatenate([M_np[:span], Mpad_np], axis=1))

    need = (nb + 1) * span

    def build_ext(x):
        k = L % n
        pieces = [x[..., n - k:]] if k else []
        remaining = need - k
        while remaining > 0:
            take = min(remaining, n)
            pieces.append(x[..., :take])
            remaining -= take
        return jnp.concatenate(pieces, axis=-1)

    def noop(a, carry):
        return a + carry

    def extnoop(a, carry):
        return build_ext(a + carry)

    def ctwo_plane(x):
        ext = build_ext(x)
        Xf = ext.reshape(nb + 1, span)
        A = jnp.matmul(Xf[:nb], Ma, precision=prec)
        T = jnp.matmul(Xf[1:], Mpad, precision=prec)
        return (A + T).reshape(-1)[:out_len]

    def ctwo(a, b, carry):
        return jnp.concatenate([ctwo_plane(a + carry), ctwo_plane(b)])

    def wide1_plane(x):
        ext = build_ext(x)
        Xf = ext.reshape(nb + 1, span)
        Z = jnp.matmul(Xf, Mwide, precision=prec)
        return (Z[:nb, :B] + Z[1:, B:]).reshape(-1)[:out_len]

    def wide1(a, b, carry):
        return jnp.concatenate([wide1_plane(a + carry), wide1_plane(b)])

    def ctwo2(a, b, carry):
        er = build_ext(a + carry).reshape(nb + 1, span)
        ei = build_ext(b).reshape(nb + 1, span)
        X0 = jnp.concatenate([er[:nb], ei[:nb]], axis=0)
        X1 = jnp.concatenate([er[1:], ei[1:]], axis=0)
        A = jnp.matmul(X0, Ma, precision=prec)
        T = jnp.matmul(X1, Mpad, precision=prec)
        o = (A + T).reshape(2, -1)[:, :out_len]
        return o.reshape(-1)

    def full(a, b, carry):
        re = interp_ops.interpolatef(a + carry, fun, 1.5, 0.0, L, 1.0)
        im = interp_ops.interpolatef(b, fun, 1.5, 0.0, L, 1.0)
        return jnp.concatenate([re, im])

    z = jnp.zeros((n,), jnp.float32)
    ref = np.asarray(full(xr, xi, z))
    for name, fn in [("ctwo", ctwo), ("wide1", wide1), ("ctwo2", ctwo2)]:
        got = np.asarray(fn(xr, xi, z))
        print(name, "maxerr", float(np.max(np.abs(ref - got))))

    for name, fn, args, it in [
        ("noop", noop, (xr,), 50),
        ("extnoop", extnoop, (xr,), 50),
        ("full", full, (xr, xi), 20),
        ("ctwo", ctwo, (xr, xi), 20),
        ("wide1", wide1, (xr, xi), 20),
        ("ctwo2", ctwo2, (xr, xi), 20),
    ]:
        dt = timed(fn, *args, iters=it)
        print(f"{name:8s} {dt*1e3:8.4f} ms")


if __name__ == "__main__":
    main()
