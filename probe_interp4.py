"""Round-4 stage split for bench_all cfg3 (interpolatef x1.5, 1M, planar).

Committed r3 capture: 0.1847 ms vs 0.0784 floor (vs 0.425).  Where does
the other 0.106 ms go?  Stages, all timed with the honest array-carry
slope harness (bench_all.timed):

  full      : the benched cfg3 (two independent plane calls)
  one_plane : a single real plane through _interpolatef_direct
  ext_only  : circular extension build only (concat of slices)
  win_only  : windows (nb, W) materialization from a prebuilt ext
  mm_only   : (nb, W) @ (W, B) matmul only, prebuilt windows
  stackrows : BOTH planes as one (2nb, W) @ (W, B) matmul (ext built
              per plane, windows rows concatenated)
  acc3      : shift-accumulate 3-dot spelling (no windows concat),
              opt-barrier'd ext (the Q==1 spelling applied to Q=2)
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


def setup():
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.normal(size=n).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
    fun = SincFunction()
    taps, offs = interp_ops.polyphase_taps(fun, P, Q, 0.0, L, np.float32)
    c = interp_ops._choose_c(P, Q)
    M = interp_ops._direct_band_matrix(taps, P, Q, offs, L,
                                       np.dtype(np.float32), c)
    return xr, xi, fun, taps, offs, c, M


def build_ext(x, L_, need):
    k = L_ % n
    pieces = [x[..., n - k:]] if k else []
    remaining = need - k
    while remaining > 0:
        take = min(remaining, n)
        pieces.append(x[..., :take])
        remaining -= take
    return jnp.concatenate(pieces, axis=-1)


def main():
    xr, xi, fun, taps, offs, c, M = setup()
    B, span, W = c * P, c * Q, interp_ops._band_W(P, Q, L, c)
    nb = -(-out_len // B)
    need = nb * span + W
    print(f"c={c} B={B} span={span} W={W} nb={nb} need={need}")
    prec = config.matmul_precision()

    def full(a, b, carry):
        re = interp_ops.interpolatef(a + carry, fun, 1.5, 0.0, L, 1.0)
        im = interp_ops.interpolatef(b, fun, 1.5, 0.0, L, 1.0)
        return jnp.concatenate([re, im])

    def one_plane(a, carry):
        return interp_ops._interpolatef_direct(a + carry, taps, P, Q,
                                               offs, L, out_len, c)

    def ext_only(a, carry):
        return build_ext(a + carry, L, need)

    ext0 = build_ext(xr, L, need)

    def win_only(e, carry):
        e = e + carry
        parts = [e[128 * g: 128 * g + nb * span]
                 .reshape(nb, span)[:, :128] for g in range(W // 128)]
        return jnp.concatenate(parts, axis=-1)

    win0 = win_only(ext0, jnp.zeros((need,), jnp.float32))

    def mm_only(w_, carry):
        return jnp.matmul(w_ + carry, M, precision=prec)

    def windows_of(e):
        parts = [e[128 * g: 128 * g + nb * span]
                 .reshape(nb, span)[:, :128] for g in range(W // 128)]
        return jnp.concatenate(parts, axis=-1)

    def stackrows(a, b, carry):
        er = build_ext(a + carry, L, need)
        ei = build_ext(b, L, need)
        w2 = jnp.concatenate([windows_of(er), windows_of(ei)], axis=0)
        o = jnp.matmul(w2, M, precision=prec)
        return o.reshape(-1)[: 2 * out_len]

    def acc3(a, b, carry):
        outs = []
        for x in (a + carry, b):
            e = jax.lax.optimization_barrier(build_ext(x, L, need))
            o = None
            for g in range(W // 128):
                part = (e[128 * g: 128 * g + nb * span]
                        .reshape(nb, span)[:, :128])
                term = jnp.matmul(part, M[128 * g: 128 * (g + 1)],
                                  precision=prec)
                o = term if o is None else o + term
            outs.append(o.reshape(-1)[:out_len])
        return jnp.concatenate(outs)

    # parity first
    ref = np.asarray(full(xr, xi, jnp.zeros((n,), jnp.float32)))
    got = np.asarray(stackrows(xr, xi, jnp.zeros((n,), jnp.float32)))
    print("stackrows maxerr", float(np.max(np.abs(ref - got))))
    got = np.asarray(acc3(xr, xi, jnp.zeros((n,), jnp.float32)))
    print("acc3 maxerr", float(np.max(np.abs(ref - got))))

    for name, fn, args, it in [
        ("full", full, (xr, xi), 20),
        ("one_plane", one_plane, (xr,), 20),
        ("ext_only", ext_only, (xr,), 50),
        ("win_only", win_only, (ext0,), 50),
        ("mm_only", mm_only, (win0,), 50),
        ("stackrows", stackrows, (xr, xi), 20),
        ("acc3", acc3, (xr, xi), 20),
    ]:
        dt = timed(fn, *args, iters=it)
        print(f"{name:10s} {dt*1e3:8.4f} ms")


if __name__ == "__main__":
    main()
