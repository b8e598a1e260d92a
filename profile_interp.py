"""Stage profile of interpolatef 1.5x / 10x on-chip (bench_all cfg3/cfg4).

WARNING: [:1]-carry harness; matmul-only bodies can be DCE-d (see
profile_mod2.py docstring). Use profile_mod3 for honest numbers.

Times, per stage, via the slope discipline from bench_all.timed:
  full       : (xr,xi) -> complex -> interpolatef(1.5)
  corr       : the 3 phase Toeplitz correlations only
  mux        : phase_mux only (on a precomputed (3, n) complex stack)
  planar     : prototype planar variant: 2 real correlation stacks +
               2 real muxes, complexify once at the end
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from basic_dsp_tpu.ops import conv_ops, interp_ops, reorg_ops
from basic_dsp_tpu.conv_types import SincFunction


def timed(fn, *args, iters=20):
    def make(k):
        @jax.jit
        def looped(*a):
            def step(_, carry):
                out = fn(*a, carry)
                return (jnp.sum(jnp.abs(out.ravel()[:1]))
                        .astype(jnp.float32) * jnp.float32(1e-20))
            return jax.lax.fori_loop(0, k, step, jnp.float32(0.0))
        return looped

    r1, r3 = make(iters), make(3 * iters)
    for _ in range(2):
        float(r1(*args)); float(r3(*args))

    def med(r):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(r(*args))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    slope = (med(r3) - med(r1)) / (2 * iters)
    if slope <= 0:
        slope = med(r3) / (3 * iters)
    return slope * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    n = 1 << 20
    xr = jnp.asarray(rng.normal(size=n).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
    fun = SincFunction()
    L = 10
    s = np.arange(-L, L + 1, dtype=np.float64)
    P, Q = 3, 2
    p = np.arange(P)
    fracs = ((p * Q) % P) / P
    offs = tuple(int(o) for o in (p * Q) // P)
    taps = jnp.asarray(np.asarray(fun.calc(s[None, :] - fracs[:, None]))
                       .astype(np.float32))

    def full(a, b, carry):
        x = (a + carry) + 1j * b
        return interp_ops.interpolatef(x, fun, 1.5, 0.0, 10, 1.0)

    def corr_only(a, b, t, carry):
        x = (a + carry) + 1j * b
        return conv_ops.toeplitz_conv_multi(x, t[:, ::-1])

    @jax.jit
    def _phases(a, b, t):
        c = conv_ops.toeplitz_conv_multi(a + 1j * b, t[:, ::-1])
        return jnp.real(c), jnp.imag(c)

    pr, pi = _phases(xr, xi, taps)

    def mux_only(a, b, carry):
        ph = (a + carry) + 1j * b
        return reorg_ops.phase_mux(ph, Q, offs, n * 3 // 2)

    def planar(a, b, t, carry):
        # batch the two planes as a leading dim through the same machinery
        xs = jnp.stack([a + carry, b])                 # (2, n)
        corr = conv_ops.toeplitz_conv_multi(xs, t[:, ::-1])   # (2, P, n)
        out = reorg_ops.phase_mux(corr, Q, offs, n * 3 // 2)  # (2, out)
        return jax.lax.complex(out[0], out[1])

    def planar_nostack(a, b, t, carry):
        # planes as separate calls (CLAUDE.md: stacked (2,n) elementwise
        # runs at 25% VPU efficiency; matmuls may differ)
        cr = conv_ops.toeplitz_conv_multi(a + carry, t[:, ::-1])
        ci = conv_ops.toeplitz_conv_multi(b, t[:, ::-1])
        orr = reorg_ops.phase_mux(cr, Q, offs, n * 3 // 2)
        oi = reorg_ops.phase_mux(ci, Q, offs, n * 3 // 2)
        return jax.lax.complex(orr, oi)

    print("full      %.3f ms" % timed(full, xr, xi))
    print("corr_only %.3f ms" % timed(corr_only, xr, xi, taps))
    print("mux_only  %.3f ms" % timed(mux_only, pr, pi))
    print("planar    %.3f ms" % timed(planar, xr, xi, taps))
    print("planar2   %.3f ms" % timed(planar_nostack, xr, xi, taps))
    # correctness: direct path vs the correlate-then-mux path (planes
    # fetched separately — complex can't cross the axon boundary)
    @jax.jit
    def both(a, b, t):
        x = a + 1j * b
        d = interp_ops.interpolatef(x, fun, 1.5, 0.0, 10, 1.0)
        corr = conv_ops.toeplitz_conv_multi(x, t[:, ::-1])
        o = reorg_ops.phase_mux(corr, Q, offs, n * 3 // 2)
        return jnp.real(d), jnp.imag(d), jnp.real(o), jnp.imag(o)

    dr, di, orr, oi = map(np.asarray, both(xr, xi, taps))
    err = max(np.max(np.abs(dr - orr)), np.max(np.abs(di - oi)))
    print("direct-vs-mux abs err", float(err),
          "rel", float(err / (np.max(np.abs(orr)) + 1e-30)))


if __name__ == "__main__":
    main()
