"""Micro-profile of _interpolatef_direct pieces at the cfg4 shape
(n=131072, P=10, Q=1, L=10 -> W=256, B=1280, nb=1024).

WARNING — kept as the DCE exhibit: this harness's ``out.ravel()[:1]``
carry lets XLA slice-propagate through matmul-only bodies and dead-code
the work (banded matmul measured "0.005 ms" here vs an honest ~0.04 ms).
Use bench_all.timed / profile_mod3.timed (array-carry fold) for real
numbers."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from basic_dsp_tpu.ops import interp_ops
from basic_dsp_tpu.conv_types import RaisedCosineFunction


def timed(fn, *args, iters=50):
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
    return slope * 1e3


def main():
    rng = np.default_rng(0) if hasattr(np, "default_rng") else None
    rng = np.random.default_rng(0)
    n = 1 << 17
    P, Q, L = 10, 1, 10
    B, span, W = 128 * P, 128 * Q, 256
    nb = -(-n * P // B)
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))
    Mnp = rng.normal(size=(W, B)).astype(np.float32)
    M = jnp.asarray(Mnp)
    win = jnp.asarray(rng.normal(size=(nb, W)).astype(np.float32))

    def full(a, carry):
        return interp_ops.interpolatef(a + carry, RaisedCosineFunction(0.35),
                                       10.0, 0.0, 10, 1.0)

    def mm_only(wn, m, carry):
        out = jnp.matmul(wn + carry, m, precision="highest")
        return out.reshape(-1)[: n * P]

    def mm_high(wn, m, carry):
        out = jnp.matmul(wn + carry, m, precision="high")
        return out.reshape(-1)[: n * P]

    def windows_only(a, carry):
        xx = a + carry
        k = L % n
        need = nb * span + W
        pieces = [xx[n - k:]]
        remaining = need - k
        while remaining > 0:
            take = min(remaining, n)
            pieces.append(xx[:take])
            remaining -= take
        ext = jnp.concatenate(pieces, axis=-1)
        parts = [ext[128 * g: 128 * g + nb * span].reshape(nb, span)[:, :128]
                 for g in range(W // 128)]
        return jnp.concatenate(parts, axis=-1)

    def win_mm(a, m, carry):
        wn = windows_only(a, carry)
        return jnp.matmul(wn, m, precision="highest").reshape(-1)[: n * P]

    print("full          %.3f ms" % timed(full, x))
    print("windows_only  %.3f ms" % timed(windows_only, x))
    print("mm_only       %.3f ms" % timed(mm_only, win, M))
    print("mm_high       %.3f ms" % timed(mm_high, win, M))
    print("windows+mm    %.3f ms" % timed(win_mm, x, M))


if __name__ == "__main__":
    main()
