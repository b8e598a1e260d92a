"""Stage profile of bench_all cfg4 (modulation chain, 131k symbols x10).

WARNING: [:1]-carry harness; matmul-only bodies can be DCE-d (see
profile_mod2.py docstring). Use profile_mod3 for honest numbers."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from basic_dsp_tpu.ops import interp_ops
from basic_dsp_tpu.conv_types import RaisedCosineFunction


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
    return slope * 1e3


def main():
    rng = np.random.default_rng(0)
    n4 = 1 << 17
    sr = jnp.asarray(rng.choice([-0.5, 0.5], n4).astype(np.float32))
    si = jnp.asarray(rng.choice([-0.5, 0.5], n4).astype(np.float32))
    rc = RaisedCosineFunction(0.35)

    def full(a, b, carry):
        iq = (a + carry) + 1j * b
        return jnp.real(interp_ops.interpolatef(iq, rc, 10.0, 0.0, 10, 1.0))

    def real_only(a, b, carry):
        # what XLA should reduce full() to if it elides the imag plane
        return interp_ops.interpolatef(a + carry, rc, 10.0, 0.0, 10, 1.0)

    def both_planes(a, b, carry):
        iq = (a + carry) + 1j * b
        out = interp_ops.interpolatef(iq, rc, 10.0, 0.0, 10, 1.0)
        return jnp.real(out) + jnp.imag(out)

    print("full (real out) %.3f ms" % timed(full, sr, si))
    print("real plane only %.3f ms" % timed(real_only, sr, si))
    print("both planes     %.3f ms" % timed(both_planes, sr, si))


if __name__ == "__main__":
    main()
