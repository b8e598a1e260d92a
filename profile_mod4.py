"""Stage profile of BASELINE config #4 (modulation chain, VERDICT r2 #4):
131k PRBS symbols -> RC pulse shaping x10 -> real passband.

Breaks the benched chain into stages to find where the honest 1.07 ms/iter
(1.23 GS/s, STATUS r2 on-chip revalidation) goes, then A/Bs the planar
rebuild.  Slope timing with the bench_all array-carry fold.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from basic_dsp_tpu.ops import interp_ops
    from basic_dsp_tpu.conv_types import RaisedCosineFunction

    n = 1 << 17
    rng = np.random.default_rng(0)
    s_re = jnp.asarray(rng.choice([-0.5, 0.5], n).astype(np.float32))
    s_im = jnp.asarray(rng.choice([-0.5, 0.5], n).astype(np.float32))
    rc = RaisedCosineFunction(0.35)

    def timed(fn, *args, iters=50):
        def fold(out):
            flat = jnp.abs(out.ravel()).astype(jnp.float32)
            rows = -(-flat.shape[0] // n)
            flat = jnp.pad(flat, (0, rows * n - flat.shape[0]))
            return jnp.sum(flat.reshape(rows, n), axis=0) * jnp.float32(1e-20)

        def make(k):
            @jax.jit
            def looped(*a):
                def step(_, carry):
                    return fold(fn(*a, carry))
                return jax.lax.fori_loop(0, k, step,
                                         jnp.zeros((n,), jnp.float32))
            return looped

        r1, r3 = make(iters), make(3 * iters)
        for _ in range(2):
            float(jnp.sum(r1(*args)))
            float(jnp.sum(r3(*args)))

        def med(r):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(r(*args)))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[1]

        slope = (med(r3) - med(r1)) / (2 * iters)
        if slope <= 0:
            slope = med(r3) / (3 * iters)
        return slope

    # (a) benched cfg4: complex build + interpolatef + real
    def cfg4(sr, si, carry):
        iq = (sr + carry) + 1j * si
        shaped = interp_ops.interpolatef(iq, RaisedCosineFunction(0.35),
                                         10.0, 0.0, 10, 1.0)
        return jnp.real(shaped)

    # (b) complex build + split only (no resample)
    def cplx_only(sr, si, carry):
        iq = (sr + carry) + 1j * si
        return jnp.real(iq) + jnp.imag(iq)

    # (c) one real plane through interpolatef
    def one_plane(sr, si, carry):
        return interp_ops.interpolatef(sr + carry, RaisedCosineFunction(0.35),
                                       10.0, 0.0, 10, 1.0)

    # (d) both planes planar (no complex materialization anywhere)
    def planar(sr, si, carry):
        f = RaisedCosineFunction(0.35)
        re = interp_ops.interpolatef(sr + carry, f, 10.0, 0.0, 10, 1.0)
        im = interp_ops.interpolatef(si + carry * 0.0, f, 10.0, 0.0, 10, 1.0)
        return jnp.stack([re, im])

    for name, fn in (("cfg4_benched", cfg4), ("complex_build_only", cplx_only),
                     ("one_plane_real", one_plane), ("planar_two_planes",
                                                     planar)):
        dt = timed(fn, s_re, s_im)
        print(f"{name:22s}: {dt * 1e3:8.4f} ms/iter "
              f"({10 * n / dt / 1e9:6.2f} GS/s out)", flush=True)


if __name__ == "__main__":
    main()
