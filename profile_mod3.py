"""Formulation A/B for _interpolatef_direct with a DCE-proof harness.

profile_mod2's carry used ``out.ravel()[:1]`` — XLA slice-propagates that
back through matmul-only bodies and dead-codes the work (measured
0.005 ms for a banded-constant matmul that honestly costs ~0.04 ms).
A scalar ``jnp.sum(jnp.abs(out))`` carry is honest but stalls the axon
compiler at these shapes (two runs hung >8 min in compilation).  Here the
carry is an ARRAY of the input shape: the output (every element — padded
to a multiple of n, reshaped, short-axis |.| sum) feeds the next
iteration's input, so nothing can be dead-coded and the loop body stays
reduction-light.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, iters=50, n_in=None):
    n = n_in if n_in is not None else args[0].shape[-1]

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
        float(jnp.sum(r1(*args))); float(jnp.sum(r3(*args)))

    def med(r):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(jnp.sum(r(*args)))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    slope = (med(r3) - med(r1)) / (2 * iters)
    if slope <= 0:
        slope = med(r3) / (3 * iters)
    return slope * 1e3


def run_shape(n, P, Q, L, label):
    from basic_dsp_tpu.ops import interp_ops
    rng = np.random.default_rng(0)
    B = 128 * P
    span = 128 * Q
    W = 128 * (Q + -(-2 * L // 128))
    out_len = n * P // Q
    nb = -(-out_len // B)
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))
    taps_np = rng.normal(size=(P, 2 * L + 1)).astype(np.float32)
    offs = tuple(int(o) for o in (np.arange(P) * Q) // P)

    j = np.arange(B); t = np.arange(2 * L + 1)
    jj, tt = np.meshgrid(j, t, indexing="ij")
    pp = jj % P
    ww = (jj // P) * Q + np.asarray(offs)[pp] + tt
    M_np = np.zeros((W, B), np.float32)
    M_np[ww.ravel(), jj.ravel()] = taps_np[pp.ravel(), tt.ravel()]
    M = jnp.asarray(M_np)
    taps = jnp.asarray(taps_np)

    def ext_of(xx):
        k = L % n
        need = nb * span + W
        pieces = [xx[n - k:]]
        remaining = need - k
        while remaining > 0:
            take = min(remaining, n)
            pieces.append(xx[:take])
            remaining -= take
        return jnp.concatenate(pieces, axis=-1)

    def windows_mm(a, m, carry):
        ext = ext_of(a + carry)
        parts = [ext[128 * g: 128 * g + nb * span]
                 .reshape(nb, span)[:, :128] for g in range(W // 128)]
        wn = jnp.concatenate(parts, axis=-1)
        return jnp.matmul(wn, m, precision="highest").reshape(-1)[:out_len]

    def windows_mm_barrier(a, m, carry):
        ext = ext_of(a + carry)
        parts = [ext[128 * g: 128 * g + nb * span]
                 .reshape(nb, span)[:, :128] for g in range(W // 128)]
        wn = jax.lax.optimization_barrier(jnp.concatenate(parts, axis=-1))
        return jnp.matmul(wn, m, precision="highest").reshape(-1)[:out_len]

    def shift_acc(a, m, carry):
        ext = jax.lax.optimization_barrier(ext_of(a + carry))
        out = None
        for g in range(W // 128):
            part = ext[128 * g: 128 * g + nb * span].reshape(nb, span)[:, :128]
            term = jnp.matmul(part, m[128 * g: 128 * (g + 1)],
                              precision="highest")
            out = term if out is None else out + term
        return out.reshape(-1)[:out_len]

    def current(a, carry):
        # the shipped path: concrete taps (ensure_compile_time_eval in the
        # caller), host-built M
        return interp_ops._interpolatef_direct(a + carry, taps, P, Q, offs,
                                               L, out_len)

    print(f"[{label}] windows_mm      %.3f ms" % timed(windows_mm, x, M))
    print(f"[{label}] windows_mm_barr %.3f ms" % timed(windows_mm_barrier, x, M))
    print(f"[{label}] shift_acc_barr  %.3f ms" % timed(shift_acc, x, M))
    print(f"[{label}] current         %.3f ms" % timed(current, x))


def run_full():
    """bench_all cfg3/cfg4 full interpolatef, honest harness."""
    from basic_dsp_tpu.ops import interp_ops
    from basic_dsp_tpu.conv_types import RaisedCosineFunction, SincFunction
    rng = np.random.default_rng(0)

    n3 = 1 << 20
    ar = jnp.asarray(rng.normal(size=n3).astype(np.float32))
    ai = jnp.asarray(rng.normal(size=n3).astype(np.float32))

    def cfg3(a, b, carry):
        x = (a + carry) + 1j * b
        return interp_ops.interpolatef(x, SincFunction(), 1.5, 0.0, 10, 1.0)

    print("[cfg3 full] %.3f ms" % timed(cfg3, ar, ai, iters=20))

    n4 = 1 << 17
    sr = jnp.asarray(rng.choice([-0.5, 0.5], n4).astype(np.float32))
    si = jnp.asarray(rng.choice([-0.5, 0.5], n4).astype(np.float32))

    def cfg4(a, b, carry):
        iq = (a + carry) + 1j * b
        return jnp.real(interp_ops.interpolatef(
            iq, RaisedCosineFunction(0.35), 10.0, 0.0, 10, 1.0))

    print("[cfg4 full] %.3f ms" % timed(cfg4, sr, si, iters=20))


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("cfg4", "all"):
        run_shape(1 << 17, 10, 1, 10, "cfg4 n=131k P=10 Q=1")
    if which in ("cfg3", "all"):
        run_shape(1 << 20, 3, 2, 10, "cfg3 n=1M P=3 Q=2")
    if which in ("full", "all"):
        run_full()
