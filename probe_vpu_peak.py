"""Measure the v5e VPU's achievable f32 elementwise throughput (FMA
chain) and transcendental rates (atan2-polynomial ops, sqrt, div).

These become the VPU denominator of three-resource roofline models
(HBM, MXU, VPU) for kernels whose work is elementwise-dominated — e.g.
the fused channelizer megakernel (polyphase FIR + radix-2 IFFT + demod
are all VPU work; the only MXU stage is the outer IDFT-128).

Timing: slope between 1x and 3x in-jit fori_loop lengths, array carry
consuming every element (CLAUDE.md timing rules).
"""
import time

import numpy as np


REPS = 5


def slope(mk, iters):
    import jax

    f1 = jax.jit(mk(iters))
    f3 = jax.jit(mk(3 * iters))

    def med(fn):
        float(fn())  # warm + force
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(fn())
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    return (med(f3) - med(f1)) / (2 * iters)


def main():
    import jax
    import jax.numpy as jnp

    n = 1 << 22          # 4M f32 lanes, VMEM-overflowing: honest HBM mix?
    # Use 2M to stay compute-bound (8 MB x few operands fits caches less;
    # fori body reuses one array -> stays on-chip traffic after first).
    n = 1 << 21
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=n)
                     .astype(np.float32) * 0.1 + 1.0)

    def mk_fma(k):
        def f():
            def step(_, c):
                # 8 x (abs, mul, add) = 24 elem-ops per element per iter;
                # the abs between FMAs blocks XLA from folding the
                # constant-coefficient chain into one affine op.
                for _ in range(8):
                    c = jnp.abs(c) * jnp.float32(0.9999) + jnp.float32(1e-7)
                return c
            out = jax.lax.fori_loop(0, k, step, x0)
            return jnp.sum(out)
        return f

    def mk_div(k):
        def f():
            def step(_, c):
                c = c / (jnp.abs(c) + jnp.float32(1.0)) + jnp.float32(1.0)
                return c
            out = jax.lax.fori_loop(0, k, step, x0)
            return jnp.sum(out)
        return f

    def mk_atan2(k):
        def f():
            def step(_, c):
                c = jnp.arctan2(c, jnp.float32(1.0) + jnp.abs(c)) \
                    + jnp.float32(1.0)
                return c
            out = jax.lax.fori_loop(0, k, step, x0)
            return jnp.sum(out)
        return f

    def mk_sqrt(k):
        def f():
            def step(_, c):
                c = jnp.sqrt(jnp.abs(c) + jnp.float32(1.0))
                return c
            out = jax.lax.fori_loop(0, k, step, x0)
            return jnp.sum(out)
        return f

    dt = slope(mk_fma, 200)
    ops = 24.0 * n
    print(f"fma chain : {dt*1e6:8.2f} us/iter  "
          f"{ops/dt/1e12:6.2f} Telem-op/s f32 "
          f"({dt/n*1e12/24:.2f} ps/elem-op)", flush=True)
    for name, mk, per in [("div", mk_div, 1), ("atan2", mk_atan2, 1),
                          ("sqrt", mk_sqrt, 1)]:
        dt = slope(mk, 200)
        print(f"{name:9s} : {dt*1e6:8.2f} us/iter  "
              f"{per*n/dt/1e9:7.2f} Gop/s  ({dt/n*1e12:.2f} ps/elem)",
              flush=True)


if __name__ == "__main__":
    main()
