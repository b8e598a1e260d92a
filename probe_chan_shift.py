"""A/B the channelizer FIR's sublane-shift strategy in isolation.

probe_chan_fir_cost measured the 9-tap merged FIR adding ~0.08 ms over
tp1=1 at cfg5 geometry — the unaligned ``er[k:k+R+1]`` slice reads.
Variants (same math, same I/O):

  slice : current — unaligned sublane slices of the (R+H, C) concat
  roll  : pltpu.roll(er, -k, axis=0) then one aligned [0:R+1] slice
  pre   : weighted planes V_k = er * w[k] built unshifted, then the
          shifted reads taken from V_k (tests whether the mult or the
          shifted read dominates)
  tap1  : single-tap floor

Run on the chip: ``python probe_chan_shift.py``.
"""
import functools
import math
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench_all import timed, tunnel_probe

LANES = 128
R = 512
H = 16
C = 1024
TP1 = 9


def _fir_kernel(hr_ref, mr_ref, w_ref, o_ref, *, tp1, variant):
    er = jnp.concatenate([hr_ref[...], mr_ref[...]], axis=0)   # (R+H, C)
    w = w_ref[...]
    ur = None
    if variant == "roll":
        for k in range(H - tp1, H):
            shifted = pltpu.roll(er, R + H - k, axis=0)[: R + 1]
            term = shifted * w[k:k + 1]
            ur = term if ur is None else ur + term
    elif variant == "pre":
        for k in range(H - tp1, H):
            vk = er * w[k:k + 1]
            term = vk[k:k + R + 1]
            ur = term if ur is None else ur + term
    else:  # "slice"
        for k in range(H - tp1, H):
            term = er[k:k + R + 1] * w[k:k + 1]
            ur = term if ur is None else ur + term
    o_ref[...] = ur[1:]


def build(variant, tp1=TP1):
    halo_spec = pl.BlockSpec((H, C), lambda i: (jnp.maximum(i * (R // H) - 1, 0), 0),
                             memory_space=pltpu.VMEM)
    main_spec = pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((H, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def run(xr, w):
        S = xr.shape[0]
        return pl.pallas_call(
            functools.partial(_fir_kernel, tp1=tp1, variant=variant),
            grid=(S // R,),
            in_specs=[halo_spec, main_spec, const_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((S, C), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",)),
        )(xr, xr, w)
    return run


def main():
    print(f"# tunnel probe {tunnel_probe():.2f} us", flush=True)
    n = 1 << 22
    S = n // C
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(S, C)).astype(np.float32))
    w_np = np.zeros((H, C), np.float32)
    w_np[H - TP1:] = rng.normal(size=(TP1, C)).astype(np.float32) / C
    w = jnp.asarray(w_np)

    outs = {}
    for variant in ["slice", "roll", "pre"]:
        run = build(variant)
        def fn(a, b, carry, run=run):
            return run(a + carry, b)
        dt = timed(fn, x, w, iters=30)
        outs[variant] = np.asarray(jax.jit(run)(x, w))
        print(f"{variant:6s}  {dt*1e3:8.4f} ms", flush=True)
    run1 = build("slice", tp1=1)
    dt = timed(lambda a, b, carry: run1(a + carry, b), x, w, iters=30)
    print(f"tap1    {dt*1e3:8.4f} ms", flush=True)

    ref = outs["slice"]
    for variant in ["roll", "pre"]:
        err = float(np.max(np.abs(outs[variant] - ref)))
        print(f"parity {variant} vs slice: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
