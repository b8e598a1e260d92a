"""Decisive same-session A/B for the 160/147 audio-rate formulations.

Waits for a HEALTHY tunnel (probe < 1.5 us) before measuring; every arm
runs in one session so relative ordering is drift-free.  Arms:

  xla-rowblock — shipped: out = sum_r V[j+r] @ M_r const-weight matmuls
  pallas-raw   — row-block kernel, (R, Q) skinny blocks, 2 shifted dots
  pallas-pad   — same with V rows HBM-padded to 256 lanes
  xla-c2       — the r4 generic banded windows path (c=2)

A 2026-08-20 degraded-tunnel session fabricated 0.0196 ms for
xla-rowblock (spread 7.15 — at 0.81x the pure-bytes wall); this probe
rejects arms whose spread exceeds 2 and reruns them.
"""
import functools
import time

import numpy as np, jax, jax.numpy as jnp, dataclasses
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from basic_dsp_tpu.ops import interp_ops
from basic_dsp_tpu.conv_types import SincFunction
from basic_dsp_tpu import config
from bench_all import timed, tunnel_probe, HBM_GBPS, MXU_TFLOPS_HIGHEST

for attempt in range(30):
    p = tunnel_probe()
    print(f"# tunnel probe {p:.2f} us", flush=True)
    if p < 1.5:
        break
    time.sleep(60)

n = 1 << 20
x = jnp.asarray(np.random.default_rng(0).normal(size=n).astype(np.float32))
P, Q, L = 160, 147, 10
out_len = int(round(n * P / Q)); out_len += out_len % 2
fun = SincFunction()
taps, offs = interp_ops.polyphase_taps(fun, P, Q, 0.0, L, jnp.float32)
W0, off, s0, splits = interp_ops._rowblock_geometry(P, Q, L)
mats, _ = interp_ops._rowblock_matrices(taps, P, Q, offs, L,
                                        np.dtype(np.float32))
fl_r4 = max(((2 * n + out_len) * 4.0 + (out_len // 320) * 384 * 4)
            / (HBM_GBPS * 1e6),
            2.0 * 384 * out_len / (MXU_TFLOPS_HIGHEST * 1e9))


def _dot3(v, mh, ml):
    xh = v.astype(jnp.bfloat16)
    xl = (v - xh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    return d(xh, mh[...]) + d(xh, ml[...]) + d(xl, mh[...])


def _k2dot(v0, v1, m0h, m0l, m1h, m1l, o):
    o[...] = _dot3(v0[...], m0h, m0l) + _dot3(v1[...], m1h, m1l)


def pallas_rowblock(a, padded, R=512):
    nrows = -(-out_len // P)
    tiles = -(-nrows // R)
    rows = tiles * R
    need = (rows + 2) * Q
    pieces = [a[n - off:]]
    remaining = need - off
    while remaining > 0:
        take = min(remaining, n)
        pieces.append(a[:take])
        remaining -= take
    ext = jnp.concatenate(pieces, axis=-1)
    V = ext[: (rows + 2) * Q].reshape(rows + 2, Q)
    ms = mats
    Qk = Q
    if padded:
        Qk = 256
        V = jnp.pad(V, ((0, 0), (0, Qk - Q)))
        ms = [np.pad(m, ((0, Qk - Q), (0, 0))) for m in mats]
    xs = [jax.lax.slice_in_dim(V, r, r + rows, axis=0)
          for (r, _, _) in splits]
    consts = []
    for m in ms:
        mh = m.astype(jnp.bfloat16)
        ml = (m - np.asarray(mh, np.float32)).astype(jnp.bfloat16)
        consts += [jnp.asarray(mh), jnp.asarray(ml)]
    out = pl.pallas_call(
        _k2dot, grid=(tiles,),
        in_specs=[pl.BlockSpec((R, Qk), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((Qk, P), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((R, P), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",)),
    )(*xs, *consts)
    return out.reshape(-1)[:out_len]


def fn_xla_rowblock(a, carry):
    return interp_ops._interpolatef_rowblock(a + carry, taps, P, Q, offs,
                                             L, out_len)


def fn_pallas_raw(a, carry):
    return pallas_rowblock(a + carry, padded=False)


def fn_pallas_pad(a, carry):
    return pallas_rowblock(a + carry, padded=True)


def fn_xla_c2(a, carry):
    cfg0 = config.default_config()
    M = interp_ops._direct_band_matrix(taps, P, Q, offs, L,
                                       np.dtype(np.float32), 2)
    nb = -(-out_len // (2 * P))
    need = nb * 2 * Q + M.shape[0]
    k = L % n
    pieces = ([a[n - k:]] if k else [])
    remaining = need - k
    a2 = a + carry
    pieces = ([a2[n - k:]] if k else [])
    while remaining > 0:
        take = min(remaining, n)
        pieces.append(a2[:take])
        remaining -= take
    ext = jnp.concatenate(pieces)
    return interp_ops._direct_apply(ext, jnp.asarray(M), P, Q, nb,
                                    2)[:out_len]


arms = (("xla-rowblock", fn_xla_rowblock), ("pallas-raw", fn_pallas_raw),
        ("pallas-pad", fn_pallas_pad), ("xla-c2", fn_xla_c2))
results = {}
for rep in range(3):
    for name, fn in arms:
        dt = timed(fn, x, iters=50)
        sp = timed.last_spread
        flag = "" if sp < 2 else "  [REJECT: spread]"
        print(f"{name}: {dt * 1e3:.4f} ms  ratio-r4 "
              f"{fl_r4 / (dt * 1e3):.3f} (spread {sp:.2f}){flag}",
              flush=True)
        if sp < 2:
            results.setdefault(name, []).append(dt)
print("# medians:", {k: f"{sorted(v)[len(v) // 2] * 1e3:.4f}"
                     for k, v in results.items()}, flush=True)
