"""cfg5 pre-test: does the channelizer kernel's (R+16, C) halo concat
cost real time?  Arm B replaces ``er = concat(halo, main)`` with direct
main-ref slices (bulk-only, zeros in the first 16 rows — timing only).

RESULT (2026-08-20, v5e, same-session): shipped 0.197/0.223 vs
noconcat 0.221/0.218 ms — the concat costs NOTHING measurable (Mosaic
hides it under the FIR's 9-read budget).  The region-split rework
(VERDICT r4 #4's last sketched lever) therefore has no budget to win;
cfg5 stays at its tap-count x area read bound (probe_chan_shift, r4).
"""
import functools
import math
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from basic_dsp_tpu.kernels import channelizer_pallas as cp
from basic_dsp_tpu.parallel import channelizer
from bench_all import timed, tunnel_probe

print(f"# tunnel probe {tunnel_probe():.2f} us", flush=True)
n = 1 << 22
C = 1024
rng = np.random.default_rng(0)
xr = jnp.asarray(rng.normal(size=n).astype(np.float32))
xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
proto = jnp.asarray((np.hamming(C * 8) / C).astype(np.float32))
taps_merged = channelizer._merged_tap_rows(proto, C)

# Arm A: shipped kernel
def fn_a(ar, ai, carry):
    out = cp.channelize_demod_pallas(ar + carry, ai, taps_merged, C)
    return out

# Arm B: no-concat variant (same class, halo ignored — WRONG first rows)
def _kernel_noconcat(hr_ref, hi_ref, mr_ref, mi_ref, w_ref, g_ref,
                     pr_ref, pi_ref,
                     frh_ref, frl_ref, fmh_ref, fml_ref, fph_ref, fpl_ref,
                     out_ref, n1, tp1, R):
    """BULK-ONLY timing variant: the FIR accumulates pure main-ref
    slices (no (R+16, C) concat anywhere); the first 16 output rows are
    stored as zeros (the real rework would compute them from a small
    (32, C) head concat, ~3% extra work)."""
    H = cp.HALO_ROWS
    w = w_ref[...]
    er = mr_ref[...]
    ei = mi_ref[...]
    Rb = R - H  # bulk output rows: out rows H..R-1
    ur = None
    ui = None
    for k in range(H - tp1, H):
        row_w = w[k:k + 1]
        # out row j (j = H-1 .. R-1, i.e. Rb+1 ur rows for the demod
        # lookback) reads main rows j + k - H ... all within [0, R)
        term_r = er[k - tp1 + 8:k - tp1 + 8 + Rb + 1] * row_w
        term_i = ei[k - tp1 + 8:k - tp1 + 8 + Rb + 1] * row_w
        ur = term_r if ur is None else ur + term_r
        ui = term_i if ui is None else ui + term_i
    Ur = [ur[:, b * 128:(b + 1) * 128] for b in range(n1)]
    Ui = [ui[:, b * 128:(b + 1) * 128] for b in range(n1)]
    Kr, Ki = cp._ifft_blocks(Ur, Ui)
    for a in range(n1):
        cr, ci = Kr[a], Ki[a]
        sl = slice(a * 128, (a + 1) * 128)
        k1 = cp._dot3(cr + ci, frh_ref[sl], frl_ref[sl])
        k2 = cp._dot3(cr, fmh_ref[sl], fml_ref[sl])
        k3 = cp._dot3(ci, fph_ref[sl], fpl_ref[sl])
        ya_r, ya_i = k1 - k3, k1 + k2
        cur_r, cur_i = ya_r[1:], ya_i[1:]
        pr, pi_ = ya_r[:-1], ya_i[:-1]
        zr = cur_r * pr + cur_i * pi_
        zi = cur_i * pr - cur_r * pi_
        out_ref[0:H, a * 128:(a + 1) * 128] = jnp.zeros((H, 128),
                                                        jnp.float32)
        out_ref[H:R, a * 128:(a + 1) * 128] = cp._atan2f(zi, zr)


def chan_noconcat(xr_, xi_, taps, C):
    n_ = xr_.shape[-1]
    S = n_ // C
    R = cp.DEFAULT_TILE_ROWS
    H = cp.HALO_ROWS
    tiles = S // R
    n1 = C // 128
    tp1 = taps.shape[0]
    w = jnp.concatenate([jnp.zeros((H - tp1, C), jnp.float32),
                         jnp.flip(taps.astype(jnp.float32), axis=0)], axis=0)
    X_r = xr_.reshape(S, C)
    X_i = xi_.reshape(S, C)
    Fr, Fm, Fp = cp._twiddled_idft_consts(C)

    def split(M):
        h = M.astype(np.float32).astype(np.dtype(jnp.bfloat16))
        l = (M - np.asarray(h, np.float32)).astype(np.dtype(jnp.bfloat16))
        return jnp.asarray(h), jnp.asarray(l)

    frh, frl = split(Fr); fmh, fml = split(Fm); fph, fpl = split(Fp)
    halo_spec = pl.BlockSpec((H, C),
                             lambda i: (jnp.maximum(i * (R // H) - 1, 0), 0),
                             memory_space=pltpu.VMEM)
    main_spec = pl.BlockSpec((R, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    gate_spec = pl.BlockSpec((8, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    gate = jnp.concatenate([jnp.zeros((8, C), jnp.float32),
                            jnp.ones((8 * (tiles - 1), C), jnp.float32)],
                           axis=0)
    pre = jnp.zeros((H, C), jnp.float32)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_noconcat, n1=n1, tp1=tp1, R=R),
        grid=(tiles,),
        in_specs=[halo_spec, halo_spec, main_spec, main_spec,
                  const_spec((H, C)), gate_spec,
                  const_spec((H, C)), const_spec((H, C)),
                  const_spec((n1 * 128, 128)), const_spec((n1 * 128, 128)),
                  const_spec((n1 * 128, 128)), const_spec((n1 * 128, 128)),
                  const_spec((n1 * 128, 128)), const_spec((n1 * 128, 128))],
        out_specs=pl.BlockSpec((R, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",)),
    )(X_r, X_i, X_r, X_i, w, gate, pre, pre,
      frh, frl, fmh, fml, fph, fpl)
    return out


def fn_b(ar, ai, carry):
    return chan_noconcat(ar + carry, ai, taps_merged, C)


for rep in range(3):
    for name, fn in (("shipped", fn_a), ("noconcat", fn_b)):
        try:
            dt = timed(fn, xr, xi, iters=20)
            print(f"{name}: {dt * 1e3:.4f} ms (spread "
                  f"{timed.last_spread:.2f})", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            raise SystemExit
