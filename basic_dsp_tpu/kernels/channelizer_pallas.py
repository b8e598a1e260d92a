"""Pallas TPU megakernel for the 1024-channel polyphase channelizer + FM
demod pipeline (bench config #5; reference analog: the multi-ops chain a
user composes from convolution + fft + complex_to_real, SURVEY §2.4 —
there is no single reference function, the semantics anchor is
``parallel.channelizer.channelize_and_demod``).

The XLA realization materializes every stage in HBM (polyphase FIR ->
inner IDFT-n1 -> twiddle -> outer IDFT-128 -> conj-multiply demod ->
atan2), ~56 B/sample of traffic for a pipeline whose math is one small
matmul per row.  This kernel keeps a tile of time rows RESIDENT IN VMEM
through the whole chain:

* the polyphase FIR's tap-row lookback arrives as a 16-row head-halo
  block (clamped index_map, zeroed on tile 0 — no padded HBM copy of
  the signal); all-zero pad rows of the tap matrix are skipped at trace
  time;
* the inner unscaled inverse DFT-n1 runs as a radix-2 block FFT over the
  n1 lane groups (host-folded scalar twiddles, VPU adds — n1^2 dense
  mixing would cost 5x more);
* the outer IDFT-128 runs per lane group as 3-dot Karatsuba complex
  matmuls against constant planes, each dot a manual 3-pass bf16 hi/lo
  split (Mosaic rejects precision=HIGH; same grade as the reference's
  f32 FMA — see resample_pallas);
* the FM demod's one-row lookback reuses the tile's extra head row, and
  the (c1, c2) channel interleave stays folded into the caller's single
  f32 output transpose (identical layout contract to
  ``channelizer._idft_rows_planar``).

Contract: ``channelize_demod_pallas(xr, xi, taps_merged, C)`` returns
the (S, C) angle plane whose ``reshape(S, n1, 128)`` matches the planes
``channelize_and_demod`` transposes to (C, S) — parity pinned in
tests/test_pallas_channelizer.py (interpret) and probe_chan_pallas.py
(on-chip).  ``taps_merged`` is the DEVICE (tp1, C) matrix from
``channelizer._merged_tap_rows`` (may be a tracer — the kernel never
needs it on the host).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEFAULT_TILE_ROWS = 512  # probe_chan_tile: 512 beats 128/256/1024 at 4M
HALO_ROWS = 16           # tap-row lookback capacity (multiple of 8)
MAX_N1 = 16


def supported(C: int, S: int, taps_per_phase: int,
              tile_rows: int = DEFAULT_TILE_ROWS) -> bool:
    n1 = C // LANES
    return (C % LANES == 0 and 2 <= n1 <= MAX_N1
            and (n1 & (n1 - 1)) == 0          # radix-2 inner FFT
            and taps_per_phase + 1 <= HALO_ROWS  # merged rows = taps+1
            and S % tile_rows == 0 and S >= 2 * tile_rows
            and tile_rows % HALO_ROWS == 0)


def _atan2f(y, x):
    """f32 atan2 from Mosaic-supported primitives (no atan2 lowering in
    Pallas TPU).  Cephes atanf scheme: fold |y|/|x| into [0, 1] by
    octant swap, tan(pi/8) reduction, 4-term odd polynomial — ~1e-7
    absolute angle error, the same grade as XLA's f32 atan2.  Signed
    zero at the pi branch differs (returns +pi for atan2(-0, -1)) —
    the same point on the circle."""
    ay = jnp.abs(y)
    ax = jnp.abs(x)
    hi = jnp.maximum(ay, ax)
    lo = jnp.minimum(ay, ax)
    t = lo / jnp.where(hi == 0.0, 1.0, hi)            # [0, 1]
    big = t > 0.4142135623730950                       # tan(pi/8)
    t2 = jnp.where(big, (t - 1.0) / (t + 1.0), t)
    z = t2 * t2
    p = ((8.05374449538e-2 * z - 1.38776856032e-1) * z
         + 1.99777106478e-1) * z - 3.33329491539e-1
    r = t2 + t2 * z * p
    r = jnp.where(big, r + 0.7853981633974483, r)
    r = jnp.where(ay > ax, 1.5707963267948966 - r, r)  # un-swap octant
    r = jnp.where(x < 0.0, math.pi - r, r)
    r = jnp.where(hi == 0.0, 0.0, r)                   # atan2(0, 0) = 0
    return jnp.where(y < 0.0, -r, r)


def _dot3(x, mh, ml):
    """3-pass bf16 hi/lo f32 dot against a pre-split constant pair."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    return d(xh, mh) + d(xh, ml) + d(xl, mh)


def _ifft_blocks(br, bi):
    """Unscaled inverse radix-2 DIT FFT over equal-shaped VMEM blocks:
    out[a] = sum_b exp(+2i pi a b / n) in[b].  Twiddles are host floats —
    they fold into VPU scalar multiplies; trivial twiddles (1, +i) cost
    nothing."""
    n = len(br)
    if n == 1:
        return list(br), list(bi)
    er, ei = _ifft_blocks(br[0::2], bi[0::2])
    orr, oi = _ifft_blocks(br[1::2], bi[1::2])
    out_r = [None] * n
    out_i = [None] * n
    for k in range(n // 2):
        ang = 2.0 * math.pi * k / n
        tr, ti = math.cos(ang), math.sin(ang)
        if k == 0:
            vr, vi = orr[0], oi[0]
        elif 4 * k == n:      # twiddle = +i (inverse sign)
            vr, vi = -oi[k], orr[k]
        else:
            vr = orr[k] * tr - oi[k] * ti
            vi = orr[k] * ti + oi[k] * tr
        out_r[k] = er[k] + vr
        out_i[k] = ei[k] + vi
        out_r[k + n // 2] = er[k] - vr
        out_i[k + n // 2] = ei[k] - vi
    return out_r, out_i


@functools.lru_cache(maxsize=4)
def _twiddled_idft_consts(C: int):
    """Per-group outer-IDFT Karatsuba planes with the inter-factor
    twiddle folded in: F'_a = diag(exp(2i pi a l / C)) @ F128, computed
    in host f64 (one fewer f32 rounding than the in-kernel twiddle
    multiply).  Returns (Fr, Fm, Fp) stacked (n1, 128, 128) f32."""
    n1 = C // LANES
    l = np.arange(LANES)
    F = np.exp(2j * np.pi * np.outer(l, l) / LANES)
    frs, fms, fps = [], [], []
    for a in range(n1):
        Ta = np.exp(2j * np.pi * a * l / C)
        Fp = Ta[:, None] * F
        frs.append(Fp.real)
        fms.append(Fp.imag - Fp.real)
        fps.append(Fp.real + Fp.imag)
    # Stacked as 2-D (n1*128, 128): the kernel slices group a with a
    # static row slice [a*128:(a+1)*128] — an integer index under
    # ensure_compile_time_eval would be captured as a traced constant,
    # which pallas_call rejects (the runtime_ok probe compiles there).
    return (np.ascontiguousarray(np.concatenate(frs), dtype=np.float32),
            np.ascontiguousarray(np.concatenate(fms), dtype=np.float32),
            np.ascontiguousarray(np.concatenate(fps), dtype=np.float32))


def _chan_kernel(hr_ref, hi_ref, mr_ref, mi_ref, w_ref, g_ref,
                 pr_ref, pi_ref,
                 frh_ref, frl_ref, fmh_ref, fml_ref, fph_ref, fpl_ref,
                 *out_refs, n1, tp1, R, demod):
    """One grid step: (R+16) signal rows -> (R, C) demod angles (or the
    (zr, zi) conj-product planes when ``demod`` is False — the atan2
    then runs outside)."""
    H = HALO_ROWS
    # Tile 0's halo block is index-clamped garbage; the true look-back is
    # the (H, C) ``prefix`` input — zeros for a whole signal (causal
    # start), the left neighbor's last rows in the sharded path.  g_ref
    # streams a per-tile (8, C) gate block (0 on tile 0, 1 after; 8 rows
    # for the Mosaic sublane rule) — NOT pl.program_id, which has no
    # eager-eval rule and would break the once-per-process
    # ensure_compile_time_eval probe (runtime_ok).
    g = g_ref[0:1]                                    # (1, C)
    halo_r = hr_ref[...] * g + pr_ref[...] * (1.0 - g)
    halo_i = hi_ref[...] * g + pi_ref[...] * (1.0 - g)
    er = jnp.concatenate([halo_r, mr_ref[...]], axis=0)   # (R+H, C)
    ei = jnp.concatenate([halo_i, mi_ref[...]], axis=0)
    # Polyphase FIR: u_j = sum_k E[j+k] * w[k], j = 0..R (row j is
    # global time row i*R - 1 + j; the extra head row feeds the demod
    # lookback).  w[k] = TS[H-1-k] (flipped merged taps, head-padded
    # with H - tp1 all-zero rows that the static loop skips).
    w = w_ref[...]
    ur = None
    ui = None
    for k in range(H - tp1, H):
        row_w = w[k:k + 1]                 # (1, C)
        term_r = er[k:k + R + 1] * row_w
        term_i = ei[k:k + R + 1] * row_w
        ur = term_r if ur is None else ur + term_r
        ui = term_i if ui is None else ui + term_i
    # Inner unscaled inverse DFT-n1 over the lane groups (radix-2).
    Ur = [ur[:, b * LANES:(b + 1) * LANES] for b in range(n1)]
    Ui = [ui[:, b * LANES:(b + 1) * LANES] for b in range(n1)]
    Kr, Ki = _ifft_blocks(Ur, Ui)
    # Outer IDFT-128 per group: 3-dot Karatsuba, 3-pass each.  The
    # inter-factor twiddle is FOLDED into per-group right constants
    # F'_a = diag(T_a) @ F (host f64 product, hi/lo split) — the VPU
    # twiddle multiply disappears and one f32 rounding step with it.
    # Demod + store run per group: no (R+1, C) finish concats, each z
    # panel stores to its aligned 128-lane output slice directly.
    for a in range(n1):
        cr = Kr[a]
        ci = Ki[a]
        sl = slice(a * LANES, (a + 1) * LANES)
        k1 = _dot3(cr + ci, frh_ref[sl], frl_ref[sl])
        k2 = _dot3(cr, fmh_ref[sl], fml_ref[sl])
        k3 = _dot3(ci, fph_ref[sl], fpl_ref[sl])
        ya_r = k1 - k3                     # (R+1, LANES)
        ya_i = k1 + k2
        # FM demod: z = y[1:] * conj(y[:-1]); tile 0's row -1 is
        # IDFT(0) = 0, so ang[0] = atan2(0, 0) = 0 == the dup-row
        # convention's angle(|y|^2).
        cur_r, cur_i = ya_r[1:], ya_i[1:]
        pr, pi_ = ya_r[:-1], ya_i[:-1]
        zr = cur_r * pr + cur_i * pi_
        zi = cur_i * pr - cur_r * pi_
        lo = a * LANES
        if demod:
            out_refs[0][:, lo:lo + LANES] = _atan2f(zi, zr)
        else:
            out_refs[0][:, lo:lo + LANES] = zr
            out_refs[1][:, lo:lo + LANES] = zi


def channelize_demod_pallas(xr: jnp.ndarray, xi: jnp.ndarray,
                            taps_merged: jnp.ndarray, C: int,
                            tile_rows: int = DEFAULT_TILE_ROWS,
                            demod: bool = True,
                            prefix: tuple = None,
                            interpret: bool = False):
    """Fused channelize + conj-demod of planar (re, im) signal planes.

    ``taps_merged``: (tp1, C) merged prototype rows on DEVICE
    (``channelizer._merged_tap_rows``; tracers fine).  ``prefix``:
    optional (pre_r, pre_i) of (HALO_ROWS, C) look-back rows preceding
    the signal (sharded shard bodies pass the ppermute halo; None =
    zeros, the whole-signal causal start).  Returns the (S, C) angle
    plane when ``demod`` (caller reshapes/transposes to (C, S)), else
    the (zr, zi) planes for an outside atan2.  NOT jitted itself: the
    IDFT constants are built on the host at trace time, the device ops
    stage into the enclosing user jit."""
    n = xr.shape[-1]
    S = n // C
    R = tile_rows
    H = HALO_ROWS
    tiles = S // R
    n1 = C // LANES
    tp1 = taps_merged.shape[0]
    # Flip the tap rows and pad to H at the HEAD (earliest look-back rows
    # are zero); a tiny (H, C) device op that fuses upstream.
    w = jnp.concatenate(
        [jnp.zeros((H - tp1, C), jnp.float32),
         jnp.flip(taps_merged.astype(jnp.float32), axis=0)], axis=0)
    X_r = xr.reshape(S, C)
    X_i = xi.reshape(S, C)

    Fr, Fm, Fp = _twiddled_idft_consts(C)

    def split(M):
        h = M.astype(np.float32).astype(np.dtype(jnp.bfloat16))
        l = (M - np.asarray(h, np.float32)).astype(np.dtype(jnp.bfloat16))
        return jnp.asarray(h), jnp.asarray(l)

    frh, frl = split(Fr)
    fmh, fml = split(Fm)
    fph, fpl = split(Fp)

    halo_spec = pl.BlockSpec(
        (H, C), lambda i: (jnp.maximum(i * (R // H) - 1, 0), 0),
        memory_space=pltpu.VMEM)
    main_spec = pl.BlockSpec((R, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    # (8, C) blocks: Mosaic requires the sublane dim divisible by 8.
    gate_spec = pl.BlockSpec((8, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    gate = jnp.concatenate(
        [jnp.zeros((8, C), jnp.float32),
         jnp.ones((8 * (tiles - 1), C), jnp.float32)], axis=0)
    if prefix is None:
        pre_r = jnp.zeros((H, C), jnp.float32)
        pre_i = pre_r
    else:
        pre_r, pre_i = prefix

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((R, C), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sd = jax.ShapeDtypeStruct((S, C), jnp.float32)
    # Tile dim marked parallel (tiles are independent): lets Mosaic
    # pipeline block DMA more aggressively — probe_chan_dimsem measured
    # ~5% over the default on the same tunnel state.
    params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024,
        dimension_semantics=("parallel",))
    out = pl.pallas_call(
        functools.partial(_chan_kernel, n1=n1, tp1=tp1, R=R, demod=demod),
        grid=(tiles,),
        in_specs=[
            halo_spec, halo_spec, main_spec, main_spec,
            const_spec((H, C)), gate_spec,
            const_spec((H, C)), const_spec((H, C)),
            const_spec((n1 * LANES, LANES)), const_spec((n1 * LANES, LANES)),
            const_spec((n1 * LANES, LANES)), const_spec((n1 * LANES, LANES)),
            const_spec((n1 * LANES, LANES)), const_spec((n1 * LANES, LANES)),
        ],
        out_specs=out_spec if demod else (out_spec, out_spec),
        out_shape=out_sd if demod else (out_sd, out_sd),
        compiler_params=params,
        interpret=interpret,
    )(X_r, X_i, X_r, X_i, w, gate, pre_r, pre_i,
      frh, frl, fmh, fml, fph, fpl)
    return out


# A folded-lane variant ((S, C) viewed as (S/8, 8C) so the FIR's time-row
# lookback becomes lane-block addressing, one sublane shift instead of
# nine) was built and A/B'd on-chip in round 4: parity 2.5e-7 but
# 0.30-0.38 ms vs 0.24 here (probe_chan_fold in git history,
# probe_chan_shift).  The measurement shows the merged-tap FIR is
# READ-BANDWIDTH/FMA-bound, not relayout-bound: aligned lane slices read
# the same 9x bytes, and the folded form pays extra for its one roll,
# per-subrow panels and M=264 dot fills.  Deleted rather than gated off.

# None = unprobed; True/False after the once-per-process probe compile
# (pattern: resample_pallas.runtime_ok).
_RUNTIME_OK = [None]


def runtime_ok() -> bool:
    if _RUNTIME_OK[0] is None:
        try:
            C = 256
            S = 2 * DEFAULT_TILE_ROWS
            # ensure_compile_time_eval: the dispatch usually runs INSIDE
            # a user trace, where every jnp op returns a tracer; the
            # probe must execute EAGERLY to compile now (the kernel body
            # is program_id-free on purpose — see _chan_kernel's gate
            # row).  All-real ops — safe where eager complex fails.
            with jax.ensure_compile_time_eval():
                xr = jnp.zeros((S * C,), jnp.float32)
                taps_np = np.zeros((9, C), np.float32)
                taps_np[-1] = 1.0 / C
                out = channelize_demod_pallas(xr, xr, jnp.asarray(taps_np),
                                              C)
                float(np.asarray(out)[0, 0])
            _RUNTIME_OK[0] = True
        except Exception as e:
            _RUNTIME_OK[0] = False
            import warnings
            warnings.warn(
                "Pallas channelizer kernel failed its probe compile on "
                f"this runtime ({type(e).__name__}); using the XLA "
                "pipeline for the rest of the process. "
                "See DspConfig.use_pallas_channelizer.",
                RuntimeWarning, stacklevel=3)
    return _RUNTIME_OK[0]
