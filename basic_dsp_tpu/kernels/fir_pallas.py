"""Pallas TPU kernel for the direct FIR (circular centered convolution).

This is the hand-scheduled version of :func:`ops.conv_ops.toeplitz_conv`
(the TPU re-design of the reference's SIMD shifted-kernel-copies MAC loop,
time_freq/mod.rs:81-165, 498-610): the signal is viewed as (rows, 128)
lanes; a tap shift ``e = 128a + b`` factors into a row shift ``a`` and a
lane shift ``b``; the weighted sum over lane shifts is a matmul against a
banded 128x128 Toeplitz tap matrix ``T_a``, so

    out[r] = sum_a z[r + a] @ T_a

runs entirely on the MXU.  The Pallas kernel streams the signal through
VMEM in row tiles (Pallas double-buffers the HBM->VMEM copies across grid
steps); each tile's ``n_shifts``-row halo arrives as a second, pre-sliced
input so all block specs stay block-aligned.

Complex data is handled planar: (re, im) each convolved against (T_re,
T_im) with the cross terms combined in-kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.conv_ops import _clip_kernel

LANES = 128
DEFAULT_TILE_ROWS = 256  # 32K samples per grid step


def _tap_matrices(q, m_eff: int, n_shifts: int):
    """T_a[j, col] = q[128*a + j - col] where defined; shape
    (n_shifts, 128, 128).  Traceable (q may be a jax array)."""
    j = np.arange(LANES)[:, None]
    col = np.arange(LANES)[None, :]
    mats = []
    for a in range(n_shifts):
        e = LANES * a + j - col
        mask = (e >= 0) & (e < m_eff)
        idx = np.where(mask, e, 0)
        mats.append(jnp.where(jnp.asarray(mask), q[idx], 0))
    return jnp.stack(mats)


def _dot_f32(a, b):
    """MXU dot at f32-exact precision.  ``preferred_element_type`` alone
    only sets the ACCUMULATOR dtype — the operands still round to bf16
    (measured 2.4e-3 rel err on v5e); precision=HIGHEST forces the
    6-pass f32-exact product, matching the package-wide contract
    (CLAUDE.md "MXU matmul precision")."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _fir_kernel_real(z_ref, halo_ref, taps_ref, out_ref, *, tile_rows,
                     n_shifts):
    full = jnp.concatenate([z_ref[:, :], halo_ref[0]], axis=0)
    acc = _dot_f32(full[0:tile_rows, :], taps_ref[0])
    for a in range(1, n_shifts):
        acc += _dot_f32(full[a:a + tile_rows, :], taps_ref[a])
    out_ref[:, :] = acc


def _fir_kernel_complex(zr_ref, zi_ref, hr_ref, hi_ref, tr_ref, ti_ref,
                        or_ref, oi_ref, *, tile_rows, n_shifts):
    fr = jnp.concatenate([zr_ref[:, :], hr_ref[0]], axis=0)
    fi = jnp.concatenate([zi_ref[:, :], hi_ref[0]], axis=0)
    acc_r = jnp.zeros((tile_rows, LANES), dtype=jnp.float32)
    acc_i = jnp.zeros((tile_rows, LANES), dtype=jnp.float32)
    for a in range(n_shifts):
        zr = fr[a:a + tile_rows, :]
        zi = fi[a:a + tile_rows, :]
        tr = tr_ref[a]
        ti = ti_ref[a]
        acc_r += _dot_f32(zr, tr) - _dot_f32(zi, ti)
        acc_i += _dot_f32(zr, ti) + _dot_f32(zi, tr)
    or_ref[:, :] = acc_r
    oi_ref[:, :] = acc_i


def _rows_and_halos(z: jnp.ndarray, n: int, tiles: int, tile_rows: int,
                    n_shifts: int):
    """Returns (tiles*tile_rows, 128) row view plus per-tile halo rows
    (tiles, n_shifts, 128), built from slices/reshapes only.  The final
    halo wraps circularly."""
    rows_main = tiles * tile_rows
    need = (rows_main + n_shifts) * LANES
    reps = -(-need // n) + 1
    ext = jnp.tile(z, reps)[:need].reshape(rows_main + n_shifts, LANES)
    main = ext[:rows_main]
    z2 = main.reshape(tiles, tile_rows, LANES)
    # Tile i's halo = rows [(i+1)*tile_rows, ...+n_shifts).
    halos = jnp.concatenate(
        [z2[1:, :n_shifts], ext[None, rows_main:rows_main + n_shifts]],
        axis=0)
    return main, halos


@functools.partial(jax.jit,
                   static_argnames=("is_complex", "tile_rows", "interpret"))
def fir_conv(x: jnp.ndarray, h: jnp.ndarray, is_complex: bool,
             tile_rows: int = DEFAULT_TILE_ROWS,
             interpret: bool = False) -> jnp.ndarray:
    """Circular centered convolution via the Pallas MXU kernel.

    Semantics identical to ``toeplitz_conv`` / ``convolve_signal_fft``.
    f32 compute (complex64 as planar floats); kernel taps must be
    convertible at trace time (concrete array).
    """
    n = x.shape[-1]
    m = h.shape[-1]
    start, length, c = _clip_kernel(n, m)
    m_eff = length
    h_eff = h[..., start:start + length]
    q = h_eff[::-1]
    R = -(-n // LANES)
    # Shift a covers tap offsets e in [128a-127, 128a+127]; covering
    # e in [0, m_eff) needs ceil((m_eff + 127) / 128) shifts.
    n_shifts = -(-(m_eff + LANES - 1) // LANES)
    tile_rows = min(tile_rows, max(8, R))
    tiles = -(-R // tile_rows)

    grid = (tiles,)
    main_spec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((1, n_shifts, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    taps_spec = pl.BlockSpec((n_shifts, LANES, LANES), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)

    if not is_complex and not jnp.iscomplexobj(h_eff):
        taps = _tap_matrices(q, m_eff, n_shifts).astype(jnp.float32)
        z = jnp.roll(x, m_eff - c, axis=-1).astype(jnp.float32)
        main, halos = _rows_and_halos(z, n, tiles, tile_rows, n_shifts)
        out = pl.pallas_call(
            functools.partial(_fir_kernel_real, tile_rows=tile_rows,
                              n_shifts=n_shifts),
            grid=grid,
            in_specs=[main_spec, halo_spec, taps_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((tiles * tile_rows, LANES),
                                           jnp.float32),
            interpret=interpret,
        )(main, halos, taps)
        return out.reshape(-1)[:n].astype(x.dtype)

    taps_r = _tap_matrices(jnp.real(q), m_eff, n_shifts).astype(jnp.float32)
    taps_i = _tap_matrices(jnp.imag(q), m_eff, n_shifts).astype(jnp.float32)
    z = jnp.roll(x, m_eff - c, axis=-1)
    main_r, halos_r = _rows_and_halos(jnp.real(z).astype(jnp.float32), n,
                                      tiles, tile_rows, n_shifts)
    main_i, halos_i = _rows_and_halos(jnp.imag(z).astype(jnp.float32), n,
                                      tiles, tile_rows, n_shifts)
    out_r, out_i = pl.pallas_call(
        functools.partial(_fir_kernel_complex, tile_rows=tile_rows,
                          n_shifts=n_shifts),
        grid=grid,
        in_specs=[main_spec, main_spec, halo_spec, halo_spec,
                  taps_spec, taps_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((tiles * tile_rows, LANES),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((tiles * tile_rows, LANES),
                                        jnp.float32)),
        interpret=interpret,
    )(main_r, main_i, halos_r, halos_i, taps_r, taps_i)
    out = (out_r.reshape(-1)[:n] + 1j * out_i.reshape(-1)[:n])
    return out.astype(jnp.result_type(x.dtype, jnp.complex64))
