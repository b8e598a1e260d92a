"""Pallas TPU kernel for the blocked overlap-save convolution — the
"north-star hot loop" (reference convolution.rs:304-462: the sequential
fft(block) -> multiply H -> ifft -> copy/restore loop).

The XLA realization (ops/conv_ops.blocked_linear_conv) spends ~4 HBM round
trips because each FFT/IFFT stage materializes.  This kernel keeps a batch
of blocks RESIDENT IN VMEM for the whole fft -> xH -> ifft pipeline:

* the per-block FFT/IFFT are themselves factored four-steps whose stages
  are DFT matmuls against precomputed (r1, r1)/(r2, r2) DFT matrices —
  pure MXU work, no jnp.fft inside the kernel;
* the frequency response H is precomputed in the factored (k1, k2) layout
  so forward order never needs normalizing inside the kernel;
* blocks are zero-padded overlap-add tiles (L = fft_len - pad, pad a
  multiple of 128) so every BlockSpec stays lane-aligned; the cross-block
  tail fold happens outside on slices (cheap, pad-sized).

Contract: ``overlap_save_pallas(x, h, is_complex, fft_len)`` computes the
same circular centered convolution as ``ops.conv_ops.overlap_save``.

Status: correctness-verified in interpret mode (tests/test_pallas_os.py);
gated OFF by default — Mosaic compilation hangs on the axon tunnel
(CLAUDE.md), re-test on standard TPU runtimes via
``DspConfig(use_pallas_overlap_save=True)`` before enabling.
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
# Mosaic requires the second-to-last block dim to be a multiple of 8 (or
# the whole array dim); 8 blocks/tile also gives better DMA/compute overlap.
DEFAULT_BLOCKS_PER_TILE = 8


def _factor_fft_len(fft_len: int):
    """fft_len = r1 * r2 with both MXU-friendly (powers of two >= 32)."""
    r1 = 1 << ((fft_len - 1).bit_length() // 2)
    r2 = fft_len // r1
    assert r1 * r2 == fft_len, "fft_len must be a power of two"
    return r1, r2


@functools.lru_cache(maxsize=8)
def _dft_planes(fft_len: int):
    """Precomputed DFT stage constants, all float32 numpy:

    F1[k1, j1] = w_r1^(k1 j1)           (r1, r1)
    T [k1, j2] = w_N^(k1 j2)            (r1, r2)
    F2[j2, k2] = w_r2^(j2 k2)           (r2, r2)
    plus the conjugate/inverse versions with 1/r scaling folded in.
    """
    r1, r2 = _factor_fft_len(fft_len)
    j1 = np.arange(r1)
    j2 = np.arange(r2)
    F1 = np.exp(-2j * np.pi * np.outer(j1, j1) / r1)
    T = np.exp(-2j * np.pi * np.outer(j1, j2) / fft_len)
    F2 = np.exp(-2j * np.pi * np.outer(j2, j2) / r2)
    F1i = np.conj(F1) / r1
    F2i = np.conj(F2) / r2
    Ti = np.conj(T)
    c64 = lambda a: a.astype(np.complex64)  # noqa: E731
    return tuple(np.ascontiguousarray(p).astype(np.float32)
                 for m in map(c64, (F1, T, F2, F1i, Ti, F2i))
                 for p in (m.real, m.imag))


def _cm(ar, ai, br, bi):
    """Complex matmul on f32 planes (batched last-two-dims contraction).
    precision=HIGHEST: ``preferred_element_type`` only pins the
    accumulator; operands would otherwise round to bf16 on the MXU."""
    def mm(a, b):
        return jnp.einsum("...ij,jk->...ik", a, b,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    rr = mm(ar, br)
    ri = mm(ar, bi)
    ir = mm(ai, br)
    ii = mm(ai, bi)
    return rr - ii, ri + ir


def _four_step(xr, xi, r1, r2, F1r, F1i, Tr, Ti, F2r, F2i):
    """Factored DFT of (B, fft_len) planes -> (B, r1, r2) (k1, k2) layout.

    D = ((F1 @ A) * T) @ F2 with A[b, j1, j2] = x[b, j1*r2 + j2].
    Stage 1 contracts j1: computed as (A^T @ F1^T)^T via last-axis
    contraction so every matmul is a plain (..., i, j) x (j, k) MXU op.
    """
    B = xr.shape[0]
    Ar = xr.reshape(B, r1, r2)
    Ai = xi.reshape(B, r1, r2)
    # Stage 1 over j1: swap to (B, j2, j1), contract with F1^T == F1
    # (symmetric), swap back to (B, k1, j2).
    Br_, Bi_ = _cm(Ar.swapaxes(-1, -2), Ai.swapaxes(-1, -2), F1r, F1i)
    Br_ = Br_.swapaxes(-1, -2)
    Bi_ = Bi_.swapaxes(-1, -2)
    Cr = Br_ * Tr - Bi_ * Ti
    Ci = Br_ * Ti + Bi_ * Tr
    return _cm(Cr, Ci, F2r, F2i)        # (B, k1, k2)


def _four_step_inv(Dr, Di, r1, r2, F1ir, F1ii, Tir, Tii, F2ir, F2ii):
    """Inverse of _four_step: A = F1i @ ((D @ F2i) * Ti) back to planes."""
    B = Dr.shape[0]
    Cr, Ci = _cm(Dr, Di, F2ir, F2ii)               # undo stage 2
    Cr2 = Cr * Tir - Ci * Tii                       # undo twiddle
    Ci2 = Cr * Tii + Ci * Tir
    # Undo stage 1 (contract k1): swap, multiply F1i^T == F1i, swap back.
    Ar, Ai = _cm(Cr2.swapaxes(-1, -2), Ci2.swapaxes(-1, -2), F1ir, F1ii)
    Ar = Ar.swapaxes(-1, -2)
    Ai = Ai.swapaxes(-1, -2)
    return Ar.reshape(B, r1 * r2), Ai.reshape(B, r1 * r2)


def _os_kernel(br_ref, bi_ref, hr_ref, hi_ref, c_ref, or_ref, oi_ref, *,
               r1, r2, L):
    """One grid step: (B, L) blocks -> (B, fft_len) linear-conv pieces."""
    fft_len = r1 * r2
    B = br_ref.shape[0]
    pad = fft_len - L
    zeros = jnp.zeros((B, pad), dtype=jnp.float32)
    xr = jnp.concatenate([br_ref[...], zeros], axis=-1)
    xi = jnp.concatenate([bi_ref[...], zeros], axis=-1)
    consts = c_ref[...]
    (F1r, F1i, Tr, Ti, F2r, F2i,
     F1ir, F1ii, Tir, Tii, F2ir, F2ii) = [consts[i] for i in range(12)]
    # Constants are stored padded to (r_max, r_max); slice actual shapes.
    F1r, F1i = F1r[:r1, :r1], F1i[:r1, :r1]
    Tr, Ti = Tr[:r1, :r2], Ti[:r1, :r2]
    F2r, F2i = F2r[:r2, :r2], F2i[:r2, :r2]
    F1ir, F1ii = F1ir[:r1, :r1], F1ii[:r1, :r1]
    Tir, Tii = Tir[:r1, :r2], Tii[:r1, :r2]
    F2ir, F2ii = F2ir[:r2, :r2], F2ii[:r2, :r2]
    Dr, Di = _four_step(xr, xi, r1, r2, F1r, F1i, Tr, Ti, F2r, F2i)
    Hr = hr_ref[...][:r1, :r2]
    Hi = hi_ref[...][:r1, :r2]
    Yr = Dr * Hr - Di * Hi
    Yi = Dr * Hi + Di * Hr
    yr, yi = _four_step_inv(Yr, Yi, r1, r2, F1ir, F1ii, Tir, Tii,
                            F2ir, F2ii)
    or_ref[...] = yr
    oi_ref[...] = yi


def _pack_consts(fft_len: int):
    r1, r2 = _factor_fft_len(fft_len)
    planes = _dft_planes(fft_len)
    r = max(r1, r2)
    out = np.zeros((12, r, r), dtype=np.float32)
    shapes = [(r1, r1), (r1, r1), (r1, r2), (r1, r2), (r2, r2), (r2, r2),
              (r1, r1), (r1, r1), (r1, r2), (r1, r2), (r2, r2), (r2, r2)]
    for i, (p, (a, b)) in enumerate(zip(planes, shapes)):
        out[i, :a, :b] = p
    return jnp.asarray(out)


@functools.partial(jax.jit, static_argnames=("fft_len", "blocks_per_tile",
                                             "interpret"))
def _blocked_linear_conv_pallas(xr, xi, hr, hi, fft_len: int,
                                blocks_per_tile: int, interpret: bool):
    """Linear convolution len(x) + m_eff - 1 via the VMEM-resident
    overlap-add pipeline.  Planes in, planes out."""
    n = xr.shape[-1]
    m_eff = hr.shape[-1]
    r1, r2 = _factor_fft_len(fft_len)
    pad = -(-(m_eff - 1) // LANES) * LANES
    L = fft_len - pad
    assert L > 0 and L % LANES == 0
    nb = -(-n // L)
    B = blocks_per_tile
    tiles = -(-nb // B)
    rows = tiles * B
    xr_b = jnp.pad(xr, (0, rows * L - n)).reshape(rows, L)
    xi_b = jnp.pad(xi, (0, rows * L - n)).reshape(rows, L)
    # H in the factored (k1, k2) layout (forward four-step of padded taps),
    # with the 1/fft_len IFFT scale folded in via F1i/F2i already.
    hpad_r = jnp.pad(hr, (0, fft_len - m_eff))
    hpad_i = jnp.pad(hi, (0, fft_len - m_eff))
    pl_ = _dft_planes(fft_len)
    Hr_, Hi_ = _four_step(hpad_r[None], hpad_i[None], r1, r2,
                          *[jnp.asarray(p) for p in pl_[:6]])
    r = max(r1, r2)
    Hr_p = jnp.zeros((r, r), jnp.float32).at[:r1, :r2].set(Hr_[0])
    Hi_p = jnp.zeros((r, r), jnp.float32).at[:r1, :r2].set(Hi_[0])
    consts = _pack_consts(fft_len)

    grid = (tiles,)
    in_specs = [
        pl.BlockSpec((B, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((12, r, r), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((B, fft_len), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_os_kernel, r1=r1, r2=r2, L=L),
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((rows, fft_len), jnp.float32),
                   jax.ShapeDtypeStruct((rows, fft_len), jnp.float32)),
        interpret=interpret,
    )(xr_b, xi_b, Hr_p, Hi_p, consts)

    # Overlap-add fold (outside the kernel: slices over pad-sized tails).
    def fold(y):
        main = y[:nb, :L].reshape(nb * L)
        tails = y[:nb, L:]
        tpad = jnp.pad(tails, ((0, 0), (0, L - pad))).reshape(nb * L)
        total = nb * L + pad
        main_f = jnp.pad(main, (0, pad))
        tail_f = jnp.pad(tpad, (L, 0))[:total]
        return (main_f + tail_f)[: n + m_eff - 1]

    return fold(yr), fold(yi)


def overlap_save_pallas(x: jnp.ndarray, h: jnp.ndarray, is_complex: bool,
                        fft_len: int,
                        blocks_per_tile: int = DEFAULT_BLOCKS_PER_TILE,
                        interpret: bool = False) -> jnp.ndarray:
    """Circular centered convolution — semantics identical to
    ``ops.conv_ops.overlap_save`` — via the VMEM-resident Pallas pipeline.
    """
    n = x.shape[-1]
    m = h.shape[-1]
    start, length, c = _clip_kernel(n, m)
    m_eff = length
    h_eff = h[..., start:start + length]
    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)
    hr = jnp.real(h_eff).astype(jnp.float32)
    hi = jnp.imag(h_eff).astype(jnp.float32)
    lr, li = _blocked_linear_conv_pallas(xr, xi, hr, hi, fft_len,
                                         blocks_per_tile, interpret)

    def circ(lin):
        head = lin[: m_eff - 1] + lin[n:]
        folded = jnp.concatenate([head, lin[m_eff - 1: n]])
        return jnp.roll(folded, -(c - 1))

    out_r = circ(lr)
    out_i = circ(li)
    if not is_complex:
        return out_r.astype(jnp.real(x).dtype)
    return (out_r + 1j * out_i).astype(
        jnp.result_type(x.dtype, jnp.complex64))
