"""Pallas TPU kernel for the blocked overlap-save convolution — the
"north-star hot loop" (reference convolution.rs:304-462: the sequential
fft(block) -> multiply H -> ifft -> copy/restore loop).

The XLA realization (ops/conv_ops.blocked_linear_conv) spends ~4 HBM round
trips because each FFT/IFFT stage materializes.  This kernel keeps a batch
of blocks RESIDENT IN VMEM for the whole fft -> xH -> ifft pipeline.

Round-3 rewrite (VERDICT r2 #3): the round-2 version died in Mosaic with
an INTERNAL HTTP 500; it used batched 3-D einsums and in-kernel
``swapaxes(-1, -2)`` (lane<->sublane transposes).  This version follows
the idiom of the spectrum kernel that COMPILES AND WINS on this runtime
(kernels/spectrum_pallas.py):

* the FFT factorization is pinned to ``fft_len = r1 * 128`` so the lane
  axis is always exactly 128 — every lane slice is aligned;
* per-block (r1, 128) matrices are re-batched by CONCATENATION — along
  lanes for the left (stage-1) dots, along sublanes for the right
  (stage-2) dots — never by axis transposes;
* every matmul is a plain 2-D dot against a constant plane, in 3-mult
  (Karatsuba) complex form, precision pinned (CLAUDE.md:
  preferred_element_type alone rounds operands to bf16).

Per (B, fft_len) tile: A_b = block_b.reshape(r1, 128); forward
D = (F1 @ A ∘ T) @ F2, multiply the factored-layout H, inverse
A' = F1i @ ((Y @ F2i) ∘ Ti); 12 dots total (3 per complex matmul).

Contract: ``overlap_save_pallas(x, h, is_complex, fft_len)`` computes the
same circular centered convolution as ``ops.conv_ops.overlap_save``.

Correctness: interpret-mode parity in tests/test_pallas_os.py; on-chip
compile/parity/A-B via probe_os3.py.
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
    """fft_len = r1 * 128: the lane axis is pinned to 128 so every lane
    slice in the kernel is Mosaic-aligned.  Needs 1024 <= fft_len <= 16384
    (r1 in [8, 128]: sublane tiles stay multiples of 8)."""
    assert fft_len % LANES == 0 and fft_len & (fft_len - 1) == 0, fft_len
    r1 = fft_len // LANES
    assert 8 <= r1 <= 128, fft_len
    return r1, LANES


def supported(fft_len: int) -> bool:
    return (fft_len & (fft_len - 1)) == 0 and 1024 <= fft_len <= 16384


@functools.lru_cache(maxsize=8)
def _dft_planes(fft_len: int):
    """Forward/inverse DFT stage constants as f32 numpy planes:

    F1[k1, j1] = w_r1^(k1 j1)            (r1, r1)
    T [k1, j2] = w_N^(k1 j2)             (r1, 128)
    F2[j2, k2] = w_128^(j2 k2)           (128, 128)
    and the conjugates with the 1/fft_len IFFT scale folded into F1i/F2i.
    Returned per matrix as LEFT-Karatsuba planes (Fr, Fi+Fr, Fi-Fr) for
    the stage-1 dots and RIGHT-Karatsuba planes (Fr, Fi-Fr, Fi+Fr) for
    the stage-2 dots (see spectrum_pallas._dft_planes/_inner_consts).
    """
    r1, r2 = _factor_fft_len(fft_len)
    j1 = np.arange(r1)
    j2 = np.arange(r2)
    F1 = np.exp(-2j * np.pi * np.outer(j1, j1) / r1).astype(np.complex64)
    T = np.exp(-2j * np.pi * np.outer(j1, j2) / fft_len).astype(np.complex64)
    F2 = np.exp(-2j * np.pi * np.outer(j2, j2) / r2).astype(np.complex64)
    F1i = (np.conj(F1) / r1).astype(np.complex64)
    F2i = (np.conj(F2) / r2).astype(np.complex64)
    Ti = np.conj(T).astype(np.complex64)

    def left(M):   # planes for k = L @ d (constant on the LEFT)
        fr, fi = M.real.astype(np.float32), M.imag.astype(np.float32)
        return (np.ascontiguousarray(fr), np.ascontiguousarray(fi + fr),
                np.ascontiguousarray(fi - fr))

    def right(M):  # planes for k = d @ R (constant on the RIGHT)
        fr, fi = M.real.astype(np.float32), M.imag.astype(np.float32)
        return (np.ascontiguousarray(fr), np.ascontiguousarray(fi - fr),
                np.ascontiguousarray(fi + fr))

    return (left(F1), right(F2), left(F1i), right(F2i),
            (np.ascontiguousarray(T.real.astype(np.float32)),
             np.ascontiguousarray(T.imag.astype(np.float32))),
            (np.ascontiguousarray(Ti.real.astype(np.float32)),
             np.ascontiguousarray(Ti.imag.astype(np.float32))))


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _cm_left(fr, fp, fm, dr, di):
    """(fr + i fi) @ (dr + i di), 3 dots, LEFT planes (fr, fi+fr, fi-fr)."""
    k1 = _dot(fr, dr + di)
    k2 = _dot(fm, dr)
    k3 = _dot(fp, di)
    return k1 - k3, k1 + k2


def _cm_right(dr, di, fr, fm, fp):
    """(dr + i di) @ (fr + i fi), 3 dots, RIGHT planes (fr, fi-fr, fi+fr)."""
    k1 = _dot(dr + di, fr)
    k2 = _dot(dr, fm)
    k3 = _dot(di, fp)
    return k1 - k3, k1 + k2


def _os_kernel(br_ref, bi_ref, hr_ref, hi_ref,
               f1r_ref, f1p_ref, f1m_ref, f2r_ref, f2m_ref, f2p_ref,
               g1r_ref, g1p_ref, g1m_ref, g2r_ref, g2m_ref, g2p_ref,
               tr_ref, ti_ref, ur_ref, ui_ref,
               or_ref, oi_ref, *, r1, B, L):
    """One grid step: (B, L) blocks -> (B, fft_len) linear-conv pieces.

    All data movement is aligned concatenation (lanes for the per-block
    stage-1 layout, sublanes for the wide stage-2 stack); the only
    reshapes merge/split whole trailing axes — the pattern the spectrum
    kernel compiles with on this runtime.
    """
    fft_len = r1 * LANES
    pad = fft_len - L
    zeros = jnp.zeros((B, pad), dtype=jnp.float32)
    xr = jnp.concatenate([br_ref[...], zeros], axis=-1)
    xi = jnp.concatenate([bi_ref[...], zeros], axis=-1)
    # Per-block (r1, 128) matrices, lanes-concatenated: (r1, B*128).
    Ar3 = xr.reshape(B, r1, LANES)
    Ai3 = xi.reshape(B, r1, LANES)
    ar = jnp.concatenate([Ar3[b] for b in range(B)], axis=-1)
    ai = jnp.concatenate([Ai3[b] for b in range(B)], axis=-1)
    # Forward stage 1 (contract j1): left-constant 3-dot complex matmul.
    br, bi = _cm_left(f1r_ref[...], f1p_ref[...], f1m_ref[...], ar, ai)
    # Twiddle, tiled along the lane concat.
    tr = jnp.concatenate([tr_ref[...]] * B, axis=-1)
    ti = jnp.concatenate([ti_ref[...]] * B, axis=-1)
    cr = br * tr - bi * ti
    ci = br * ti + bi * tr
    # Re-batch for the right dots: sublane-concat the aligned lane slices
    # -> (B*r1, 128).
    sr = jnp.concatenate([cr[:, b * LANES:(b + 1) * LANES]
                          for b in range(B)], axis=0)
    si = jnp.concatenate([ci[:, b * LANES:(b + 1) * LANES]
                          for b in range(B)], axis=0)
    # Forward stage 2 (contract j2): right-constant 3-dot complex matmul.
    dr, di = _cm_right(sr, si, f2r_ref[...], f2m_ref[...], f2p_ref[...])
    # Frequency response in the factored (k1, k2) layout, tiled along
    # sublanes to match the (B*r1, 128) stack.
    hr = jnp.concatenate([hr_ref[...]] * B, axis=0)
    hi = jnp.concatenate([hi_ref[...]] * B, axis=0)
    yr = dr * hr - di * hi
    yi = dr * hi + di * hr
    # Inverse stage 2 (right dot against F2i planes).
    er, ei = _cm_right(yr, yi, g2r_ref[...], g2m_ref[...], g2p_ref[...])
    # Inverse twiddle, tiled along sublanes.
    ur = jnp.concatenate([ur_ref[...]] * B, axis=0)
    ui = jnp.concatenate([ui_ref[...]] * B, axis=0)
    vr = er * ur - ei * ui
    vi = er * ui + ei * ur
    # Back to the lanes-concat layout for the inverse left dot.
    wr = jnp.concatenate([vr[b * r1:(b + 1) * r1] for b in range(B)],
                         axis=-1)
    wi = jnp.concatenate([vi[b * r1:(b + 1) * r1] for b in range(B)],
                         axis=-1)
    zr, zi = _cm_left(g1r_ref[...], g1p_ref[...], g1m_ref[...], wr, wi)
    # (r1, B*128) -> (B, fft_len): stack the lane slices (block-major),
    # then merge the whole trailing (r1, 128) into lanes.
    outs_r = jnp.stack([zr[:, b * LANES:(b + 1) * LANES] for b in range(B)])
    outs_i = jnp.stack([zi[:, b * LANES:(b + 1) * LANES] for b in range(B)])
    or_ref[...] = outs_r.reshape(B, fft_len)
    oi_ref[...] = outs_i.reshape(B, fft_len)


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
    # H in the factored (k1, k2) layout: forward four-step of the padded
    # taps, computed OUTSIDE the kernel in plain XLA (tiny).
    planes = _dft_planes(fft_len)
    (f1, f2, g1, g2, (Tr, Ti), (Uir, Uii)) = planes
    hpad = (jnp.pad(hr, (0, fft_len - m_eff)).astype(jnp.complex64)
            + 1j * jnp.pad(hi, (0, fft_len - m_eff)).astype(jnp.complex64))
    A = hpad.reshape(r1, r2)
    j1 = np.arange(r1)
    j2 = np.arange(r2)
    F1c = jnp.asarray(np.exp(-2j * np.pi * np.outer(j1, j1) / r1)
                      .astype(np.complex64))
    Tc = jnp.asarray(np.exp(-2j * np.pi * np.outer(j1, j2) / fft_len)
                     .astype(np.complex64))
    F2c = jnp.asarray(np.exp(-2j * np.pi * np.outer(j2, j2) / r2)
                      .astype(np.complex64))
    H = jnp.matmul(F1c, A, precision="highest") * Tc
    H = jnp.matmul(H, F2c, precision="highest")
    Hr_p = jnp.real(H).astype(jnp.float32)
    Hi_p = jnp.imag(H).astype(jnp.float32)

    grid = (tiles,)

    def tile_spec(shape):
        return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    consts = ([jnp.asarray(p) for p in f1] + [jnp.asarray(p) for p in f2]
              + [jnp.asarray(p) for p in g1] + [jnp.asarray(p) for p in g2]
              + [jnp.asarray(Tr), jnp.asarray(Ti),
                 jnp.asarray(Uir), jnp.asarray(Uii)])
    const_shapes = ([(r1, r1)] * 3 + [(r2, r2)] * 3
                    + [(r1, r1)] * 3 + [(r2, r2)] * 3
                    + [(r1, r2)] * 2 + [(r1, r2)] * 2)
    in_specs = ([tile_spec((B, L)), tile_spec((B, L)),
                 const_spec((r1, r2)), const_spec((r1, r2))]
                + [const_spec(s) for s in const_shapes])
    out_spec = tile_spec((B, fft_len))
    # Block rows are independent -> parallel grid dim (probe_chan_dimsem).
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024,
                                  dimension_semantics=("parallel",))
    yr, yi = pl.pallas_call(
        functools.partial(_os_kernel, r1=r1, B=B, L=L),
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((rows, fft_len), jnp.float32),
                   jax.ShapeDtypeStruct((rows, fft_len), jnp.float32)),
        compiler_params=params,
        interpret=interpret,
    )(xr_b, xi_b, Hr_p, Hi_p, *consts)

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
