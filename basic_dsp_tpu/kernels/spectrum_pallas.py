"""Pallas TPU kernel for the four-step spectrum's inner batched FFT —
the flagship chain's dominant stage (BENCH: the 128x32768 minor-axis FFT
plus |.| costs ~0.5 ms of the 0.87 ms chain on v5e).

The XLA path (ops/fourstep.dif_spectrum_mag) does::

    D = jnp.fft.fft(B * T, axis=-1); return abs(D).T

which pays (a) an interleave into complex storage, (b) XLA's internal FFT
staging, (c) a separate |.| pass.  This kernel computes each row's
32768-point FFT *in VMEM* on planar (re, im) f32 planes:

* view the row as (L2, 128) with j = j1*128 + j2;
* stage 1: radix-2 Stockham autosort FFT of length L2 along the SUBLANE
  axis — whole-sublane slices + elementwise butterflies, no lane
  crossings (lane shuffles are the slow path on TPU);
* in-row twiddle W[k1', j2'] = w_n2^(k1' j2') (precomputed input);
* stage 2: the lane-crossing DFT-128 as an MXU matmul against F128, with
  the *global* fftshift folded in as a column rotation (the spectrum
  chain's shift lands entirely on this axis for n = n1*L2*128*2^k);
* |.| fused before the store — the kernel writes f32 magnitudes.

Reference anchor: realizes time_to_freq.rs:158-165 (fft = plain_fft +
fft_shift) + complex_to_real magnitude for the four-step's inner stage.

Constraints (measured on the axon runtime): kernel dots need
precision=HIGHEST (bf16 rounding otherwise); block dims (8k, 128m); no
complex dtypes in kernels -> planar planes throughout.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS_PER_BLOCK = 8


def _dot_f32(a, b, prec=jax.lax.Precision.HIGHEST):
    """Kernel dot: ``preferred_element_type`` alone still rounds f32
    operands to bf16 on the MXU (2.4e-3 err, CLAUDE.md) — the precision
    must be pinned.  HIGHEST = 6-pass f32-exact (~3e-7); HIGH = 3-pass
    (~1e-5) is the opt-in per-stage budget (pipelines budget arg).

    Mosaic's kernel lowering rejects ``precision=HIGH`` outright, so the
    3-pass form is built MANUALLY: split each f32 operand into a bf16 hi
    part + bf16 residual and take the three significant cross products
    (hi·hi + hi·lo + lo·hi) — the same decomposition XLA's HIGH performs,
    as three 1-pass bf16 MXU dots accumulated in f32."""
    if prec == jax.lax.Precision.HIGH:
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(x, y):
            return jnp.dot(x, y, preferred_element_type=jnp.float32)

        return d(ah, bh) + d(ah, bl) + d(al, bh)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=prec)


def _as_prec(p):
    if p is None:
        return jax.lax.Precision.HIGHEST
    if isinstance(p, str):
        return {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[p]
    return p


def _stage_w(half: int, m: int):
    """Radix-2 stage twiddle w = exp(-2j pi k / m), k in [0, half), as
    (half, 1) f32 planes built IN-KERNEL (Pallas forbids captured
    constants; ~L2 total cos/sin evaluations per block is free on VPU)."""
    # Mosaic only accepts integer iota; cast to f32 after.
    k = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0).astype(jnp.float32)
    ang = (-2.0 * np.pi / m) * k
    return jnp.cos(ang), jnp.sin(ang)


@functools.lru_cache(maxsize=8)
def _dft_planes(m: int):
    """3-mult planes of the plain DFT matrix w_m^(k j) for the LEFT-
    constant Karatsuba complex matmul (C @ d, C = Fr + i Fi constant):
        k1 = Fr @ (dr + di); k2 = (Fi - Fr) @ dr; k3 = (Fi + Fr) @ di
        Re = k1 - k3, Im = k1 + k2
    — 3 MXU dots instead of 4 (the DFT finish is one of the two dominant
    matmul costs in the kernel).  Returns (Fr, Fi+Fr, Fi-Fr)."""
    k = np.arange(m)
    F = np.exp(-2j * np.pi * np.outer(k, k) / m).astype(np.complex64)
    fr = np.ascontiguousarray(F.real)
    fi = np.ascontiguousarray(F.imag)
    return fr, fi + fr, fi - fr


@functools.lru_cache(maxsize=8)
def _inner_consts(L2: int, n2: int, shift_cols: int,
                  permuted: bool = False):
    """(Wr, Wi, Fr, Fi) numpy planes: W[k1', j2'] = w_n2^(k1' j2')
    (L2, 128); F[j2', k2'] = w_128^(j2' k2') with output columns rotated
    by ``shift_cols`` (the global fftshift fold).

    ``permuted``: W rows reordered to the DFT-m0 finish's NATIVE layout
    p = c_idx*m0 + k_hi (the kernel then skips the in-VMEM stack +
    swapaxes un-permute — the single biggest VMEM copy in the kernel;
    the XLA output transpose absorbs the reorder at no extra cost)."""
    k1 = np.arange(L2)[:, None]
    j2 = np.arange(LANES)[None, :]
    W = np.exp(-2j * np.pi * (k1 * j2) / n2).astype(np.complex64)
    m0 = min(L2, 128)
    c = L2 // m0
    if permuted == "wide":
        # W in the finish's WIDE layout (m0, c*128): lanes = (c_idx, j2),
        # sublanes = k_hi; W[k_hi*c + c_idx, j2] -> contiguous reshape.
        W = np.ascontiguousarray(W.reshape(m0, c * LANES))
    elif permuted and c > 1:
        # row k1' = k_hi*c + c_idx lives at p = c_idx*m0 + k_hi.
        W = np.ascontiguousarray(
            W.reshape(m0, c, LANES).transpose(1, 0, 2).reshape(L2, LANES))
    k2 = (np.arange(LANES) + shift_cols) % LANES
    F = np.exp(-2j * np.pi * np.outer(np.arange(LANES), k2) / LANES
               ).astype(np.complex64)
    # RIGHT-constant Karatsuba planes (d @ C):
    #   k1 = (dr + di) @ Fr; k2 = dr @ (Fi - Fr); k3 = di @ (Fr + Fi)
    #   Re = k1 - k3, Im = k1 + k2
    fr = np.ascontiguousarray(F.real)
    fi = np.ascontiguousarray(F.imag)
    return (np.ascontiguousarray(W.real), np.ascontiguousarray(W.imag),
            fr, fi - fr, fr + fi)


def _stockham_axis(ar, ai, L2: int, scratch=None, fm=None,
                   prec=jax.lax.Precision.HIGHEST, permuted=False,
                   wide_out=False):
    """Natural-order FFT of length L2 along axis -2 of (..., L2, 128)
    planar planes: mixed radix-4/2 autosort (Stockham) stages down to
    sub-transform length m0 = min(L2, 128), then ONE MXU DFT-m0 matmul
    over the sublane axis to finish.

    Why the matmul finish: running Stockham all the way to m=1 leaves the
    late stages with tiny sublane extents (m = 4, 2, 1), which Mosaic pads
    to 8-sublane tiles — measured 0.56 ms for the whole kernel at 4M,
    slower than XLA's batched FFT.  Stopping at m0=128 keeps every slice
    tile-shaped and turns the remaining work into full (128, 128) MXU
    tiles.  Layout: after s stages the c axis holds k mod c (natural low
    digits); the DFT-m0 output index k_hi then lands as
    k1' = k_hi * c + c_idx, i.e. einsum('km,bcml->bkcl') + reshape.

    Only whole-sublane slices, elementwise butterflies and axis
    concatenation — no lane shuffles, no gathers.  ``scratch`` =
    ((ra, ia), (rb, ib)) flat VMEM refs to ping-pong stage results
    through, breaking the SSA liveness chain (Mosaic does not reuse stack
    slots across the stage chain).  ``fm`` = (Fm_re, Fm_im) planes of the
    (m0, m0) DFT matrix; None falls back to full Stockham (m0 = 1)."""
    B = ar.shape[0]
    c, m = 1, L2
    m0 = min(L2, 128) if fm is not None else 1
    stage = 0
    pieces = None  # ((pieces_r, pieces_i), c_old): last-stage outputs
    while m > m0:
        arv = ar.reshape(B, c, m, LANES)
        aiv = ai.reshape(B, c, m, LANES)
        if m % 4 == 0 and (m0 == 1 or m // 4 >= m0):
            q = m // 4
            a0r, a1r = arv[:, :, :q, :], arv[:, :, q:2 * q, :]
            a2r, a3r = arv[:, :, 2 * q:3 * q, :], arv[:, :, 3 * q:, :]
            a0i, a1i = aiv[:, :, :q, :], aiv[:, :, q:2 * q, :]
            a2i, a3i = aiv[:, :, 2 * q:3 * q, :], aiv[:, :, 3 * q:, :]
            t0r, t0i = a0r + a2r, a0i + a2i
            t1r, t1i = a1r + a3r, a1i + a3i
            t2r, t2i = a0r - a2r, a0i - a2i
            # t3 = -1j * (a1 - a3)
            t3r, t3i = a1i - a3i, a3r - a1r
            w1r, w1i = _stage_w(q, m)
            w1r, w1i = w1r[None, None, :, :], w1i[None, None, :, :]
            # w^2, w^3 from w by complex squaring/mul (VPU, tiny).
            w2r, w2i = w1r * w1r - w1i * w1i, 2.0 * w1r * w1i
            w3r, w3i = w2r * w1r - w2i * w1i, w2r * w1i + w2i * w1r
            y0r, y0i = t0r + t1r, t0i + t1i
            u1r, u1i = t2r + t3r, t2i + t3i
            u2r, u2i = t0r - t1r, t0i - t1i
            u3r, u3i = t2r - t3r, t2i - t3i
            pcs_r = [y0r, u1r * w1r - u1i * w1i, u2r * w2r - u2i * w2i,
                     u3r * w3r - u3i * w3i]
            pcs_i = [y0i, u1r * w1i + u1i * w1r, u2r * w2i + u2i * w2r,
                     u3r * w3i + u3i * w3r]
            if q == m0:
                # Last stage before the MXU finish: skip this stage's
                # concat AND the finish's re-slice — the finish operand
                # is assembled directly from the butterfly outputs
                # (one concat instead of two full-block copies).
                pieces = ((pcs_r, pcs_i), c)
                c, m = 4 * c, q
                break
            nr = jnp.concatenate(pcs_r, axis=1)
            ni = jnp.concatenate(pcs_i, axis=1)
            c, m = 4 * c, q
        else:
            half = m // 2
            wr, wi = _stage_w(half, m)
            wr, wi = wr[None, None, :, :], wi[None, None, :, :]
            er, ei = arv[:, :, :half, :], aiv[:, :, :half, :]
            orr, oi = arv[:, :, half:, :], aiv[:, :, half:, :]
            dr, di = er - orr, ei - oi
            pcs_r = [er + orr, dr * wr - di * wi]
            pcs_i = [ei + oi, dr * wi + di * wr]
            if half == m0:
                pieces = ((pcs_r, pcs_i), c)
                c, m = 2 * c, half
                break
            nr = jnp.concatenate(pcs_r, axis=1)
            ni = jnp.concatenate(pcs_i, axis=1)
            c, m = 2 * c, half
        if scratch is not None and m > m0:
            rref, iref = scratch[stage % 2]
            rref[...] = nr.reshape(B, L2 * LANES)
            iref[...] = ni.reshape(B, L2 * LANES)
            ar, ai = rref[...], iref[...]
        else:
            ar, ai = nr, ni
        stage += 1
    if m0 == 1:
        # (B, L2, 1, 128) -> (B, L2, 128); c axis = natural-order k1'.
        return ar.reshape(B, L2, LANES), ai.reshape(B, L2, LANES)
    # MXU finish: plain DFT-m0 over the sublane axis of each (m0, 128)
    # slice; k1' = k_hi * c + c_idx.  All G = B*c slices are concatenated
    # along LANES into one (m0, G*128) operand so each DFT plane is a
    # single wide dot — per-slice (128,128)@(128,128) dots pay the MXU
    # weight-load latency G times over.
    # 3-mult complex matmul (see _dft_planes): 3 dots total, not 4*G.
    fmr, fmp, fmm = fm
    G = B * c
    if pieces is not None:
        # Assemble directly from the last stage's butterfly outputs:
        # g = b*c + c_idx with c_idx = j*c_old + oi (Stockham concat
        # order), each piece (B, c_old, m0, LANES).
        (pcs_r, pcs_i), c_old = pieces
        cat_r = jnp.concatenate(
            [pcs_r[j][b, oi] for b in range(B)
             for j in range(len(pcs_r)) for oi in range(c_old)], axis=-1)
        cat_i = jnp.concatenate(
            [pcs_i[j][b, oi] for b in range(B)
             for j in range(len(pcs_i)) for oi in range(c_old)], axis=-1)
    else:
        arv = ar.reshape(G, m0, LANES)
        aiv = ai.reshape(G, m0, LANES)
        cat_r = jnp.concatenate([arv[g] for g in range(G)], axis=-1)
        cat_i = jnp.concatenate([aiv[g] for g in range(G)], axis=-1)
    k1 = _dot_f32(fmr, cat_r + cat_i, prec)
    k2 = _dot_f32(fmm, cat_r, prec)
    k3 = _dot_f32(fmp, cat_i, prec)
    ec_r = k1 - k3
    ec_i = k1 + k2
    if wide_out:
        # Hand the finish's (m0, G*128) layout straight to the caller —
        # no re-slice, no stack (the wide lane-dot path consumes it).
        return ec_r, ec_i, c
    outs_r = [ec_r[:, g * LANES:(g + 1) * LANES] for g in range(G)]
    outs_i = [ec_i[:, g * LANES:(g + 1) * LANES] for g in range(G)]
    er = jnp.stack(outs_r).reshape(B, c, m0, LANES)
    ei = jnp.stack(outs_i).reshape(B, c, m0, LANES)
    if permuted:
        # Leave rows in the finish's native p = c_idx*m0 + k_hi order:
        # the lane DFT is row-independent, the twiddle W comes
        # pre-permuted (_inner_consts), and the caller's XLA output
        # transpose absorbs the reorder — this skips a full stack +
        # swapaxes relayout of both complex planes per block (the
        # dominant non-dot VMEM copy in the kernel, probe_breakdown3).
        return er.reshape(B, L2, LANES), ei.reshape(B, L2, LANES)
    # (B, c, k_hi, L) -> (B, k_hi, c, L): major-dim permute only.
    er = jnp.swapaxes(er, 1, 2).reshape(B, L2, LANES)
    ei = jnp.swapaxes(ei, 1, 2).reshape(B, L2, LANES)
    return er, ei


def _rowfft_tail(gr, gi, wr_ref, wi_ref, fr_ref, fm_ref, fp_ref,
                 fmr_ref, fmp_ref, fmm_ref, mag_ref, scratch, *, L2, rows,
                 transposed=False, acc_ref=None, nblocks=1,
                 prec=jax.lax.Precision.HIGHEST, permuted=False,
                 wide=False):
    """Shared kernel tail: Stockham+MXU row FFT, inner twiddle W, lane
    DFT-128 (with the fftshift column rotation folded), magnitude.

    ``transposed``: accumulate each (rows, L2, LANES) block into the
    persistent VMEM scratch ``acc_ref`` (major-dim offsets — aligned;
    a per-block lane-dim store at offset i*rows is rejected by Mosaic:
    lane offsets must be multiples of 128), then at the LAST grid step
    transpose the whole accumulator in VMEM and store it once — the
    natural-spectrum-order layout, eliminating the separate XLA
    magnitude transpose (16 MB read + 16 MB write at 4M)."""
    if wide:
        # Wide lane-dot path: keep the DFT-m0 finish's (m0, G*128)
        # layout, apply W there (ww ref ships in that layout), and run
        # the lane DFT as per-slice dots with direct (m0, 128) magnitude
        # stores — the post-finish slice+stack relayout of both complex
        # planes never happens.  Valid only with permuted row order.
        m0 = min(L2, 128)
        ec_r, ec_i, c = _stockham_axis(
            gr, gi, L2, scratch,
            fm=(fmr_ref[...], fmp_ref[...], fmm_ref[...]),
            prec=prec, permuted=True, wide_out=True)
        ww_r = jnp.concatenate([wr_ref[...]] * rows, axis=-1)
        ww_i = jnp.concatenate([wi_ref[...]] * rows, axis=-1)
        hr = ec_r * ww_r - ec_i * ww_i
        hi = ec_r * ww_i + ec_i * ww_r
        fr, fm_, fp = fr_ref[...], fm_ref[...], fp_ref[...]
        for g in range(rows * c):
            sl = slice(g * LANES, (g + 1) * LANES)
            hgr, hgi = hr[:, sl], hi[:, sl]
            k1 = _dot_f32(hgr + hgi, fr, prec)
            k2 = _dot_f32(hgr, fm_, prec)
            k3 = _dot_f32(hgi, fp, prec)
            dgr = k1 - k3
            dgi = k1 + k2
            b, ci = g // c, g % c
            mag_ref[b, ci * m0:(ci + 1) * m0, :] = jnp.sqrt(
                dgr * dgr + dgi * dgi)
        return
    gr, gi = _stockham_axis(gr, gi, L2, scratch,
                            fm=(fmr_ref[...], fmp_ref[...], fmm_ref[...]),
                            prec=prec, permuted=permuted)
    wr = wr_ref[...][None, :, :]
    wi = wi_ref[...][None, :, :]
    hr = gr * wr - gi * wi
    hi = gr * wi + gi * wr
    # Lane-crossing DFT-128 on the MXU: flatten rows*L2 into the matmul's
    # contraction-free dimension.  3-mult complex matmul (right-constant
    # Karatsuba planes from _inner_consts): 3 dots instead of 4.
    hr2 = hr.reshape(rows * L2, LANES)
    hi2 = hi.reshape(rows * L2, LANES)
    k1 = _dot_f32(hr2 + hi2, fr_ref[...], prec)
    k2 = _dot_f32(hr2, fm_ref[...], prec)
    k3 = _dot_f32(hi2, fp_ref[...], prec)
    dr = k1 - k3
    di = k1 + k2
    mag = jnp.sqrt(dr * dr + di * di).reshape(rows, L2, LANES)
    if transposed:
        i = pl.program_id(0)
        acc_ref[pl.ds(i * rows, rows)] = mag

        @pl.when(i == nblocks - 1)
        def _finish():
            mag_ref[...] = acc_ref[...].transpose(2, 1, 0)
    else:
        mag_ref[...] = mag


def _rowfft_kernel(br_ref, bi_ref, wr_ref, wi_ref, fr_ref, fm_ref, fp_ref,
                   fmr_ref, fmp_ref, fmm_ref, mag_ref, sra, sia, srb, sib,
                   *acc, L2, rows, nblocks=1, tw_refs=(), transposed=False,
                   prec=jax.lax.Precision.HIGHEST, permuted=False,
                   wide=False):
    gr = br_ref[...].reshape(rows, L2, LANES)
    gi = bi_ref[...].reshape(rows, L2, LANES)
    if len(tw_refs) == 4:
        # FACTORED big twiddle (round 5): T[k1, j1*128+j2] = A[k1, j1] *
        # B[k1, j2] exactly (fourstep._dif_twiddle_factored) — the
        # streamed planes shrink from (rows, n2) to (rows, L2) +
        # (rows, 128), i.e. 32 MB -> 0.4 MB of HBM per 4M call; T is
        # rebuilt here with two broadcast VPU multiplies.  (Full
        # in-kernel cos/sin was measured SLOWER in r3: 8M VPU
        # transcendentals; this form needs none.)
        ar_ref, ai_ref, btr_ref, bti_ref = tw_refs
        a_r = ar_ref[...][:, :, None]
        a_i = ai_ref[...][:, :, None]
        b_r = btr_ref[...][:, None, :]
        b_i = bti_ref[...][:, None, :]
        tr = a_r * b_r - a_i * b_i
        ti = a_r * b_i + a_i * b_r
        gr, gi = gr * tr - gi * ti, gr * ti + gi * tr
    elif tw_refs:
        # Big DIF twiddle T[k1, j] = w_N^(k1 j), streamed in as planar
        # block inputs and applied here — eliminates the separate XLA
        # C = B*T pass (read B + write C, 64 MB at 4M).  Computing T from
        # iota cos/sin in-kernel was measured SLOWER (+0.19 ms at 4M: 8M
        # VPU transcendentals); the HBM read of the precomputed planes
        # overlaps with the MXU/VPU work instead.
        tr_ref, ti_ref = tw_refs
        tr = tr_ref[...].reshape(rows, L2, LANES)
        ti = ti_ref[...].reshape(rows, L2, LANES)
        gr, gi = gr * tr - gi * ti, gr * ti + gi * tr
    _rowfft_tail(gr, gi, wr_ref, wi_ref, fr_ref, fm_ref, fp_ref,
                 fmr_ref, fmp_ref, fmm_ref, mag_ref,
                 ((sra, sia), (srb, sib)), L2=L2, rows=rows,
                 transposed=transposed,
                 acc_ref=acc[0] if acc else None, nblocks=nblocks,
                 prec=prec, permuted=permuted, wide=wide)


def _fused_kernel(ar_hbm, ai_hbm, tr_ref, ti_ref,
                  f1r_ref, f1m_ref, f1p_ref,
                  wr_ref, wi_ref, fr_ref, fm_ref, fp_ref,
                  fmr_ref, fmp_ref, fmm_ref, mag_ref,
                  bre, bim, pr0, pi0, pr1, pi1,
                  sra, sia, srb, sib, *rest,
                  L2, rows, n1, n2, panel, transposed=False,
                  prec=jax.lax.Precision.HIGHEST, permuted=False):
    """Four-step spectrum with stage 1 *inside* the kernel: B = F1 @ A
    never round-trips HBM.  A stays in HBM (memory_space=ANY) and is
    DMA'd in (n1, panel) column panels during grid step 0; the stage-1
    3-mult dots write the result into a persistent (n1, n2) VMEM scratch
    that later grid steps slice rows from (TPU grid steps run
    sequentially on the core, so step-0 writes are visible).  Saves the
    64 MB B write+read of the XLA-stage-1 layout at 4M.

    The panel DMA is DOUBLE-BUFFERED (revolving (pr0,pi0)/(pr1,pi1)
    slots, panel p+1's copy in flight while panel p's dots run): the
    round-1 serial start->wait version measured SLOWER than the XLA
    stage-1 (0.778 vs 0.559 ms chain at 4M) precisely because nothing
    overlapped the DMA chain.  Program order on the core makes the slot
    reuse safe: panel p's dots are issued before start(p+2) touches the
    same slot.  Still gated off by default pending an on-chip A/B."""
    acc_ref, dsem = (rest if transposed else (None, rest[0]))
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _stage1():
        f1r, f1m, f1p = f1r_ref[...], f1m_ref[...], f1p_ref[...]
        prs, pis = (pr0, pr1), (pi0, pi1)
        nP = n2 // panel

        def copies(p):
            slot = p % 2
            sl = pl.ds(p * panel, panel)
            return (pltpu.make_async_copy(ar_hbm.at[:, sl], prs[slot],
                                          dsem.at[slot, 0]),
                    pltpu.make_async_copy(ai_hbm.at[:, sl], pis[slot],
                                          dsem.at[slot, 1]))

        for c in copies(0):
            c.start()
        for p in range(nP):
            if p + 1 < nP:
                for c in copies(p + 1):
                    c.start()
            for c in copies(p):
                c.wait()
            slot = p % 2
            a_r, a_i = prs[slot][...], pis[slot][...]
            sl = pl.ds(p * panel, panel)
            k1 = _dot_f32(f1r, a_r + a_i, prec)
            k2 = _dot_f32(f1m, a_r, prec)
            k3 = _dot_f32(f1p, a_i, prec)
            bre[:, sl] = k1 - k3
            bim[:, sl] = k1 + k2

    rsl = pl.ds(i * rows, rows)
    gr = bre[rsl, :].reshape(rows, L2, LANES)
    gi = bim[rsl, :].reshape(rows, L2, LANES)
    tr = tr_ref[...].reshape(rows, L2, LANES)
    ti = ti_ref[...].reshape(rows, L2, LANES)
    gr, gi = gr * tr - gi * ti, gr * ti + gi * tr
    _rowfft_tail(gr, gi, wr_ref, wi_ref, fr_ref, fm_ref, fp_ref,
                 fmr_ref, fmp_ref, fmm_ref, mag_ref,
                 ((sra, sia), (srb, sib)), L2=L2, rows=rows,
                 transposed=transposed, acc_ref=acc_ref,
                 nblocks=n1 // rows, prec=prec, permuted=permuted)


@functools.partial(jax.jit,
                   static_argnames=("shift", "interpret", "transposed",
                                    "budget", "permuted", "wide"))
def rowfft_mag(Br: jnp.ndarray, Bi: jnp.ndarray, shift: bool = True,
               interpret: bool = False, Tr: jnp.ndarray = None,
               Ti: jnp.ndarray = None,
               transposed: bool = False,
               budget: str = None,
               permuted: bool = False,
               wide: bool = False,
               Tfac: tuple = None) -> jnp.ndarray:
    """|FFT(rows)| (optionally global-fftshift-folded) of planar rows.

    Br, Bi: (n1, n2) f32 planes of the post-stage-1 four-step data —
    post-big-twiddle when ``Tr/Ti`` are None, PRE-twiddle otherwise (the
    kernel then streams the (n1, n2) twiddle planes in as block inputs
    and applies T itself, saving the separate XLA C = B*T pass).  n2 must
    be L2*128 with L2 a power of two.  Returns (n1, L2, 128) f32 with
    M[k1, k1', k2s] = |X_row[k1' + L2*((k2s + L2s) % 128)]| — flatten via
    :func:`natural_flatten` for the natural shifted-spectrum order.

    ``permuted=True`` keeps the middle axis in the DFT-m0 finish's
    NATIVE order p = c_idx*m0 + k_hi, skipping the in-VMEM stack +
    swapaxes relayout (the kernel's dominant non-dot cost at 4M —
    probe_breakdown3); ``natural_flatten(M, permuted=True)`` absorbs the
    reorder into the same single XLA transpose.  ``wide=True``
    additionally runs the lane DFT per-slice in the wide layout (A/B'd
    neutral on-chip; gated experiment).

    ``transposed=True`` makes the KERNEL produce that layout directly:
    returns (128, L2, n1) so the natural order is one ``reshape(-1)`` —
    blocks accumulate untransposed in a persistent VMEM scratch
    (major-dim stores; a per-block lane-offset store is Mosaic-illegal:
    lane offsets must be multiples of 128) and the LAST grid step does
    one in-VMEM lane<->major transpose + aligned full store, trading the
    32 MB HBM transpose pass for Mosaic relayouts.  Measured on v5e at
    4M (probe_transposed2.log, 2026-08-19): parity exact but 0.727 vs
    0.523 ms/iter chain — Mosaic's relayout costs ~5x the HBM transpose
    it removes.  Kept gated OFF; useful only if Mosaic's transpose
    lowering improves.
    """
    n1, n2 = Br.shape
    L2 = n2 // LANES
    assert L2 * LANES == n2 and (L2 & (L2 - 1)) == 0, n2
    fold_tw = Tr is not None
    # Global fftshift: N/2 = n1*n2/2 => k2' roll by 64 when n2/2 is a
    # multiple of ... it lands on the k2' axis iff N/2 = n1*L2*64, i.e.
    # always (N/2 / (n1*L2) = 64).
    shift_cols = 64 if shift else 0
    assert not (permuted and transposed), \
        "permuted layout requires the XLA-side output transpose"
    if wide:
        assert permuted and not transposed, \
            "wide lane dots imply the permuted output layout"
    Wr, Wi, Fr, Fm, Fp = (jnp.asarray(p)
                          for p in _inner_consts(
                              L2, n2, shift_cols,
                              "wide" if wide else permuted))
    m0 = min(L2, 128)
    Fmr, Fmp, Fmm = (jnp.asarray(p) for p in _dft_planes(m0))
    rows = min(ROWS_PER_BLOCK, n1)
    assert n1 % rows == 0
    grid = (n1 // rows,)
    row_spec = pl.BlockSpec((rows, n2), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    w_shape = (m0, (L2 // m0) * LANES) if wide else (L2, LANES)
    w_spec = pl.BlockSpec(w_shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    if transposed:
        # Grid-resident accumulator: the index map is constant, so Mosaic
        # keeps the whole (128, L2, n1) block in VMEM across steps and
        # writes it back once after the last step.
        out_spec = pl.BlockSpec((LANES, L2, n1), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((LANES, L2, n1), jnp.float32)
    else:
        out_spec = pl.BlockSpec((rows, L2, LANES), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n1, L2, LANES), jnp.float32)
    scratch = [pltpu.VMEM((rows, n2), jnp.float32)] * 4
    if transposed:
        # Persistent block accumulator: per-step stores land at major-dim
        # offsets (aligned); ONE lane<->major transpose + full store at
        # the last step (a per-step lane-offset store is Mosaic-illegal).
        scratch = scratch + [pltpu.VMEM((n1, L2, LANES), jnp.float32)]
    # Mosaic's default scoped-VMEM stack limit is 16 MB; the stage chain's
    # live temporaries exceed it at L2 >= 256 (measured 30.4 MB).  v5e has
    # 128 MB physical VMEM — raise the per-kernel limit instead of
    # shrinking blocks below MXU-efficient sizes.  Row blocks are
    # independent -> parallel grid dim (more aggressive DMA pipelining,
    # probe_chan_dimsem) — EXCEPT the transposed path, whose grid-
    # resident accumulator makes steps order-dependent.
    params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024,
        dimension_semantics=None if transposed else ("parallel",))
    fm_spec = pl.BlockSpec((m0, m0), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    base = functools.partial(_rowfft_kernel, L2=L2, rows=rows,
                             nblocks=n1 // rows, transposed=transposed,
                             prec=_as_prec(budget), permuted=permuted,
                             wide=wide)
    if Tfac is not None:
        # factored twiddle: A (n1, L2) + B (n1, 128) row blocks.
        a_spec = pl.BlockSpec((rows, L2), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)

        def kernel(br, bi, ar, ai, btr, bti, wr, wi, fr, fm, fp,
                   fmr, fmp, fmm, mag, *scr):
            base(br, bi, wr, wi, fr, fm, fp, fmr, fmp, fmm, mag, *scr,
                 tw_refs=(ar, ai, btr, bti))
        in_specs = ([row_spec] * 2 + [a_spec, a_spec, b_spec, b_spec]
                    + [w_spec, w_spec, f_spec, f_spec, f_spec,
                       fm_spec, fm_spec, fm_spec])
        Afr, Afi, Bfr, Bfi = (jnp.asarray(p_) for p_ in Tfac)
        args = (Br, Bi, Afr, Afi, Bfr, Bfi, Wr, Wi, Fr, Fm, Fp,
                Fmr, Fmp, Fmm)
    elif fold_tw:
        def kernel(br, bi, tr, ti, wr, wi, fr, fm, fp, fmr, fmp, fmm,
                   mag, *scr):
            base(br, bi, wr, wi, fr, fm, fp, fmr, fmp, fmm, mag, *scr,
                 tw_refs=(tr, ti))
        in_specs = [row_spec] * 4 + [w_spec, w_spec, f_spec, f_spec,
                                     f_spec, fm_spec, fm_spec, fm_spec]
        args = (Br, Bi, Tr, Ti, Wr, Wi, Fr, Fm, Fp, Fmr, Fmp, Fmm)
    else:
        kernel = base
        in_specs = [row_spec, row_spec, w_spec, w_spec, f_spec, f_spec,
                    f_spec, fm_spec, fm_spec, fm_spec]
        args = (Br, Bi, Wr, Wi, Fr, Fm, Fp, Fmr, Fmp, Fmm)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit,
                   static_argnames=("shift", "interpret", "transposed",
                                    "budget", "permuted"))
def fourstep_mag_fused(Ar: jnp.ndarray, Ai: jnp.ndarray,
                       shift: bool = True,
                       interpret: bool = False,
                       transposed: bool = False,
                       budget: str = None,
                       permuted: bool = False) -> jnp.ndarray:
    """|fftshift(FFT)| of the (n1, n2)-reshaped planar signal with BOTH
    four-step stages inside one Pallas kernel: stage-1 DFT (3-mult MXU
    dots over HBM-DMA'd column panels into a persistent VMEM scratch),
    big twiddle (streamed row blocks), row FFT, shift, magnitude.  Takes
    the post-FIR windowed planes ALREADY reshaped to (n1, n2); returns
    (n1, L2, 128) magnitudes (same layout contract as rowfft_mag)."""
    n1, n2 = Ar.shape
    L2 = n2 // LANES
    assert L2 * LANES == n2 and (L2 & (L2 - 1)) == 0, n2
    assert n1 % 8 == 0, n1
    from ..ops import fourstep
    F1r, F1i, Tr, Ti = fourstep._dif_planes(n1, n2)
    f1r = jnp.asarray(F1r)
    f1m = jnp.asarray(F1i - F1r)
    f1p = jnp.asarray(F1i + F1r)
    shift_cols = 64 if shift else 0
    assert not (permuted and transposed), \
        "permuted layout requires the XLA-side output transpose"
    Wr, Wi, Fr, Fm, Fp = (jnp.asarray(p)
                          for p in _inner_consts(L2, n2, shift_cols,
                                                 permuted))
    m0 = min(L2, 128)
    Fmr, Fmp, Fmm = (jnp.asarray(p) for p in _dft_planes(m0))
    rows = min(ROWS_PER_BLOCK, n1)
    assert n1 % rows == 0
    grid = (n1 // rows,)
    panel = min(n2, 8192)
    assert n2 % panel == 0
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    row_spec = pl.BlockSpec((rows, n2), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((L2, LANES), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    f1_spec = pl.BlockSpec((n1, n1), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    fm_spec = pl.BlockSpec((m0, m0), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    if transposed:
        out_spec = pl.BlockSpec((LANES, L2, n1), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((LANES, L2, n1), jnp.float32)
    else:
        out_spec = pl.BlockSpec((rows, L2, LANES), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n1, L2, LANES), jnp.float32)
    scratch = ([pltpu.VMEM((n1, n2), jnp.float32)] * 2      # B planes
               + [pltpu.VMEM((n1, panel), jnp.float32)] * 4  # 2x2 DMA slots
               + [pltpu.VMEM((rows, n2), jnp.float32)] * 4   # ping-pong
               + ([pltpu.VMEM((n1, L2, LANES), jnp.float32)]
                  if transposed else [])                     # acc (see tail)
               + [pltpu.SemaphoreType.DMA((2, 2))])
    params = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)
    kernel = functools.partial(_fused_kernel, L2=L2, rows=rows,
                               n1=n1, n2=n2, panel=panel,
                               transposed=transposed,
                               prec=_as_prec(budget), permuted=permuted)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[any_spec, any_spec, row_spec, row_spec,
                  f1_spec, f1_spec, f1_spec,
                  w_spec, w_spec, f_spec, f_spec, f_spec,
                  fm_spec, fm_spec, fm_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(Ar, Ai, jnp.asarray(Tr), jnp.asarray(Ti),
      f1r, f1m, f1p, Wr, Wi, Fr, Fm, Fp, Fmr, Fmp, Fmm)


def natural_flatten(M: jnp.ndarray, permuted: bool = False) -> jnp.ndarray:
    """Flatten a rowfft_mag (n1, L2, 128) magnitude block to the natural
    shifted-spectrum order.  With ``permuted=True`` the middle axis is in
    the DFT-m0 finish's native order p = c_idx*m0 + k_hi and the reorder
    folds into this single XLA transpose: flat index
    ((k2s*m0 + k_hi)*c + c_idx)*n1 + k1 == (k2s*L2 + k1')*n1 + k1."""
    n1, L2, _ = M.shape
    m0 = min(L2, 128)
    c = L2 // m0
    if not permuted or c == 1:
        return M.transpose(2, 1, 0).reshape(-1)
    return (M.reshape(n1, c, m0, LANES).transpose(3, 2, 1, 0)
            .reshape(-1))


def supported(n1: int, n2: int) -> bool:
    L2 = n2 // LANES
    # L2 cap: the per-block VMEM working set grows with n2; L2 = 2048
    # exceeds Mosaic's scoped-vmem stack even at the 100 MB limit
    # (measured: "Scoped allocation with size 112.07M ... exceeded" at
    # 16M samples with n1=64).  fourstep.factor keeps n2 in range by
    # growing n1 for long signals.
    return (L2 * LANES == n2 and 2 <= L2 <= 1024 and (L2 & (L2 - 1)) == 0
            and n1 % min(ROWS_PER_BLOCK, n1) == 0)


def dif_spectrum_mag_pallas(xw: jnp.ndarray, n1: int = 0,
                            interpret: bool = False,
                            fold_twiddle: bool = True,
                            transposed: bool = False) -> jnp.ndarray:
    """|fftshift(FFT(xw))| — the four-step DIF spectrum with the inner
    batched FFT + twiddle + |.| as the Pallas row-FFT kernel.

    Drop-in replacement for ``ops.fourstep.dif_spectrum_mag`` on lengths
    where ``supported(n1, n2)``; stage 1 (the n1-point MXU DFT over
    columns) and the big twiddle stay XLA so they fuse with the upstream
    convolution; the kernel owns the per-row 32k FFT, the global-fftshift
    column rotation and the magnitude."""
    from ..ops import fourstep
    from .. import config

    n = xw.shape[-1]
    n1, n2 = fourstep.factor(n, n1)
    Frn, Fin, Trn, Tin = fourstep._dif_planes(n1, n2)
    prec = config.matmul_precision()
    # PLANAR Karatsuba stage-1 (3 real dots, not XLA's complex-dot
    # lowering); jnp.real/imag are traced (no eager complex on axon),
    # and a REAL input's zero imag plane lowers to broadcast(0) whose
    # dots XLA's algebraic simplifier removes — the real-signal spectrum
    # (config #1) pays 1 stage-1 matmul instead of 4.
    xc = xw.astype(jnp.complex64) if not jnp.iscomplexobj(xw) else xw
    Ar = jnp.real(xc).reshape(n1, n2)
    Ai = jnp.imag(xc).reshape(n1, n2)
    Fr = jnp.asarray(Frn)
    Fm = jnp.asarray(Fin - Frn)
    Fp = jnp.asarray(Fin + Frn)
    k1 = jnp.matmul(Fr, Ar + Ai, precision=prec)
    k2 = jnp.matmul(Fm, Ar, precision=prec)
    k3 = jnp.matmul(Fp, Ai, precision=prec)
    Br, Bi = k1 - k3, k1 + k2
    if fold_twiddle:
        # Kernel applies T in-kernel — the DEFAULT since round 3 (0.575
        # -> 0.441 ms/iter at 4M vs the XLA-side C = B*T pass).  Round 5:
        # T streams FACTORED (A + B outer-product planes, 32 MB -> 0.4
        # MB of HBM; fourstep._dif_twiddle_factored) — same-session A/B
        # 0.469 vs 0.493 ms/iter on the flagship chain (probe_tfac).
        if not transposed:
            M = rowfft_mag(Br, Bi, shift=True, interpret=interpret,
                           Tfac=fourstep._dif_twiddle_factored(n1, n2),
                           permuted=True)
        else:
            M = rowfft_mag(Br, Bi, shift=True,
                           interpret=interpret,
                           Tr=jnp.asarray(Trn), Ti=jnp.asarray(Tin),
                           transposed=transposed, permuted=False)
    else:
        Tr, Ti = jnp.asarray(Trn), jnp.asarray(Tin)
        Cr = Br * Tr - Bi * Ti
        Ci = Br * Ti + Bi * Tr
        M = rowfft_mag(Cr, Ci, shift=True,
                       interpret=interpret, transposed=transposed,
                       permuted=not transposed)
    if transposed:
        # Kernel already produced (k2s, k1', k1): natural order is flat.
        return M.reshape(-1)
    # M[k1, p, k2s] (permuted rows) -> natural order in ONE transpose.
    return natural_flatten(M, permuted=True)
