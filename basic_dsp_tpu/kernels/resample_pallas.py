"""Pallas TPU kernel for the direct banded-matmul polyphase resampler —
the hot loop of ``interpolatef`` (reference interpolation.rs:92-131 /
387-482: the per-output-sample tap loop, collapsed into banded matmuls).

Why a kernel: the XLA realization (ops/interp_ops._interpolatef_direct)
pays ~2.4x its compute floor in pure data movement (probe_interp4.py,
round 4, 1M x1.5 per plane):

  * the circular extension ``ext[i] = x[(i - L) mod n]`` is a copy of the
    whole signal at lane offset ``-L`` — a cross-lane RELAYOUT on TPU
    (~0.066 ms for 4 MB, ~60 GB/s effective);
  * the (nb, W) windows materialization from strided slices runs at a
    similar relayout-grade bandwidth (0.099 ms standalone);
  * the band matmul itself costs only 0.037 ms.

This kernel removes both copies:

  * the extension is built at lane-ALIGNED offset ``off = 128*ceil(L/128)``
    (concat pieces are all 128-multiples -> a plain aligned copy), and the
    band matrix rows are shifted by ``o0 = off - L`` to compensate;
  * ``E2 = ext.reshape(rows, span)`` is a FREE reshape (span is a lane
    multiple); window row ``b`` is the concatenation of E2 rows
    ``b..b+K-1``, so the kernel takes K row-shifted VIEWS of E2 (XLA
    contiguous slices) and accumulates ``sum_k X_k @ M2_k`` per tile with
    everything VMEM-resident — no windows array ever exists in HBM.

Matmul precision: the band matrix is constant and the dots run as a
MANUAL 3-pass bf16 hi/lo split (hi*hi + hi*lo + lo*hi — Mosaic rejects
``precision=HIGH`` inside kernels, spectrum_pallas._dot_f32).  Error is
~1e-6 relative — the same grade as the reference's own f32 FMA tap loop
(a 512-term f32 dot rounds at ~sqrt(512)*2^-24), NOT the silent 5e-3
bf16 grade CLAUDE.md warns about; parity is pinned in
tests/test_pallas_resample.py (interpret) and probe_resample.py
(on-chip).

Contract: identical output to ``interp_ops._interpolatef_direct(x, taps,
P, Q, offs, L, out_len, c)`` for 1-D real f32 ``x``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS_PER_TILE = 256      # output rows per grid step (multiple of 8)
MIN_N = 1 << 16          # below this the XLA path's copies don't matter
MAX_M2_BYTES = 8 << 20   # VMEM budget for the band-matrix constant


def _geometry(P: int, Q: int, L: int, c: int):
    """Derived kernel geometry.  Returns (B, span, off, o0, K)."""
    B = c * P
    span = c * Q
    off = LANES * (-(-L // LANES))
    o0 = off - L
    # Highest occupied band row (output-block-local): j = B-1, t = 2L.
    top = o0 + (c - 1) * Q + max(int((p * Q) // P) for p in range(P)) \
        + 2 * L
    K = -(-(top + 1) // span)
    return B, span, off, o0, K


def supported(P: int, Q: int, L: int, c: int, n: int) -> bool:
    """Geometry gate: lane-aligned span and extension, VMEM-sized band
    matrix, signal long enough for the kernel to matter."""
    B, span, off, o0, K = _geometry(P, Q, L, c)
    return (span % LANES == 0
            and n % LANES == 0
            and n >= MIN_N
            and off <= n
            and K * span * B * 4 <= MAX_M2_BYTES)


def _band_matrix_shifted(taps_np, P, Q, offs, L, o0, K, span, B):
    """M2[o0 + (j//P)*Q + offs[j%P] + t, j] = taps[j%P, t], rows padded
    to K*span (the aligned-extension shift o0 folded into the rows)."""
    j = np.arange(B)
    t = np.arange(taps_np.shape[-1])
    jj, tt = np.meshgrid(j, t, indexing="ij")
    pp = jj % P
    ww = o0 + (jj // P) * Q + np.asarray(offs)[pp] + tt
    M2 = np.zeros((K * span, B), dtype=np.float32)
    M2[ww.ravel(), jj.ravel()] = np.asarray(taps_np, dtype=np.float32)[
        pp.ravel(), tt.ravel()]
    return M2


def _dot3(x, mh_ref, ml_ref):
    """3-pass bf16 hi/lo f32 dot against a pre-split constant (see module
    docstring; spectrum_pallas._dot_f32 is the 2-operand-split analog)."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    return d(xh, mh_ref[...]) + d(xh, ml_ref[...]) + d(xl, mh_ref[...])


def _rs_kernel(*refs, K: int):
    """One grid step: K row-shifted (R, span) views -> (R, B) outputs via
    sum_k X_k @ M2_k, fully VMEM-resident."""
    out_ref = refs[-1]
    acc = None
    for k in range(K):
        x_ref = refs[k]
        mh_ref = refs[K + 2 * k]
        ml_ref = refs[K + 2 * k + 1]
        term = _dot3(x_ref[...], mh_ref, ml_ref)
        acc = term if acc is None else acc + term
    out_ref[...] = acc


def resample_direct_pallas(x: jnp.ndarray, taps, P: int, Q: int,
                           offs, L: int, out_len: int, c: int,
                           interpret: bool = False) -> jnp.ndarray:
    """Direct banded polyphase resample of 1-D real f32 ``x`` (see module
    docstring).  ``taps`` must be concrete (host-fetchable) — guaranteed
    by interp_ops._direct_eligible on the dispatch path.  NOT jitted
    itself: the band matrix is built on the host at trace time (like
    interp_ops._direct_band_matrix), the device ops stage into the
    enclosing user jit."""
    n = x.shape[-1]
    B, span, off, o0, K = _geometry(P, Q, L, c)
    taps_np = np.asarray(jax.device_get(taps), dtype=np.float32)
    M2 = _band_matrix_shifted(taps_np, P, Q, offs, L, o0, K, span, B)
    M2h = M2.astype(np.float32).astype(jnp.bfloat16)
    M2l = (M2 - np.asarray(M2h, np.float32)).astype(jnp.bfloat16)

    nb = -(-out_len // B)
    R = ROWS_PER_TILE
    tiles = -(-nb // R)
    rows = tiles * R
    need = (rows + K - 1) * span
    # Aligned circular extension: every concat piece is a 128-multiple.
    pieces = [x[n - off:]] if off else []
    remaining = need - off
    while remaining > 0:
        take = min(remaining, n)
        pieces.append(x[:take])
        remaining -= take
    ext = jnp.concatenate(pieces, axis=-1)
    E2 = ext.reshape(rows + K - 1, span)
    xs = [jax.lax.slice_in_dim(E2, k, k + rows, axis=0) for k in range(K)]

    def tile_spec():
        return pl.BlockSpec((R, span), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec():
        return pl.BlockSpec((span, B), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    consts = []
    for k in range(K):
        consts.append(jnp.asarray(M2h[k * span:(k + 1) * span]))
        consts.append(jnp.asarray(M2l[k * span:(k + 1) * span]))

    # Row tiles are independent -> parallel grid dim (probe_chan_dimsem).
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024,
                                  dimension_semantics=("parallel",))
    out = pl.pallas_call(
        functools.partial(_rs_kernel, K=K),
        grid=(tiles,),
        in_specs=[tile_spec() for _ in range(K)]
                 + [const_spec() for _ in range(2 * K)],
        out_specs=pl.BlockSpec((R, B), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, B), jnp.float32),
        compiler_params=params,
        interpret=interpret,
    )(*xs, *consts)
    return out.reshape(-1)[:out_len]


# None = unprobed; True/False after the once-per-process probe compile
# (same pattern as conv_ops._pallas_os_runtime_ok: Mosaic failures only
# surface at the OUTER jit's compile, so probe eagerly once).
_RUNTIME_OK = [None]


def runtime_ok() -> bool:
    if _RUNTIME_OK[0] is None:
        try:
            with jax.ensure_compile_time_eval():
                xp = jnp.zeros((MIN_N,), jnp.float32)
                taps = np.zeros((3, 21), np.float32)
                taps[:, 10] = 1.0
                out = resample_direct_pallas(
                    xp, taps, 3, 2, (0, 0, 1), 10, MIN_N * 3 // 2, 128)
                float(np.asarray(out)[0])
            _RUNTIME_OK[0] = True
        except Exception as e:
            _RUNTIME_OK[0] = False
            import warnings
            warnings.warn(
                "Pallas resample kernel failed its probe compile on this "
                f"runtime ({type(e).__name__}); using the XLA banded-"
                "matmul path for the rest of the process. "
                "See DspConfig.use_pallas_resample.",
                RuntimeWarning, stacklevel=3)
    return _RUNTIME_OK[0]


# ---------------------------------------------------------------------------
# Row-block kernel for LARGE-Q rational factors (Q = 147: 44.1<->48 kHz).
#
# Q = 147 has no lane-aligned span below c = 128 (gcd(147, 128) = 1), so
# the aligned-span kernel above cannot take it and the generic XLA
# windows path pays ~5x its floor in relayouts.  With c = 1 the
# formulation collapses to a pure row map: V = ext.reshape(rows, Q) is
# free in HBM and the window dot DISTRIBUTES over row-shifted views
# (out = sum_r V[j+r] @ M_r — interp_ops._rowblock_geometry/_matrices),
# so the kernel is just 2 shifted-view 3-pass bf16 dots per tile — no
# in-kernel slicing, no windows array anywhere.
#
# Round-5 on-chip attribution (1M, v5e, same-session A/B in
# probe_audio_ab_r5.py):
#   * raw (R, Q) blocks: 0.130 ms of PURE DMA — 588-byte rows scatter
#     one by one into the lane-padded VMEM layout; dots free.
#   * padded=True (V rows padded to 256 lanes in HBM, dense DMA):
#     0.127 ms vs raw 0.138 vs XLA row-block matmuls 0.156 vs generic
#     banded c=2 0.158 — SHIPPED default.
#   * a dense-DMA variant (stream flat ext, reshape in VMEM) is not
#     expressible: Mosaic dies with an INTERNAL error on the
#     (1176, 128) -> (1024, 147) kernel reshape.
#   * a degraded-tunnel session fabricated 0.0196 ms for the XLA form
#     (spread 7.15, below the bytes wall) — spread-gate captures.
# ---------------------------------------------------------------------------

ROWBLOCK_MIN_Q = 64          # below this the aligned-span kernel applies
ROWBLOCK_ROWS = 512          # output rows per grid step (multiple of 8)


def rowblock_supported(P: int, Q: int, L: int, n: int) -> bool:
    from ..ops import interp_ops
    g = interp_ops._rowblock_geometry(P, Q, L)
    if g is None:
        return False
    W0, off, s0, splits = g
    return (Q >= ROWBLOCK_MIN_Q and P <= 4096 and n >= MIN_N
            and off <= n and W0 * P * 4 <= MAX_M2_BYTES)


def _rowblock_kernel(*refs, nviews):
    out_ref = refs[-1]
    acc = None
    for k in range(nviews):
        term = _dot3(refs[k][...], refs[nviews + 2 * k],
                     refs[nviews + 2 * k + 1])
        acc = term if acc is None else acc + term
    out_ref[...] = acc


def resample_rowblock_pallas(x: jnp.ndarray, taps, P: int, Q: int,
                             offs, L: int, out_len: int,
                             padded: bool = True,
                             interpret: bool = False) -> jnp.ndarray:
    """Large-Q direct polyphase resample (see section comment).  Same
    output contract as the generic banded path; 3-pass bf16 dot grade
    (~1e-6 rel, the module-docstring precision note applies)."""
    from ..ops import interp_ops
    n = x.shape[-1]
    W0, off, s0, splits = interp_ops._rowblock_geometry(P, Q, L)
    mats, _ = interp_ops._rowblock_matrices(taps, P, Q, offs, L,
                                            np.dtype(np.float32))
    R = ROWBLOCK_ROWS
    nrows = -(-out_len // P)
    tiles = -(-nrows // R)
    rows = tiles * R
    max_shift = max(r for (r, _, _) in splits)
    need = (rows + max_shift + 1) * Q
    pieces = [x[n - off:]] if off else []
    remaining = need - off
    while remaining > 0:
        take = min(remaining, n)
        pieces.append(x[:take])
        remaining -= take
    ext = jnp.concatenate(pieces, axis=-1)
    V = ext[: (rows + max_shift + 1) * Q].reshape(rows + max_shift + 1, Q)
    Qk = Q
    if padded:
        Qk = LANES * (-(-Q // LANES))
        V = jnp.pad(V, ((0, 0), (0, Qk - Q)))
        mats = [np.pad(m, ((0, Qk - Q), (0, 0))) for m in mats]
    xs = [jax.lax.slice_in_dim(V, r, r + rows, axis=0)
          for (r, _, _) in splits]
    consts = []
    for m in mats:
        mh = m.astype(jnp.bfloat16)
        ml = (m - np.asarray(mh, np.float32)).astype(jnp.bfloat16)
        consts += [jnp.asarray(mh), jnp.asarray(ml)]
    in_specs = ([pl.BlockSpec((R, Qk), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * len(splits)
                + [pl.BlockSpec((Qk, P), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)]
                * (2 * len(mats)))
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024,
                                  dimension_semantics=("parallel",))
    out = pl.pallas_call(
        functools.partial(_rowblock_kernel, nviews=len(splits)),
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, P), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, P), jnp.float32),
        compiler_params=params,
        interpret=interpret,
    )(*xs, *consts)
    return out.reshape(-1)[:out_len]


_ROWBLOCK_OK = [None]


def rowblock_runtime_ok() -> bool:
    """Once-per-process probe compile (see runtime_ok)."""
    if _ROWBLOCK_OK[0] is None:
        try:
            with jax.ensure_compile_time_eval():
                xp = jnp.zeros((MIN_N,), jnp.float32)
                taps = np.zeros((160, 21), np.float32)
                taps[:, 10] = 1.0
                offs = tuple(int((p * 147) // 160) for p in range(160))
                out = resample_rowblock_pallas(
                    xp, taps, 160, 147, offs, 10, MIN_N * 160 // 147)
                float(np.asarray(out)[0])
            _ROWBLOCK_OK[0] = True
        except Exception as e:
            _ROWBLOCK_OK[0] = False
            import warnings
            warnings.warn(
                "Pallas row-block resample kernel failed its probe "
                f"compile on this runtime ({type(e).__name__}); using "
                "the XLA row-block path for large-Q factors this "
                "process.", RuntimeWarning, stacklevel=3)
    return _ROWBLOCK_OK[0]
