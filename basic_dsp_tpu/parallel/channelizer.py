"""Polyphase channelizer and FM demodulation — the 1024-channel wideband
config (BASELINE.md config #5).

The building blocks are the reference's own primitives, reassembled
TPU-first:

* ``split_into``/``merge`` round-robin polyphase decomposition
  (data_reorganization.rs:170-214) becomes a reshape;
* the per-phase FIR becomes one batched matmul-friendly convolution over the
  phase axis;
* the channel mixing is a batched FFT across the phase axis (the classic
  critically-sampled polyphase filterbank identity).

Channel axis shards naturally over the mesh; with a sharded channel axis the
final per-channel demod runs fully parallel with zero communication.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import config


def _permuted_tap_cols(prototype: jnp.ndarray, C: int) -> jnp.ndarray:
    """(t, C) tap matrix in *column* order: column c carries the taps of
    phase (C - c) mod C.  Precomputing this permutation is what lets the
    channelizer run entirely in the natural (samples, phases) row layout
    with no lane-axis flip (see :func:`_channelize_rows`)."""
    t = prototype.shape[-1] // C
    h_rc = prototype.reshape(t, C)                    # h_rc[r, p] = h[p+r*C]
    perm = (C - jnp.arange(C)) % C
    return h_rc[:, perm]


def _channelize_rows(ext: jnp.ndarray, taps_cols: jnp.ndarray,
                     s_out: int) -> jnp.ndarray:
    """Filterbank core in (rows, C) layout.

    ``ext``: (t-1+s_out+1, C) rows of consecutive samples, already padded
    at the top with t zero-or-halo rows (ext[i, q] = x[(i - t)*C + q] for
    in-range indices).  Output: (s_out, C) channel rows y[s, k].

    The filterbank identity needs v_p[s] = x[s*C - p]; in row layout that
    is the *previous* row's column C-p for p >= 1 and the current row's
    column 0 for p == 0.  Instead of materializing a lane-reversed copy
    (a minor-axis flip of the whole signal forces an XLA relayout), keep
    columns in natural order, apply the taps of phase (C-c) mod C to
    column c (``taps_cols``), and absorb the index reversal into the
    phase->channel DFT:  y_k = sum_p u_p w^{kp} = C * ifft(u~)[k]  where
    u~[c] = u_{(C-c)%C}.  Verified exact (2e-15) against the direct
    per-phase formulation.

    Reference anchors: split_into round-robin semantics
    (data_reorganization.rs:170-214); per-phase FIR = convolve_signal
    applied branchwise (convolution.rs:477-542).
    """
    t, C = taps_cols.shape
    tr = taps_cols.astype(ext.dtype)
    # w[i, c]: column 0 from row i, columns 1.. from row i-1 (the
    # filterbank delay line), all still in natural lane order.
    w = jnp.concatenate([ext[1:, :1], ext[:-1, 1:]], axis=1)
    # Per-column causal FIR down the row axis: t shifted row-slices of one
    # array, fused by XLA into a single pass (gathers are catastrophically
    # slow on TPU — CLAUDE.md).
    u = w[t - 1: t - 1 + s_out] * tr[0][None, :]
    for r in range(1, t):
        u = u + w[t - 1 - r: t - 1 - r + s_out] * tr[r][None, :]
    # Channel mixing on the MINOR axis (the fast FFT layout on TPU).
    return C * jnp.fft.ifft(u, axis=1)


def polyphase_channelizer(x: jnp.ndarray, prototype: jnp.ndarray,
                          n_channels: int) -> jnp.ndarray:
    """Critically-sampled polyphase filterbank channelizer.

    Args:
      x: complex input signal, length divisible by ``n_channels``.
      prototype: real lowpass prototype filter, length divisible by
        ``n_channels`` (taps_per_phase = len // n_channels).
      n_channels: number of output channels.

    Returns:
      (n_channels, len(x)//n_channels) complex array of baseband channels.
    """
    n = x.shape[-1]
    assert n % n_channels == 0
    C = n_channels
    y = _channelize_rows_padded(x, prototype, C)
    return y.T


def _channelize_rows_padded(x: jnp.ndarray, prototype: jnp.ndarray,
                            C: int) -> jnp.ndarray:
    """(S, C) channel rows for a whole signal (zero causal padding)."""
    taps_cols = _permuted_tap_cols(prototype, C)
    t = taps_cols.shape[0]
    X = x.reshape(-1, C)                              # X[s, q] = x[s*C + q]
    S = X.shape[0]
    ext = jnp.concatenate([jnp.zeros((t, C), X.dtype), X], axis=0)
    return _channelize_rows(ext, taps_cols, S)


def fm_demodulate(baseband: jnp.ndarray) -> jnp.ndarray:
    """Per-channel FM demodulation: instantaneous frequency via the phase of
    the one-sample autocorrelation (the modulation.rs chain's demod side).

    Works on (channels, n) or (n,) complex arrays.
    """
    prev = jnp.concatenate([baseband[..., :1], baseband[..., :-1]], axis=-1)
    return jnp.angle(baseband * jnp.conj(prev))


def channelize_and_demod(x: jnp.ndarray, prototype: jnp.ndarray,
                         n_channels: int) -> jnp.ndarray:
    """The flagship wideband pipeline: channelize + per-channel FM demod.

    Runs entirely in (samples, channels) row layout — the FM demod's
    one-sample lookback is a row shift there — so the only transpose in
    the pipeline lands on the f32 angles (half the bytes of transposing
    the complex baseband)."""
    y = _channelize_rows_padded(x, prototype, n_channels)   # (S, C)
    prev = jnp.concatenate([y[:1], y[:-1]], axis=0)
    return jnp.angle(y * jnp.conj(prev)).T


def sharded_channelize_and_demod(x: jnp.ndarray, prototype: jnp.ndarray,
                                 n_channels: int, mesh: Mesh,
                                 axis_name: str = "dsp") -> jnp.ndarray:
    """Mesh-parallel channelizer + FM demod, sharded over the *sample* axis.

    TPU-first layout choice: each device holds a contiguous block of input
    samples, i.e. rows of the (samples, phases) polyphase matrix.  Then

    * the per-phase causal FIR runs along the local row axis — only a
      ``(taps_per_phase + 1)`` row halo crosses the ICI (one ppermute);
    * the phase→channel DFT is along the *local* phase axis — zero
      communication (vs channel-axis sharding, which would put the DFT
      across devices);
    * the FM demod consumes one preceding row, already covered by the halo.

    Output: (n_channels, n // n_channels), sample axis sharded over the
    mesh.  Exact match with :func:`channelize_and_demod` (the ppermute edge
    convention — devices with no source get zeros — reproduces the causal
    zero-padding at the global start).
    """
    C = n_channels
    n = x.shape[-1]
    d = int(mesh.shape[axis_name])
    if n % C != 0:
        raise ValueError(f"signal length {n} not divisible by {C} channels")
    S = n // C
    if S % d != 0:
        raise ValueError(f"rows {S} not divisible by mesh size {d}")
    t = prototype.shape[-1] // C
    if S // d < t + 1:
        raise ValueError("shard shorter than FIR+demod halo; "
                         "use fewer devices")
    fn = _sharded_channelizer_fn(mesh, axis_name, C, t, d)
    return fn(x, prototype)


@functools.lru_cache(maxsize=32)
def _sharded_channelizer_fn(mesh: Mesh, axis_name: str, C: int, t: int,
                            d: int):
    def body(xb, proto):
        # xb: (n/d,) contiguous local samples; halo = last (t+1) rows of the
        # left neighbor (FIR depth t rows + 1 row of demod lookback; the
        # one-sample polyphase delay rides inside the row structure).
        taps_cols = _permuted_tap_cols(proto, C)
        halo_n = (t + 1) * C
        fwd = [(i, i + 1) for i in range(d - 1)]  # no wrap: dev 0 gets zeros
        halo = jax.lax.ppermute(xb[-halo_n:], axis_name, fwd)
        ext = jnp.concatenate([halo, xb]).reshape(-1, C)
        s_out = xb.shape[-1] // C + 1        # +1 row for the demod lookback
        y = _channelize_rows(ext, taps_cols, s_out)
        dem = jnp.angle(y[1:] * jnp.conj(y[:-1]))
        return dem.T                          # (C, S_local)

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(None, axis_name),
    ))
