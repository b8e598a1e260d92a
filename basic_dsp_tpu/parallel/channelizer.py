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
    taps = prototype.reshape(-1, C).T                 # h_p[r] = h[p + r*C]
    # Round-robin split (reference split_into semantics): branch q holds
    # samples q, q+C, q+2C, …  The filterbank identity needs the phase-p
    # input v_p[s] = x[s*C - p], i.e. branch (C-p) mod C delayed by one
    # sample for p > 0.
    xs = x.reshape(-1, C).T                           # xs[q][s] = x[s*C + q]
    delayed = jnp.concatenate(
        [jnp.zeros_like(xs[..., :1]), xs[..., :-1]], axis=-1)
    v = jnp.concatenate([xs[0:1], delayed[1:][::-1]], axis=0)
    # Per-phase causal FIR: u_p[m] = sum_r h_p[r] v_p[m - r].  Gather-free
    # (gathers are catastrophically slow on TPU — CLAUDE.md): the t-tap FIR
    # is t shifted slices of one padded array, fused by XLA into a single
    # pass; taps_per_phase is small (prototype_len / C), so this beats both
    # the windowed-gather and a 128x128 banded-Toeplitz matmul (whose tap
    # matrices alone would be C*64KB of HBM traffic).
    t = taps.shape[-1]
    S = v.shape[-1]
    xp = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(t - 1, 0)])
    tr = taps.astype(v.dtype)
    u = xp[..., 0:S] * tr[:, t - 1][:, None]
    for k in range(1, t):
        u = u + xp[..., k:k + S] * tr[:, t - 1 - k][:, None]
    # Channel mixing: y_k[m] = sum_p u_p[m] e^{-2pi i k p / C} == DFT over
    # the phase axis.
    return jnp.fft.fft(u, axis=0)


def fm_demodulate(baseband: jnp.ndarray) -> jnp.ndarray:
    """Per-channel FM demodulation: instantaneous frequency via the phase of
    the one-sample autocorrelation (the modulation.rs chain's demod side).

    Works on (channels, n) or (n,) complex arrays.
    """
    prev = jnp.concatenate([baseband[..., :1], baseband[..., :-1]], axis=-1)
    return jnp.angle(baseband * jnp.conj(prev))


def channelize_and_demod(x: jnp.ndarray, prototype: jnp.ndarray,
                         n_channels: int) -> jnp.ndarray:
    """The flagship wideband pipeline: channelize + per-channel FM demod."""
    channels = polyphase_channelizer(x, prototype, n_channels)
    return fm_demodulate(channels)


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
        taps_rc = proto.reshape(t, C).astype(xb.dtype)   # taps_rc[r, p]
        halo_n = (t + 1) * C
        fwd = [(i, i + 1) for i in range(d - 1)]  # no wrap: dev 0 gets zeros
        halo = jax.lax.ppermute(xb[-halo_n:], axis_name, fwd)
        ext = jnp.concatenate([halo, xb]).reshape(-1, C)
        # v2[i, p] = x[(row i)*C - p]: phase 0 from this row, phases 1..C-1
        # from the previous row reversed (the filterbank delay line).
        v2 = jnp.concatenate([ext[1:, :1], ext[:-1, 1:][..., ::-1]], axis=1)
        s_out = xb.shape[-1] // C + 1        # +1 row for the demod lookback
        u = v2[t - 1: t - 1 + s_out] * taps_rc[0][None, :]
        for r in range(1, t):
            u = u + v2[t - 1 - r: t - 1 - r + s_out] * taps_rc[r][None, :]
        y = jnp.fft.fft(u, axis=1)           # local phase-axis DFT
        dem = jnp.angle(y[1:] * jnp.conj(y[:-1]))
        return dem.T                          # (C, S_local)

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(None, axis_name),
    ))
