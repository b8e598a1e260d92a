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
    # Per-phase causal FIR: u_p[m] = sum_r h_p[r] v_p[m - r].
    t = taps.shape[-1]
    pad = [(0, 0)] * (v.ndim - 1) + [(t - 1, 0)]
    xp = jnp.pad(v, pad)
    idx = jnp.arange(v.shape[-1])[:, None] + jnp.arange(t)[None, :]
    windows = xp[..., idx]                            # (C, n/C, T)
    u = jnp.einsum("cnt,ct->cn", windows,
                   taps[..., ::-1].astype(windows.dtype),
                   precision=config.matmul_precision())
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
    """Mesh-parallel channelizer: the polyphase split + per-phase FIR runs
    with the *phase* axis sharded; the cross-phase IFFT is computed via jit
    with sharding constraints (XLA inserts the all-to-all/collectives), and
    the demod runs on the sharded channel axis with no communication."""
    def fn(x_, proto_):
        ch = polyphase_channelizer(x_, proto_, n_channels)
        ch = jax.lax.with_sharding_constraint(
            ch, NamedSharding(mesh, P(axis_name, None)))
        return fm_demodulate(ch)
    return jax.jit(fn)(x, prototype)
