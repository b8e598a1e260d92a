"""Streaming (chunked) processing for production serving.

The reference is a whole-buffer library; serving pipelines instead process
an unbounded signal in chunks.  These helpers carry the small overlap state
between chunks explicitly (pure functions of (chunk, state) — jit/scan
friendly), so a chunked run reproduces the whole-buffer *linear*
convolution exactly.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .ops import conv_ops


class FirState(NamedTuple):
    """Carry for streaming FIR: the last ``m_eff - 1`` input samples."""

    tail: jnp.ndarray


class StreamingFir:
    """Causal-aligned streaming FIR with the centered-kernel taps.

    For chunk sequence x_0, x_1, … the concatenated outputs equal the
    *linear* centered convolution of the concatenated input, delayed by
    ``c - 1`` samples (the lookahead of the centered kernel becomes latency,
    as in any real-time filter).
    """

    def __init__(self, taps: jnp.ndarray):
        self.taps = jnp.asarray(taps)
        self.m = int(self.taps.shape[-1])

    def init_state(self, dtype=jnp.complex64) -> FirState:
        dt = jnp.result_type(dtype, self.taps.dtype)
        return FirState(tail=jnp.zeros((self.m - 1,), dtype=dt))

    @functools.partial(jax.jit, static_argnums=0)
    def process(self, chunk: jnp.ndarray,
                state: FirState) -> Tuple[jnp.ndarray, FirState]:
        """Processes one chunk; returns (out, new_state) with
        ``len(out) == len(chunk)``.

        out[i] = sum_k h[k] * ext[i + m - 1 - k] where ext = [tail, chunk]
        — i.e. the causal part of the linear convolution.
        """
        m = self.m
        ext = jnp.concatenate([state.tail.astype(chunk.dtype), chunk])
        fft_len = conv_ops.pick_fft_len(m)
        lin = conv_ops.blocked_linear_conv(ext, self.taps.astype(ext.dtype),
                                           fft_len)
        out = lin[..., m - 1: m - 1 + chunk.shape[-1]]
        new_tail = ext[..., -(m - 1):]
        return out, FirState(tail=new_tail)


def stream_chunks(fir: StreamingFir, x: jnp.ndarray,
                  chunk_size: int) -> jnp.ndarray:
    """Runs a whole signal through the streaming FIR via lax.scan (the
    verification harness for chunked == whole-buffer)."""
    n = x.shape[-1]
    nb = n // chunk_size
    chunks = x[: nb * chunk_size].reshape(nb, chunk_size)

    def step(state, chunk):
        out, new_state = fir.process(chunk, state)
        return new_state, out

    _, outs = jax.lax.scan(step, fir.init_state(x.dtype), chunks)
    return outs.reshape(-1)
