"""Streaming (chunked) processing for production serving.

The reference is a whole-buffer library; serving pipelines instead process
an unbounded signal in chunks.  These helpers carry the small overlap state
between chunks explicitly (pure functions of (chunk, state) — jit/scan
friendly), so a chunked run reproduces the whole-buffer *linear*
convolution exactly (the reference's whole-buffer equivalence contract,
convolution.rs:304-462).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .ops import conv_ops


class FirState(NamedTuple):
    """Carry for streaming FIR: the last ``m - 1`` input samples."""

    tail: jnp.ndarray


@functools.partial(jax.jit, static_argnums=(3,))
def _fir_step(chunk, tail, taps, fft_len):
    """One streaming step: (chunk, tail) -> (out, new_tail).

    Module-level and value-agnostic in ``taps`` (a traced argument), so the
    jit cache is shared across all ``StreamingFir`` instances with the same
    shapes/dtypes — equal-tap instances never recompile.

    out[i] = sum_k h[k] * ext[i + m - 1 - k] where ext = [tail, chunk]
    — i.e. the causal part of the linear convolution.
    """
    m = taps.shape[-1]
    ext = jnp.concatenate([tail.astype(chunk.dtype), chunk])
    h = taps.astype(ext.dtype)
    if fft_len >= ext.shape[-1]:
        # Long-kernel / short-chunk regime: blocking degenerates, use one
        # whole-extent FFT linear convolution instead.
        l = int(conv_ops.next_power_of_two(ext.shape[-1] + m - 1))
        lin = jnp.fft.ifft(jnp.fft.fft(ext, n=l) * jnp.fft.fft(h, n=l))
        lin = lin[..., : ext.shape[-1] + m - 1]
    else:
        lin = conv_ops.blocked_linear_conv(ext, h, fft_len)
    out = lin[..., m - 1: m - 1 + chunk.shape[-1]]
    # NOT -(m - 1): — that slice is the whole array when m == 1.  Cast back
    # to the carry dtype so lax.scan's carry structure stays fixed.
    new_tail = ext[..., ext.shape[-1] - (m - 1):].astype(tail.dtype)
    if not jnp.issubdtype(chunk.dtype, jnp.complexfloating):
        out = jnp.real(out).astype(chunk.dtype)
    else:
        out = out.astype(chunk.dtype)
    return out, new_tail


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
        self.fft_len = conv_ops.pick_fft_len(self.m)

    def init_state(self, dtype=jnp.complex64) -> FirState:
        dt = jnp.result_type(dtype, self.taps.dtype)
        return FirState(tail=jnp.zeros((max(self.m - 1, 0),), dtype=dt))

    def process(self, chunk: jnp.ndarray,
                state: FirState) -> Tuple[jnp.ndarray, FirState]:
        """Processes one chunk; returns (out, new_state) with
        ``len(out) == len(chunk)``."""
        out, new_tail = _fir_step(chunk, state.tail, self.taps, self.fft_len)
        return out, FirState(tail=new_tail)


def stream_chunks(fir: StreamingFir, x: jnp.ndarray,
                  chunk_size: int) -> jnp.ndarray:
    """Runs a whole signal through the streaming FIR via lax.scan (the
    verification harness for chunked == whole-buffer).  A non-divisible
    tail is processed as one final shorter chunk — no samples dropped."""
    n = x.shape[-1]
    nb = n // chunk_size
    state = fir.init_state(x.dtype)
    pieces = []
    if nb:
        chunks = x[: nb * chunk_size].reshape(nb, chunk_size)

        def step(st, chunk):
            out, new_state = fir.process(chunk, st)
            return new_state, out

        state, outs = jax.lax.scan(step, state, chunks)
        pieces.append(outs.reshape(-1))
    rem = x[nb * chunk_size:]
    if rem.shape[-1]:
        out, state = fir.process(rem, state)
        pieces.append(out)
    if len(pieces) == 1:
        return pieces[0]
    return jnp.concatenate(pieces)
