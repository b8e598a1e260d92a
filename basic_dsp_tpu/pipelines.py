"""Flagship end-to-end pipelines (the BASELINE.md benchmark configs),
expressed as pure jittable functions over raw arrays."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .ops import conv_ops, fft_ops


@functools.partial(jax.jit, static_argnames=("fft_len",))
def fir_fft_chain(x: jnp.ndarray, taps: jnp.ndarray, window: jnp.ndarray,
                  fft_len: int = 0):
    """Config #1+#2 chain: centered FIR via blocked overlap-save, then a
    windowed, shifted FFT magnitude spectrum.

    This is the "north-star" HBM-roofline chain: the convolution runs as a
    batched small-FFT pipeline, the window multiply fuses into it, and the
    final spectrum is one large FFT.
    """
    m = taps.shape[-1]
    fl = conv_ops.pick_fft_len(m, fft_len) if fft_len else \
        conv_ops.pick_fft_len(m)
    filtered = conv_ops.overlap_save(x, taps, True, fl)
    windowed = filtered * window.astype(filtered.dtype)
    spectrum = fft_ops.fft_shifted(windowed)
    return jnp.abs(spectrum)


@jax.jit
def windowed_spectrum(x: jnp.ndarray, window: jnp.ndarray):
    """Config #1: windowed FFT magnitude of a (real or complex) signal."""
    work = x.astype(jnp.result_type(x.dtype, jnp.complex64))
    return jnp.abs(fft_ops.fft_shifted(work * window.astype(work.dtype)))
