"""Data reorganization: padding, interleaving, split/merge, reverse, shift.

Behavioral parity with reference general/data_reorganization.rs.  All
functions take/return arrays whose elements are *points* (complex dtype for
complex vectors) — the reference's interleaved-float bookkeeping disappears.

``zero_pad`` follows the buffered variant's Surround split
(data_reorganization.rs:429-443: ``right = diff/2; left = diff - right``)
which is the one exercised by correlation and the Octave-parity tests.
"""
from __future__ import annotations

import jax.numpy as jnp


def reverse(x: jnp.ndarray) -> jnp.ndarray:
    return x[..., ::-1]


def swap_halves(x: jnp.ndarray) -> jnp.ndarray:
    """FFT shift of the data (reference swap_halves == swap_halves_priv(true),
    data_reorganization.rs:249-252)."""
    return jnp.fft.fftshift(x, axes=-1)


def zero_pad(x: jnp.ndarray, points: int, option: str) -> jnp.ndarray:
    """Pad with zeros to ``points`` elements.

    option: 'end' | 'surround' | 'center' (reference PaddingOption,
    data_reorganization.rs:45-54).
    """
    n = x.shape[-1]
    diff = points - n
    if diff < 0:
        raise ValueError("zero_pad target smaller than input")
    if diff == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1)
    if option == "end":
        return jnp.pad(x, widths + [(0, diff)])
    if option == "surround":
        right = diff // 2
        left = diff - right
        return jnp.pad(x, widths + [(left, right)])
    if option == "center":
        right = n // 2
        left = n - right
        mid = jnp.zeros(x.shape[:-1] + (diff,), dtype=x.dtype)
        return jnp.concatenate(
            [x[..., :left], mid, x[..., left:]], axis=-1)
    raise ValueError(f"unknown padding option: {option}")


def zero_interleave(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Insert ``factor-1`` zeros after every element
    (data_reorganization.rs:362-397): [a, b] -> [a, 0, b, 0] for factor 2.

    This is the upsampler front-end of ``interpolatei``.
    """
    if factor <= 1:
        return x
    n = x.shape[-1]
    out = jnp.zeros(x.shape[:-1] + (n, factor), dtype=x.dtype)
    out = out.at[..., 0].set(x)
    return out.reshape(x.shape[:-1] + (n * factor,))


def split_into(x: jnp.ndarray, n_targets: int) -> jnp.ndarray:
    """Round-robin polyphase split (data_reorganization.rs:484-512):
    target[i % n][i // n] = x[i].  Returns an (n_targets, len/n) array."""
    n = x.shape[-1]
    return x.reshape(x.shape[:-1] + (n // n_targets, n_targets)).swapaxes(-1, -2)


def merge(parts: jnp.ndarray) -> jnp.ndarray:
    """Inverse of split_into: parts is (n_sources, m); out[i] =
    parts[i % n][i // n] (data_reorganization.rs:522-557)."""
    return parts.swapaxes(-1, -2).reshape(parts.shape[:-2] + (-1,))
