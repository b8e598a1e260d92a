"""Mesh-distributed FFT via the four-step (Bailey) decomposition.

A length-N DFT with N = N1*N2 factors into: columns-FFT (N1) -> twiddle ->
rows-FFT (N2) -> transpose.  Sharding the (N1, N2) matrix over rows makes
each FFT stage local; the data redistribution between stages is the
all-to-all that XLA inserts for the sharding-constraint change — this is
the "spectra ride the ICI" design from SURVEY.md §5 (distributed
communication backend) realized for the FFT itself.

The single-chip variant (``four_step_fft``) is also the building block the
blocked pipelines use for very large transforms.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _split_factors(n: int):
    """n = n1 * n2 with n1, n2 as close as possible (balanced powers of two
    when n is a power of two)."""
    if n & (n - 1) == 0:
        half = (n.bit_length() - 1) // 2
        n1 = 1 << half
        return n1, n // n1
    r = int(math.isqrt(n))
    while n % r != 0:
        r -= 1
    return r, n // r


def four_step_fft(x: jnp.ndarray, n1: int = 0, n2: int = 0) -> jnp.ndarray:
    """Unscaled forward DFT == jnp.fft.fft, evaluated as two batched
    smaller FFTs + twiddle + transpose."""
    n = x.shape[-1]
    if not n1:
        n1, n2 = _split_factors(n)
    assert n1 * n2 == n
    A = x.reshape(x.shape[:-1] + (n1, n2))
    B = jnp.fft.fft(A, axis=-2)
    k1 = jnp.arange(n1)[:, None]
    m2 = jnp.arange(n2)[None, :]
    tw = jnp.exp(-2j * jnp.pi * ((k1 * m2) % n) / n).astype(B.dtype)
    C = jnp.fft.fft(B * tw, axis=-1)
    return jnp.swapaxes(C, -1, -2).reshape(x.shape)


def four_step_ifft(x: jnp.ndarray, n1: int = 0, n2: int = 0) -> jnp.ndarray:
    """Unscaled inverse DFT == N * jnp.fft.ifft (rustfft convention)."""
    n = x.shape[-1]
    out = jnp.conj(four_step_fft(jnp.conj(x), n1, n2))
    return out


def sharded_fft(x: jnp.ndarray, mesh: Mesh,
                axis_name: str = "dsp") -> jnp.ndarray:
    """Distributed unscaled DFT of a time-sharded signal.

    Stage 1 (columns FFT) runs with rows sharded; the twiddle multiply is
    elementwise; stage 2 needs the other axis local, so a sharding
    constraint flips the partitioned axis and XLA inserts the all-to-all.
    Result is returned sharded over the (transposed) output axis.
    """
    n = x.shape[-1]
    d = mesh.devices.size
    n1, n2 = _split_factors(n)
    if n1 % d != 0 and n2 % d != 0:
        raise ValueError(f"{n}={n1}x{n2}: neither factor divisible by mesh size {d}; "
            f"sharded_fft needs d | n1 or d | n2 — power-of-two lengths "
            f"always qualify (docs/API.md, divisibility contract)")

    @functools.partial(jax.jit)
    def fn(x):
        A = x.reshape(n1, n2)
        # Stage 1 FFTs over n1 (axis 0): keep that axis local, shard n2.
        A = jax.lax.with_sharding_constraint(
            A, NamedSharding(mesh, P(None, axis_name)))
        B = jnp.fft.fft(A, axis=0)
        k1 = jnp.arange(n1)[:, None]
        m2 = jnp.arange(n2)[None, :]
        tw = jnp.exp(-2j * jnp.pi * ((k1 * m2) % n) / n).astype(B.dtype)
        B = B * tw
        # Stage 2 FFTs over n2 (axis 1): flip the partitioned axis — XLA
        # inserts the all-to-all here.
        B = jax.lax.with_sharding_constraint(
            B, NamedSharding(mesh, P(axis_name, None)))
        C = jnp.fft.fft(B, axis=1)
        return jnp.swapaxes(C, 0, 1).reshape(-1)

    return fn(x)
