"""Flagship end-to-end pipelines (the BASELINE.md benchmark configs),
expressed as pure jittable functions over raw arrays."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .ops import conv_ops, fft_ops, fourstep


def _shifted_mag(windowed: jnp.ndarray) -> jnp.ndarray:
    """|fftshift(FFT(windowed))| — four-step MXU path for factorable 1-D
    lengths, whole-signal XLA FFT otherwise.

    DIF beats DIT in the fused chain (profile2.log: CHAIN_dif128 0.80 ms
    vs CHAIN_pipeline/dit 0.99 ms at 4M): the DIF stage-1 is a matmul that
    XLA fuses with the preceding convolution's output, while DIT's stage-1
    FFT is a custom call nothing fuses into."""
    n = windowed.shape[-1]
    n1, n2 = fourstep.factor(n)
    if windowed.ndim == 1 and n1 >= 64 and n2 % 2 == 0:
        from . import config
        if getattr(config.default_config(), "use_pallas_spectrum", False):
            from .kernels import spectrum_pallas
            if spectrum_pallas.supported(n1, n2):
                return spectrum_pallas.dif_spectrum_mag_pallas(windowed, n1)
        return fourstep.dif_spectrum_mag(windowed, n1)
    return jnp.abs(fft_ops.fft_shifted(windowed))


@functools.partial(jax.jit, static_argnames=("fft_len",))
def fir_fft_chain(x: jnp.ndarray, taps: jnp.ndarray, window: jnp.ndarray,
                  fft_len: int = 0):
    """Config #1+#2 chain: centered FIR, then a windowed, shifted FFT
    magnitude spectrum.

    This is the "north-star" HBM-roofline chain (BASELINE.md).  Measured
    stage profile at 4M/128 taps on TPU v5e (profile_r2.log): the FIR runs
    on the MXU Toeplitz path (0.25 ms); the spectrum runs the DIT-dual
    four-step whose stage-1 FFT consumes the convolution's natural
    (rows, 128) layout with no relayout, precomputed twiddles, the
    fftshift folded into the DFT-matrix columns, and the final transpose
    on f32 magnitudes (ops/fourstep.py).
    """
    m = taps.shape[-1]
    n = x.shape[-1]
    if m <= 202 and n > 1000:
        filtered = conv_ops.toeplitz_conv(x, taps, True)
    else:
        fl = conv_ops.pick_fft_len(m, fft_len) if fft_len else \
            conv_ops.pick_fft_len(m)
        filtered = conv_ops.overlap_save(x, taps, True, fl)
    windowed = filtered * window.astype(filtered.dtype)
    return _shifted_mag(windowed)


@jax.jit
def windowed_spectrum(x: jnp.ndarray, window: jnp.ndarray):
    """Config #1: windowed FFT magnitude of a (real or complex) signal."""
    work = x.astype(jnp.result_type(x.dtype, jnp.complex64))
    return _shifted_mag(work * window.astype(work.dtype))
