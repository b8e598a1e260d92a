"""Pallas overlap-save kernel (kernels/overlap_save_pallas.py): interpret-
mode parity with the XLA blocked path across kernel/signal geometries
(VERDICT r1 #5).  The in-kernel FFT is a DFT-matmul four-step, so parity
here also validates that factorization."""
import jax.numpy as jnp
import numpy as np
import pytest

from basic_dsp_tpu.kernels import overlap_save_pallas as osp
from basic_dsp_tpu.ops import conv_ops
from tools import assert_vector_eq, create_complex_data, create_data


@pytest.mark.parametrize("n,m,fft_len", [
    (4096, 33, 1024),
    (4096, 128, 1024),
    (8192, 129, 2048),     # pad crosses one lane-group
    (5000, 63, 1024),      # n not a multiple of L
    (4096, 257, 4096),     # pad = 3 lane-groups; r1 != r2
])
def test_pallas_os_matches_xla_complex(n, m, fft_len):
    x = jnp.asarray(create_complex_data(n, n, dtype=np.complex64))
    h = jnp.asarray(create_complex_data(m, m, dtype=np.complex64))
    expected = np.asarray(conv_ops.overlap_save(x, h, True, fft_len))
    got = np.asarray(osp.overlap_save_pallas(x, h, True, fft_len,
                                             interpret=True))
    scale = max(float(np.abs(expected).max()), 1.0)
    assert_vector_eq(got, expected, tol=2e-5 * scale)


def test_pallas_os_real():
    n, m, fft_len = 4096, 65, 1024
    x = jnp.asarray(create_data(1, n, dtype=np.float32))
    h = jnp.asarray(create_data(2, m, dtype=np.float32))
    expected = np.asarray(conv_ops.overlap_save(x, h, False, fft_len))
    got = np.asarray(osp.overlap_save_pallas(x, h, False, fft_len,
                                             interpret=True))
    assert got.dtype == np.float32
    scale = max(float(np.abs(expected).max()), 1.0)
    assert_vector_eq(got, expected, tol=2e-5 * scale)


def test_pallas_os_kernel_longer_than_signal_clips():
    """Kernel clipping (mod.rs:284-295) flows through the Pallas path."""
    n, m, fft_len = 2048, 4097, 4096  # clipped m_eff = 2048 needs 2*m_eff
    x = jnp.asarray(create_complex_data(3, n, dtype=np.complex64))
    h = jnp.asarray(create_complex_data(4, m, dtype=np.complex64))
    expected = np.asarray(conv_ops.overlap_save(x, h, True, fft_len))
    got = np.asarray(osp.overlap_save_pallas(x, h, True, fft_len,
                                             interpret=True))
    scale = max(float(np.abs(expected).max()), 1.0)
    assert_vector_eq(got, expected, tol=2e-5 * scale)


def test_pallas_os_dispatch_gate_default_off():
    """Dispatch stays on the XLA path unless explicitly enabled (Mosaic
    hangs on the axon tunnel — CLAUDE.md)."""
    from basic_dsp_tpu import config
    assert not getattr(config.default_config(),
                       "use_pallas_overlap_save", False)
