"""Pallas spectrum kernel (kernels/spectrum_pallas.py): interpret-mode
parity of the fused row-FFT + fftshift + |.| with numpy and with the XLA
four-step path it replaces (VERDICT r1 #1 — the flagship chain's dominant
stage).  Realizes fft = plain_fft + fft_shift (time_to_freq.rs:158-165)
plus magnitude in one kernel."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basic_dsp_tpu.kernels import spectrum_pallas as sp
from basic_dsp_tpu.ops import fourstep
from basic_dsp_tpu import pipelines


@pytest.mark.parametrize("n1,n2", [(8, 2048), (16, 4096), (4, 1024),
                                   (8, 32768), (8, 65536)])
def test_rowfft_mag_matches_numpy(n1, n2):
    rng = np.random.default_rng(0)
    L2 = n2 // sp.LANES
    x = (rng.normal(size=(n1, n2)) + 1j * rng.normal(size=(n1, n2))
         ).astype(np.complex64)
    ref = np.abs(np.fft.fft(x, axis=-1))
    M = np.asarray(sp.rowfft_mag(jnp.asarray(x.real), jnp.asarray(x.imag),
                                 shift=True, interpret=True))
    rec = np.zeros((n1, n2), np.float32)
    for k2s in range(sp.LANES):
        k2 = (k2s + sp.LANES // 2) % sp.LANES
        rec[:, np.arange(L2) + L2 * k2] = M[:, :, k2s]
    assert np.max(np.abs(rec - ref)) / np.max(ref) < 2e-6


def test_rowfft_mag_no_shift():
    rng = np.random.default_rng(1)
    n1, n2 = 8, 2048
    L2 = n2 // sp.LANES
    x = (rng.normal(size=(n1, n2)) + 1j * rng.normal(size=(n1, n2))
         ).astype(np.complex64)
    ref = np.abs(np.fft.fft(x, axis=-1))
    M = np.asarray(sp.rowfft_mag(jnp.asarray(x.real), jnp.asarray(x.imag),
                                 shift=False, interpret=True))
    rec = np.zeros((n1, n2), np.float32)
    for k2 in range(sp.LANES):
        rec[:, np.arange(L2) + L2 * k2] = M[:, :, k2]
    assert np.max(np.abs(rec - ref)) / np.max(ref) < 2e-6


@pytest.mark.parametrize("n", [1 << 16, 1 << 18])
@pytest.mark.parametrize("fold", [False, True])
def test_spectrum_matches_xla_four_step(n, fold):
    rng = np.random.default_rng(2)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    xd = jnp.asarray(x)
    ref = np.asarray(jax.jit(fourstep.dif_spectrum_mag)(xd))
    got = np.asarray(jax.jit(lambda z: sp.dif_spectrum_mag_pallas(
        z, interpret=True, fold_twiddle=fold))(xd))
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) / np.max(ref) < 2e-6


def test_spectrum_matches_numpy_shifted_fft():
    n = 1 << 16
    rng = np.random.default_rng(3)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    ref = np.abs(np.fft.fftshift(np.fft.fft(x)))
    got = np.asarray(jax.jit(
        lambda z: sp.dif_spectrum_mag_pallas(z, interpret=True))(
            jnp.asarray(x)))
    assert np.max(np.abs(got - ref)) / np.max(ref) < 2e-6


def test_supported_geometry_gate():
    assert sp.supported(128, 32768)
    assert not sp.supported(128, 32768 + 128)   # L2 not a power of two
    assert not sp.supported(128, 192)           # n2 not L2*128 with L2>=2


def test_dispatch_gate_auto():
    """The Pallas spectrum gate is auto: ON on TPU backends (on-chip win,
    probe_spectrum.log: 0.722 vs 0.861 ms at 4M after the MXU DFT finish
    + 3-mult dots), OFF elsewhere (Mosaic targets TPU; these CPU tests
    must see it disabled), and an explicit config value overrides."""
    import dataclasses

    from basic_dsp_tpu import config
    cfg = config.default_config()
    assert cfg.use_pallas_spectrum is None  # auto
    assert not cfg.pallas_spectrum_enabled()  # CPU test backend -> off
    on = dataclasses.replace(cfg, use_pallas_spectrum=True)
    off = dataclasses.replace(cfg, use_pallas_spectrum=False)
    assert on.pallas_spectrum_enabled() and not off.pallas_spectrum_enabled()


def test_planar_chain_matches_generic_chain():
    """fir_fft_chain_planar == fir_fft_chain with complex-cast taps (the
    all-planar flagship path never materializes interleaved complex)."""
    from basic_dsp_tpu import pipelines
    n, m = 1 << 16, 128
    rng = np.random.default_rng(5)
    xr = jnp.asarray(rng.normal(size=n).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
    taps = rng.normal(size=m).astype(np.float32)
    taps /= np.abs(taps).sum()
    window = jnp.asarray(np.hamming(n).astype(np.float32))
    ref = np.asarray(pipelines.fir_fft_chain(
        xr + 1j * xi, jnp.asarray(taps.astype(np.complex64)), window))
    got = np.asarray(pipelines.fir_fft_chain_planar(
        xr, xi, jnp.asarray(taps), window, interpret=True))
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) / np.max(ref) < 2e-6


def test_fourstep_mag_fused_matches_rowfft_path():
    """The fully-fused kernel (stage-1 DFT via double-buffered panel DMA
    + twiddle + row FFT + shift + |.|) must match the XLA-stage-1 +
    rowfft_mag path, which itself is numpy-pinned above."""
    from basic_dsp_tpu import pipelines
    n, m = 1 << 16, 64
    rng = np.random.default_rng(6)
    xr = jnp.asarray(rng.normal(size=n).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
    taps = rng.normal(size=m).astype(np.float32)
    taps /= np.abs(taps).sum()
    window = jnp.asarray(np.hamming(n).astype(np.float32))
    ref = np.asarray(pipelines.fir_fft_chain_planar(
        xr, xi, jnp.asarray(taps), window, interpret=True))
    got = np.asarray(pipelines.fir_fft_chain_planar(
        xr, xi, jnp.asarray(taps), window, interpret=True, fused=True))
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) / np.max(ref) < 2e-6


@pytest.mark.parametrize("fold", [False, True])
def test_spectrum_transposed_output_matches(fold):
    """The transposed-output variant (grid-resident accumulator block +
    in-VMEM block transpose) must produce the identical flat spectrum."""
    n = 1 << 16
    rng = np.random.default_rng(5)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    xd = jnp.asarray(x)
    ref = np.asarray(jax.jit(lambda z: sp.dif_spectrum_mag_pallas(
        z, interpret=True, fold_twiddle=fold))(xd))
    got = np.asarray(jax.jit(lambda z: sp.dif_spectrum_mag_pallas(
        z, interpret=True, fold_twiddle=fold, transposed=True))(xd))
    assert got.shape == ref.shape
    # default path streams the FACTORED twiddle (round 5, one extra f32
    # product rounding); transposed keeps dense T -> rounding-grade diff
    np.testing.assert_allclose(got, ref, rtol=0,
                               atol=1e-5 * np.abs(ref).max())


@pytest.mark.parametrize("fused", [False, True])
def test_planar_chain_transposed_matches(fused):
    """fir_fft_chain_planar(transposed=True) — kernel-side natural-order
    output — must equal the default chain exactly."""
    from basic_dsp_tpu import pipelines
    n, m = 1 << 16, 64
    rng = np.random.default_rng(7)
    xr = jnp.asarray(rng.normal(size=n).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
    taps = rng.normal(size=m).astype(np.float32)
    taps /= np.abs(taps).sum()
    window = jnp.asarray(np.hamming(n).astype(np.float32))
    ref = np.asarray(pipelines.fir_fft_chain_planar(
        xr, xi, jnp.asarray(taps), window, interpret=True, fused=fused))
    got = np.asarray(pipelines.fir_fft_chain_planar(
        xr, xi, jnp.asarray(taps), window, interpret=True, fused=fused,
        transposed=True))
    np.testing.assert_allclose(got, ref, rtol=0,
                               atol=1e-5 * np.abs(ref).max())


@pytest.mark.parametrize("n1,n2", [(8, 32768), (16, 4096)])
def test_rowfft_mag_transposed_layout(n1, n2):
    """rowfft_mag(transposed=True) returns (128, L2, n1) equal to the
    default output's transpose, including at L2 >= 256 (the MXU DFT-m0
    finish path the flagship geometry uses)."""
    rng = np.random.default_rng(9)
    x = (rng.normal(size=(n1, n2)) + 1j * rng.normal(size=(n1, n2))
         ).astype(np.complex64)
    M = np.asarray(sp.rowfft_mag(jnp.asarray(x.real), jnp.asarray(x.imag),
                                 shift=True, interpret=True))
    Mt = np.asarray(sp.rowfft_mag(jnp.asarray(x.real), jnp.asarray(x.imag),
                                  shift=True, interpret=True,
                                  transposed=True))
    assert Mt.shape == (sp.LANES, n2 // sp.LANES, n1)
    np.testing.assert_array_equal(Mt, M.transpose(2, 1, 0))


@pytest.mark.parametrize("budget", ["high", "high-xla", "high-kernel"])
def test_planar_chain_budget_accuracy(budget):
    """Per-stage precision budget (VERDICT r2 #1b): the 3-pass budget
    modes stay within ~1e-5 of the exact chain.  On CPU the XLA-side
    precision flag is a no-op (f32 matmuls are exact), but the kernel's
    MANUAL hi/lo bf16 3-pass decomposition executes literally in
    interpret mode, so the in-kernel budget error is exercised here;
    the on-chip A/B is probe_budget.log."""
    n, m = 1 << 16, 64
    rng = np.random.default_rng(11)
    xr = jnp.asarray(rng.normal(size=n).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
    taps = rng.normal(size=m).astype(np.float32)
    taps /= np.abs(taps).sum()
    window = jnp.asarray(np.hamming(n).astype(np.float32))
    ref = np.asarray(pipelines.fir_fft_chain_planar(
        xr, xi, jnp.asarray(taps), window, interpret=True))
    got = np.asarray(pipelines.fir_fft_chain_planar(
        xr, xi, jnp.asarray(taps), window, interpret=True, budget=budget))
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert rel < 5e-5, (budget, rel)


def test_modulation_chain_planar_matches_complex_path():
    """pipelines.modulation_chain_planar == interpolatef on the complex
    vector, exactly (real taps resample the planes independently;
    reference examples/modulation.rs:14-41)."""
    from basic_dsp_tpu.ops import interp_ops
    from basic_dsp_tpu.conv_types import RaisedCosineFunction

    rng = np.random.default_rng(12)
    n = 4096
    sr = jnp.asarray(rng.choice([-0.5, 0.5], n).astype(np.float32))
    si = jnp.asarray(rng.choice([-0.5, 0.5], n).astype(np.float32))
    re, im = pipelines.modulation_chain_planar(sr, si)
    shaped = interp_ops.interpolatef(
        sr + 1j * si, RaisedCosineFunction(0.35), 10.0, 0.0, 10, 1.0)
    np.testing.assert_array_equal(np.asarray(re), np.real(shaped))
    np.testing.assert_array_equal(np.asarray(im), np.imag(shaped))


@pytest.mark.parametrize("n1,n2", [(8, 32768), (16, 65536), (16, 4096)])
def test_rowfft_mag_permuted_flatten(n1, n2):
    """permuted=True leaves the kernel's middle axis in the DFT-m0
    finish's native order (skipping the in-VMEM stack+swapaxes relayout);
    natural_flatten folds the reorder into the single XLA transpose and
    the flattened spectra must be IDENTICAL."""
    rng = np.random.default_rng(13)
    x = (rng.normal(size=(n1, n2)) + 1j * rng.normal(size=(n1, n2))
         ).astype(np.complex64)
    M = sp.rowfft_mag(jnp.asarray(x.real), jnp.asarray(x.imag),
                      shift=True, interpret=True)
    Mp = sp.rowfft_mag(jnp.asarray(x.real), jnp.asarray(x.imag),
                       shift=True, interpret=True, permuted=True)
    np.testing.assert_array_equal(
        np.asarray(sp.natural_flatten(Mp, permuted=True)),
        np.asarray(sp.natural_flatten(M, permuted=False)))


@pytest.mark.parametrize("n1,n2", [(8, 32768), (16, 4096)])
def test_rowfft_mag_wide_matches_permuted(n1, n2):
    """wide=True (per-slice lane dots, no post-finish stack) must equal
    the permuted layout exactly."""
    rng = np.random.default_rng(17)
    x = (rng.normal(size=(n1, n2)) + 1j * rng.normal(size=(n1, n2))
         ).astype(np.complex64)
    M = sp.rowfft_mag(jnp.asarray(x.real), jnp.asarray(x.imag),
                      shift=True, interpret=True, permuted=True)
    Mw = sp.rowfft_mag(jnp.asarray(x.real), jnp.asarray(x.imag),
                       shift=True, interpret=True, permuted=True,
                       wide=True)
    np.testing.assert_array_equal(np.asarray(Mw), np.asarray(M))


def test_fused_chain_budget_accuracy():
    """budget threads through the FUSED megakernel path too (stage-1 in
    kernel): 3-pass error bound holds in interpret mode."""
    n, m = 1 << 16, 64
    rng = np.random.default_rng(19)
    xr = jnp.asarray(rng.normal(size=n).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
    taps = rng.normal(size=m).astype(np.float32)
    taps /= np.abs(taps).sum()
    window = jnp.asarray(np.hamming(n).astype(np.float32))
    ref = np.asarray(pipelines.fir_fft_chain_planar(
        xr, xi, jnp.asarray(taps), window, interpret=True, fused=True))
    got = np.asarray(pipelines.fir_fft_chain_planar(
        xr, xi, jnp.asarray(taps), window, interpret=True, fused=True,
        budget="high"))
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert rel < 5e-5, rel


def test_factored_twiddle_matches_dense():
    """fourstep._dif_twiddle_factored: A[k1,j1]*B[k1,j2] must equal the
    dense T[k1, j1*128+j2] to f32 rounding for several (n1, n2), and the
    kernel's factored path must match the dense-twiddle path."""
    from basic_dsp_tpu.ops import fourstep

    for n1, n2 in ((8, 1024), (16, 2048), (128, 8192)):
        Fr, Fi, Tr, Ti = fourstep._dif_planes(n1, n2)
        Ar, Ai, Br, Bi = fourstep._dif_twiddle_factored(n1, n2)
        L2 = n2 // 128
        Trf = (Ar[:, :, None] * Br[:, None, :]
               - Ai[:, :, None] * Bi[:, None, :]).reshape(n1, n2)
        Tif = (Ar[:, :, None] * Bi[:, None, :]
               + Ai[:, :, None] * Br[:, None, :]).reshape(n1, n2)
        assert np.abs(Trf - Tr).max() < 3e-7, (n1, n2)
        assert np.abs(Tif - Ti).max() < 3e-7, (n1, n2)
