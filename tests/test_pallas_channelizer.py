"""Pallas channelizer+FM-demod megakernel (kernels/channelizer_pallas.py):
interpret-mode parity with the XLA pipeline (parallel/channelizer.py).

The kernel's outer IDFT dots run 3-pass bf16 hi/lo (the reference's own
f32 FMA grade, ~1e-6 relative — see the kernel docstring), so the angle
tolerance here is a few e-5 absolute, far below the 5e-3 bf16 grade the
precision contract guards against."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from basic_dsp_tpu import config
from basic_dsp_tpu.kernels import channelizer_pallas as ckp
from basic_dsp_tpu.parallel import channelizer


def _signal(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(
        np.complex64)


@pytest.mark.parametrize("C,n1,tile", [(256, 2, None), (512, 4, None),
                                       (1024, 8, 128)])
def test_channelizer_pallas_matches_xla(C, n1, tile):
    # the (1024, 8) case is the cfg5 geometry: full radix-2 inner IFFT
    # depth and all 8 per-group twiddled outer-IDFT constant blocks, at
    # a small tile so interpret mode stays fast.
    tile = tile or ckp.DEFAULT_TILE_ROWS
    S = 2 * tile
    n = S * C
    x = _signal(n, seed=C)
    proto = (np.hamming(C * 8) / C).astype(np.float32)
    assert ckp.supported(C, S, 8, tile_rows=tile)

    expected = np.asarray(channelizer.channelize_and_demod(
        jnp.asarray(x.real) + 1j * jnp.asarray(x.imag),
        jnp.asarray(proto), C))

    taps_merged = channelizer._merged_tap_rows(jnp.asarray(proto), C)
    ang = ckp.channelize_demod_pallas(
        jnp.asarray(x.real), jnp.asarray(x.imag), taps_merged, C,
        tile_rows=tile, interpret=True)
    got = np.asarray(ang).reshape(S, n1, 128).transpose(2, 1, 0).reshape(
        C, S)
    assert got.shape == expected.shape
    # atan2 amplifies the kernel's ~1e-6 z error by 1/|z|: compare the
    # WRAPPED angle difference, weighted by the conj-product magnitude
    # (elements with |z| ~ 0 have no defined phase to disagree about).
    zr, zi = ckp.channelize_demod_pallas(
        jnp.asarray(x.real), jnp.asarray(x.imag), taps_merged, C,
        tile_rows=tile, demod=False, interpret=True)
    amp = np.hypot(np.asarray(zr), np.asarray(zi)).reshape(
        S, n1, 128).transpose(2, 1, 0).reshape(C, S)
    d = np.abs(np.angle(np.exp(1j * (got - expected))))
    # The magnitude-weighted angle error |z|*d bounds the error in z
    # itself — scale-free and immune to the near-zero-|z| blowup
    # (measured 1.3e-6 * max|z| on this data).
    assert float((d * amp).max()) < 1e-5 * float(amp.max())
    np.testing.assert_array_less(d, np.pi / 8)


def test_channelizer_pallas_no_demod_planes():
    """demod=False returns the conj-product planes; atan2 outside must
    reproduce the fused angles exactly."""
    C, S = 256, 2 * ckp.DEFAULT_TILE_ROWS
    x = _signal(S * C, seed=3)
    proto = (np.hamming(C * 8) / C).astype(np.float32)
    taps_merged = channelizer._merged_tap_rows(jnp.asarray(proto), C)
    ang = np.asarray(ckp.channelize_demod_pallas(
        jnp.asarray(x.real), jnp.asarray(x.imag), taps_merged, C,
        interpret=True))
    zr, zi = ckp.channelize_demod_pallas(
        jnp.asarray(x.real), jnp.asarray(x.imag), taps_merged, C,
        demod=False, interpret=True)
    np.testing.assert_allclose(
        np.arctan2(np.asarray(zi), np.asarray(zr)), ang,
        atol=1e-6, rtol=1e-6)


def test_supported_gate():
    S = 4096
    assert ckp.supported(1024, S, 8)            # bench cfg5 geometry
    assert not ckp.supported(1024, S, 16)       # tap rows exceed the halo
    assert not ckp.supported(192, S, 8)         # C not a lane multiple
    assert not ckp.supported(1024, 300, 8)      # S not tile-divisible
    assert not ckp.supported(1024 * 32, S, 8)   # n1 > MAX_N1


def test_dispatch_uses_kernel_when_forced(monkeypatch):
    """With the config gate forced on, channelize_and_demod routes to the
    kernel (interpret mode via a monkeypatched entry so this runs on CPU)
    and matches the XLA pipeline."""
    calls = {}
    orig = ckp.channelize_demod_pallas

    def spy(xr, xi, taps, C, **kw):
        calls["hit"] = True
        kw["interpret"] = True
        return orig(xr, xi, taps, C, **kw)

    monkeypatch.setattr(
        "basic_dsp_tpu.kernels.channelizer_pallas.channelize_demod_pallas",
        spy)
    monkeypatch.setattr(ckp, "runtime_ok", lambda: True)
    cfg = dataclasses.replace(config.default_config(),
                              use_pallas_channelizer=True)
    monkeypatch.setattr(config, "_default_config", cfg)

    C = 256
    S = 2 * ckp.DEFAULT_TILE_ROWS
    x = _signal(S * C, seed=9)
    proto = (np.hamming(C * 8) / C).astype(np.float32)
    got = np.asarray(channelizer.channelize_and_demod(
        jnp.asarray(x.real) + 1j * jnp.asarray(x.imag),
        jnp.asarray(proto), C))
    assert calls.get("hit"), "dispatch did not route to the Pallas kernel"
    cfg_off = dataclasses.replace(config.default_config(),
                                  use_pallas_channelizer=False)
    monkeypatch.setattr(config, "_default_config", cfg_off)
    expected = np.asarray(channelizer.channelize_and_demod(
        jnp.asarray(x.real) + 1j * jnp.asarray(x.imag),
        jnp.asarray(proto), C))
    d = np.abs(np.angle(np.exp(1j * (got - expected))))
    # near-zero-|z| elements amplify the kernel's ~1e-6 z error (see
    # test_channelizer_pallas_matches_xla for the weighted bound).
    assert (d > 1e-3).mean() < 1e-3
    np.testing.assert_array_less(d, np.pi / 8)


def test_sharded_path_uses_kernel_with_prefix(monkeypatch):
    """Sharded channelizer with the kernel forced on (interpret): the
    ppermute halo rides the kernel's prefix input; output matches the
    unsharded XLA pipeline exactly (same wrapped-angle grade)."""
    import jax
    from jax.sharding import Mesh
    from basic_dsp_tpu.parallel import channelizer as chz

    calls = {}
    orig = ckp.channelize_demod_pallas

    def spy(xr, xi, taps, C, **kw):
        calls["hit"] = calls.get("hit", 0) + 1
        kw["interpret"] = True
        return orig(xr, xi, taps, C, **kw)

    monkeypatch.setattr(
        "basic_dsp_tpu.kernels.channelizer_pallas.channelize_demod_pallas",
        spy)
    monkeypatch.setattr(chz, "_pallas_chan_eligible",
                        lambda *a, **k: True)

    C = 256
    d = 2
    S = d * 2 * ckp.DEFAULT_TILE_ROWS
    x = _signal(S * C, seed=11)
    proto = (np.hamming(C * 8) / C).astype(np.float32)
    devs = np.array(jax.devices()[:d])
    mesh = Mesh(devs, ("t",))
    got = np.asarray(chz.sharded_channelize_and_demod(
        jnp.asarray(x.real) + 1j * jnp.asarray(x.imag),
        jnp.asarray(proto), C, mesh))
    assert calls.get("hit"), "sharded body did not route to the kernel"

    cfg_off = dataclasses.replace(config.default_config(),
                                  use_pallas_channelizer=False)
    monkeypatch.setattr(config, "_default_config", cfg_off)
    expected = np.asarray(chz.channelize_and_demod(
        jnp.asarray(x.real) + 1j * jnp.asarray(x.imag),
        jnp.asarray(proto), C))
    d_ = np.abs(np.angle(np.exp(1j * (got - expected))))
    assert (d_ > 1e-3).mean() < 1e-3
    np.testing.assert_array_less(d_, np.pi / 8)
