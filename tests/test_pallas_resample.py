"""Pallas banded resampler (kernels/resample_pallas.py): interpret-mode
parity with the XLA banded-matmul path across resampler geometries.

The kernel's dots run 3-pass bf16 hi/lo (the reference's own f32 FMA
grade, ~1e-6 relative — see the kernel docstring), so tolerances here are
a few e-5 absolute on O(1) data, far below the 5e-3 bf16 grade the
precision contract guards against."""
import jax.numpy as jnp
import numpy as np
import pytest

from basic_dsp_tpu.kernels import resample_pallas as rsp
from basic_dsp_tpu.ops import interp_ops
from basic_dsp_tpu.conv_types import SincFunction


def _case(P, Q, L, n):
    rng = np.random.default_rng(P * 1000 + Q * 10 + L)
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))
    taps, offs = interp_ops.polyphase_taps(SincFunction(), P, Q, 0.0, L,
                                           np.float32)
    c = interp_ops._choose_c(P, Q)
    out_len = n * P // Q
    return x, np.asarray(taps), offs, c, out_len


@pytest.mark.parametrize("P,Q,L", [
    (3, 2, 10),    # bench_all cfg3: x1.5
    (10, 1, 12),   # integer factor (cfg4 family)
    (2, 1, 5),     # small integer factor
    (5, 4, 10),    # fractional with larger Q
])
def test_resample_pallas_matches_xla(P, Q, L):
    n = 4096
    x, taps, offs, c, out_len = _case(P, Q, L, n)
    assert rsp.supported(P, Q, L, c, n) or n < rsp.MIN_N
    expected = np.asarray(interp_ops._interpolatef_direct(
        x, jnp.asarray(taps), P, Q, offs, L, out_len, c))
    got = np.asarray(rsp.resample_direct_pallas(
        x, taps, P, Q, tuple(offs), L, out_len, c, interpret=True))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=5e-5, rtol=5e-5)


def test_resample_pallas_circular_wrap():
    """Outputs near both edges depend on the circular extension; pin them
    against a brute-force f64 oracle of the defining formula."""
    P, Q, L, n = 3, 2, 10, 2048
    x, taps, offs, c, out_len = _case(P, Q, L, n)
    got = np.asarray(rsp.resample_direct_pallas(
        x, taps, P, Q, tuple(offs), L, out_len, c, interpret=True))
    xs = np.asarray(x, dtype=np.float64)
    tp = np.asarray(taps, dtype=np.float64)
    for i in list(range(0, 2 * P)) + list(range(out_len - 2 * P, out_len)):
        p = i % P
        k = i // P
        idx = (k * Q + offs[p] + np.arange(2 * L + 1) - L) % n
        want = float(xs[idx] @ tp[p])
        assert abs(got[i] - want) < 5e-5, (i, got[i], want)


def test_supported_gate():
    # span not a lane multiple (the 44.1->48k audio geometry): XLA path.
    c_audio = interp_ops._choose_c(160, 147)
    assert not rsp.supported(160, 147, 10, c_audio, 1 << 20)
    # cfg3 geometry at bench size: kernel path.
    assert rsp.supported(3, 2, 10, 128, 1 << 20)
    # short signals stay on XLA.
    assert not rsp.supported(3, 2, 10, 128, 4096)


def test_dispatch_uses_kernel_when_forced(monkeypatch):
    """With the config gate forced on and supported() satisfied, the
    dispatch in _interpolatef_direct routes to the kernel (interpret mode
    via a monkeypatched entry so this runs on CPU)."""
    from basic_dsp_tpu import config

    calls = {}
    orig = rsp.resample_direct_pallas

    def spy(x, taps, P, Q, offs, L, out_len, c, interpret=False):
        calls["hit"] = True
        return orig(x, taps, P, Q, offs, L, out_len, c, interpret=True)

    import dataclasses

    monkeypatch.setattr(rsp, "resample_direct_pallas", spy)
    monkeypatch.setattr(rsp, "runtime_ok", lambda: True)
    monkeypatch.setattr(rsp, "MIN_N", 1024)
    cfg = dataclasses.replace(config.default_config(),
                              use_pallas_resample=True)
    monkeypatch.setattr(config, "_default_config", cfg)

    n = 8192
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))
    out = interp_ops.interpolatef(x, SincFunction(), 1.5, 0.0, 10, 1.0)
    assert calls.get("hit"), "dispatch did not route to the Pallas kernel"
    ref = np.asarray(interp_ops.interpolatef(
        x.astype(jnp.float64), SincFunction(), 1.5, 0.0, 10, 1.0))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_rowblock_kernel_matches_generic(interpret_only=True):
    """The large-Q row-block kernel (padded + raw) vs the generic banded
    oracle at 160/147 and the reverse 147/160 (interpret mode)."""
    import jax.numpy as jnp

    from basic_dsp_tpu.kernels import resample_pallas as rp
    from basic_dsp_tpu.ops import interp_ops
    from basic_dsp_tpu.conv_types import SincFunction

    rng = np.random.default_rng(9)
    for P, Q in ((160, 147), (147, 160)):
        L = 10
        n = 1 << 16
        x = jnp.asarray(rng.normal(size=n).astype(np.float32))
        taps, offs = interp_ops.polyphase_taps(SincFunction(), P, Q, 0.0,
                                               L, jnp.float32)
        out_len = int(round(n * P / Q)); out_len += out_len % 2
        want = np.asarray(interp_ops._interpolatef_rowblock(
            x, taps, P, Q, offs, L, out_len))
        for padded in (True, False):
            got = np.asarray(rp.resample_rowblock_pallas(
                x, taps, P, Q, tuple(offs), L, out_len, padded=padded,
                interpret=True))
            scale = np.abs(want).max()
            assert np.abs(got - want).max() < 2e-5 * scale, (P, Q, padded)
