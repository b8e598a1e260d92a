"""Double-float (*_prec) accuracy contracts and slow-path/backend warnings.

The reference accumulates f32 data in compensated f64
(precise_stats.rs:120-124, 622-660); our device-side double-float
(TwoSum/TwoProd trees, stats_ops) must match numpy f64 oracles to the same
grade WITHOUT shipping the array to host."""
import warnings

import jax.numpy as jnp
import numpy as np
import pytest

import basic_dsp_tpu as bd
from basic_dsp_tpu import config
from basic_dsp_tpu.ops import interp_ops, stats_ops


def test_df_sum_adversarial_cancellation():
    # Large + tiny: naive f32 sum loses the tail entirely.
    x = np.zeros(4096, np.float32)
    x[0] = 1e8
    x[1:] = 1e-3
    v = bd.to_real_time_vec(x)
    exact = x.astype(np.float64).sum()
    naive = np.float32(x.sum(dtype=np.float32))
    assert abs(v.sum_prec() - exact) < 1e-4 * abs(exact) * 2 ** -24
    assert abs(v.sum_prec() - exact) < abs(naive - exact) or naive == exact


def test_df_dot_large_n():
    rng = np.random.default_rng(11)
    a = rng.normal(size=1 << 18).astype(np.float32)
    b = rng.normal(size=1 << 18).astype(np.float32)
    exact = float(np.dot(a.astype(np.float64), b.astype(np.float64)))
    va, vb = bd.to_real_time_vec(a), bd.to_real_time_vec(b)
    assert abs(va.dot_product_prec(vb) - exact) < 1e-6 * abs(exact) + 1e-8


def test_df_complex_sum_sq():
    rng = np.random.default_rng(12)
    c = (rng.normal(size=65536)
         + 1j * rng.normal(size=65536)).astype(np.complex64)
    v = bd.to_complex_time_vec(c)
    exact = (c.astype(np.complex128) ** 2).sum()
    assert abs(v.sum_sq_prec() - exact) < 1e-6 * abs(exact) + 1e-8


def test_interpolatef_gather_warning():
    interp_ops._gather_warned[0] = False
    x = np.zeros(1 << 17, np.float32)
    from basic_dsp_tpu.conv_types import SincFunction
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        interp_ops.interpolatef(x, SincFunction(), float(np.pi) / 2,
                                0.0, 5, 1.0)
    assert any("gather path" in str(w.message) for w in rec)
    # small inputs stay silent
    interp_ops._gather_warned[0] = False
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        interp_ops.interpolatef(np.zeros(256, np.float32), SincFunction(),
                                float(np.pi) / 2, 0.0, 5, 1.0)
    assert not any("gather path" in str(w.message) for w in rec)


def test_f64_warning_only_on_tpu():
    config._f64_warned[0] = False
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        config.warn_if_no_native_f64()
    import jax
    on_tpu = jax.devices()[0].platform == "tpu"
    assert any("no native f64" in str(w.message) for w in rec) == on_tpu


def test_prec_reductions_survive_large_magnitudes():
    """|x| > ~1.8e19 overflows a naive f32 square to inf; the guarded
    power-of-two prescale (round-3 review finding) keeps sum_sq_prec /
    dot_product_prec / statistics_prec exact vs the f64 oracle."""
    x32 = np.array([3e20, 1.0, -2.5e19], np.float32)
    x = jnp.asarray(x32)
    want = float(np.sum(np.float64(x32) ** 2))
    got = stats_ops.sum_sq_prec(x)
    assert np.isfinite(got) and abs(got - want) / want < 1e-12
    got_d = stats_ops.dot_product_prec(x, x)
    assert abs(got_d - want) / want < 1e-12
    st = stats_ops.statistics_prec(x, False)
    assert np.isfinite(st.rms)
    z64 = np.array([3e20 + 2e20j, 1.0 + 0j], np.complex64)
    sq = stats_ops.sum_sq_prec(jnp.asarray(z64))
    want_z = np.sum(np.complex128(z64) ** 2)
    assert np.isfinite(sq.real) and abs(sq - want_z) / abs(want_z) < 1e-10
