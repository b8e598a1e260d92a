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


def test_prec_reductions_survive_accumulation_growth():
    """Round-3 advisor finding: a fixed per-element guard bounded only the
    element magnitude, so a LONG reduction still overflowed — e.g.
    sum_sq_prec(np.full(1<<20, 2e16)) -> NaN while the f64 oracle is
    ~4.2e38.  The guard now folds the reduction length in."""
    x32 = np.full(1 << 20, 2e16, np.float32)
    want = float(np.sum(np.float64(x32) ** 2))
    got = stats_ops.sum_sq_prec(jnp.asarray(x32))
    assert np.isfinite(got) and abs(got - want) / want < 1e-10
    x2 = np.full(256, 1.5e18, np.float32)
    want2 = float(np.sum(np.float64(x2) ** 2))
    got2 = stats_ops.sum_sq_prec(jnp.asarray(x2))
    assert np.isfinite(got2) and abs(got2 - want2) / want2 < 1e-10
    # plain sums too: 2^20 terms of ~2^120 magnitude
    x3 = np.full(1 << 20, 1e36, np.float32)
    want3 = float(np.sum(np.float64(x3)))
    got3 = stats_ops.sum_prec(jnp.asarray(x3))
    assert np.isfinite(got3) and abs(got3 - want3) / want3 < 1e-10
    d = stats_ops.dot_product_prec(jnp.asarray(x32), jnp.asarray(x32))
    assert np.isfinite(d) and abs(d - want) / want < 1e-10


def test_split_prec_single_program_matches_per_bucket_oracle():
    """statistics_split_prec must match per-bucket f64 oracles with n not
    divisible by length (the batched single-program path zero-pads)."""
    rng = np.random.default_rng(13)
    x = (rng.normal(size=1003) * 10.0 ** rng.integers(-3, 3, 1003)) \
        .astype(np.float32)
    out = stats_ops.statistics_split_prec(jnp.asarray(x), 5, False)
    for k in range(5):
        sub = np.float64(x[k::5])
        assert abs(out[k].sum - sub.sum()) < 1e-9 * max(abs(sub.sum()), 1)
        want_rms = np.sqrt(np.mean(sub ** 2))
        assert abs(out[k].rms - want_rms) < 1e-6 * want_rms
    z = (rng.normal(size=257) + 1j * rng.normal(size=257)) \
        .astype(np.complex64)
    outz = stats_ops.statistics_split_prec(jnp.asarray(z), 3, True)
    for k in range(3):
        sub = np.complex128(z[k::3])
        assert abs(outz[k].sum - sub.sum()) < 1e-6 * max(abs(sub.sum()), 1)


def test_setitem_int_index_single_program():
    """Integer-index writes share ONE compiled program (the index is a
    device argument) — round-3 advisor finding: static=(key,) compiled a
    new program per distinct index."""
    from basic_dsp_tpu import _planar
    v = bd.to_real_time_vec(np.arange(64, dtype=np.float32))
    v[0] = -1.0  # warm the program
    before = _planar._compiled.cache_info().currsize
    for i in (1, 2, 17, 40, 63, -2):
        v[i] = float(100 + i)
    assert _planar._compiled.cache_info().currsize == before
    got = v.to_numpy()
    for i in (1, 2, 17, 40, 63):
        assert got[i] == 100 + i
    assert got[62] == 98.0 and got[0] == -1.0
    # complex scalar writes share a program too
    c = bd.to_complex_time_vec(np.zeros(8, np.complex64))
    c[3] = 1 + 2j
    b2 = _planar._compiled.cache_info().currsize
    c[5] = 4 - 1j
    assert _planar._compiled.cache_info().currsize == b2
    gz = c.to_numpy()
    assert gz[3] == 1 + 2j and gz[5] == 4 - 1j
    with pytest.raises(IndexError):
        v[64] = 0.0


@pytest.mark.requires_x64
def test_strict_f64_native_backend_full_grade():
    """VERDICT r3 #8: under strict_f64 a c128 FFT either computes at true
    f64 grade or raises.  On a native-f64 backend (CPU) it must MATCH
    numpy to 1e-12 (reference contract vector_types/mod.rs:121-123)."""
    import dataclasses

    cfg0 = config.default_config()
    config.set_default_config(dataclasses.replace(cfg0, strict_f64=True))
    try:
        rng = np.random.default_rng(3)
        z = (rng.normal(size=256) + 1j * rng.normal(size=256))
        v = bd.to_complex_time_vec(z.astype(np.complex128))
        got = v.plain_fft().to_numpy()
        want = np.fft.fft(z)
        assert got.dtype == np.complex128
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)
    finally:
        config.set_default_config(cfg0)


@pytest.mark.requires_x64
def test_strict_f64_raises_on_degrading_backend(monkeypatch):
    """On a no-f64 backend the same op must raise loudly, never silently
    compute f32-grade (simulated by forcing the native-f64 probe)."""
    import dataclasses

    from basic_dsp_tpu import _planar

    monkeypatch.setattr(_planar, "_native_f64", False)
    cfg0 = config.default_config()
    config.set_default_config(dataclasses.replace(cfg0, strict_f64=True))
    try:
        with pytest.raises(FloatingPointError, match="strict_f64"):
            _planar.complex_dtype_for(np.float64)
        with pytest.raises(FloatingPointError, match="strict_f64"):
            bd.to_complex_time_vec(np.zeros(64, np.complex128))
    finally:
        config.set_default_config(cfg0)
    # the DEFAULT config keeps the f64 contract via host routing
    # (VERDICT r4 #7: strict_f64="host" is the default) ...
    assert config.DspConfig().strict_f64 == "host"
    assert _planar.complex_dtype_for(np.float64) == jnp.dtype(np.complex128)
    # ... and the opt-in fast mode degrades with the cap
    config.set_default_config(dataclasses.replace(cfg0, strict_f64=False))
    try:
        assert _planar.complex_dtype_for(np.float64) == jnp.dtype(
            np.complex64)
    finally:
        config.set_default_config(cfg0)


@pytest.mark.requires_x64
def test_strict_f64_host_mode_keeps_f64_grade(monkeypatch):
    """strict_f64="host" on a no-f64 backend: f64 flavors keep their
    dtype and compute on the host CPU backend at true f64 grade
    (reference contract vector_types/mod.rs:121-123), instead of raising
    (True) or capping to f32 grade (False)."""
    import dataclasses

    import jax

    from basic_dsp_tpu import _planar

    monkeypatch.setattr(_planar, "_native_f64", False)
    cfg0 = config.default_config()
    config.set_default_config(dataclasses.replace(cfg0, strict_f64="host"))
    try:
        assert _planar.complex_dtype_for(np.float64) == jnp.dtype(
            np.complex128)
        rng = np.random.default_rng(7)
        data = (rng.normal(size=256) + 1j * rng.normal(size=256))
        v = bd.to_complex_time_vec(data)
        out = v.plain_fft().to_numpy()
        ref = np.fft.fft(data)
        assert out.dtype == np.complex128
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-9 *
                                   np.max(np.abs(ref)))
        # the program ran on (and its result lives on) the CPU backend
        dev = list(v._data.re.devices() if _planar.is_planar(v._data)
                   else v._data.devices())[0]
        assert dev.platform == "cpu"
        # f64 REAL flavors stay f64 on the host too
        r = bd.to_real_time_vec(np.linspace(0, 1, 128))
        assert r.to_numpy().dtype == np.float64
        np.testing.assert_allclose(r.scale(3.0).to_numpy(),
                                   np.linspace(0, 1, 128) * 3.0,
                                   rtol=1e-15)
    finally:
        config.set_default_config(cfg0)


@pytest.mark.requires_x64
def test_host_routing_ignores_weak_scalars():
    """Round-4 advisor (medium): a Python complex scalar operand becomes
    weak-typed f64 planes under x64 — it must NOT flag an all-f32 chain
    as f64-family (which would silently route it to the host CPU and
    keep pulling downstream f32 ops there)."""
    import jax.numpy as jnp

    from basic_dsp_tpu import _planar

    scal = _planar.PlanarComplex(jnp.asarray((1 + 2j).real),
                                 jnp.asarray((1 + 2j).imag))
    f32 = jnp.zeros(8, jnp.float32)
    assert not _planar._wants_host((f32, scal))
    # weak 0-d real scalar: same rule
    assert not _planar._wants_host((f32, jnp.asarray(3.0)))
    # a genuine f64 ARRAY operand still routes
    f64 = jnp.zeros(8, jnp.float64)
    assert _planar._wants_host((f32, f64))
    planar64 = _planar.PlanarComplex(f64, f64)
    assert _planar._wants_host((planar64,))
