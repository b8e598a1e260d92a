"""Sharded (multi-device) paths must agree with single-device results —
the mesh-parameterized analog of the reference's single-core vs multi-core
`parameterized_vector_test` (tests/tools/mod.rs:225-321).  Runs on the
8-device virtual CPU mesh from conftest."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import basic_dsp_tpu as bd
from basic_dsp_tpu.ops import conv_ops
from basic_dsp_tpu.parallel import (channelizer, sharded_convolve_signal,
                                    sharded_statistics, sharded_sum,
                                    shard_time_axis)
from tools import (assert_vector_eq, create_complex_data, create_data,
                   scaled_tol)


# d in {2, 4, 8} plus hierarchical (host, chip) shapes: the reference's
# single-vs-multi-core sweep analog (tests/tools/mod.rs:225-321 runs every
# property at 1 and N cores); every equality property below runs at each
# mesh size AND on 2-D multi-host-shaped meshes (VERDICT r3 #4).
@pytest.fixture(scope="module", params=[2, 4, 8, (2, 2), (2, 4), (4, 2)],
                ids=lambda d: (f"{d}dev" if isinstance(d, int)
                               else f"{d[0]}x{d[1]}mesh"))
def mesh(request):
    if isinstance(request.param, tuple):
        return bd.make_mesh(shape=request.param)
    return bd.make_mesh(request.param)


def test_mesh_size_matches_param(mesh):
    assert mesh.devices.size in (2, 4, 8)


def test_hierarchical_halo_shift_orders():
    """shift_from_left/right on a (2, 4) mesh must equal the flattened
    host-major ring shift (ICI ppermute + host-boundary DCN handoff)."""
    from basic_dsp_tpu.parallel import collectives
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = bd.make_mesh(shape=(2, 4))
    x = jnp.arange(64.0)
    xs = jax.device_put(
        x, NamedSharding(mesh, P(("host", "chip"))))
    for fn, shift in ((collectives.shift_from_left, 8),
                      (collectives.shift_from_right, -8)):
        for wrap in (True, False):
            out = jax.jit(jax.shard_map(
                lambda xl, fn=fn, wrap=wrap: fn(xl, ("host", "chip"),
                                                wrap=wrap),
                mesh=mesh, in_specs=P(("host", "chip")),
                out_specs=P(("host", "chip"))))(xs)
            want = np.roll(np.arange(64.0), shift)
            if not wrap:
                if shift > 0:
                    want[:shift] = 0
                else:
                    want[shift:] = 0
            assert np.array_equal(np.asarray(out), want), (fn, wrap)


def test_flat_index_is_host_major():
    from basic_dsp_tpu.parallel import collectives
    from jax.sharding import PartitionSpec as P

    mesh = bd.make_mesh(shape=(2, 4))
    out = jax.jit(jax.shard_map(
        lambda xl: xl * 0 + collectives.flat_index(("host", "chip")),
        mesh=mesh, in_specs=P(("host", "chip")),
        out_specs=P(("host", "chip"))))(jnp.zeros(8))
    assert np.array_equal(np.asarray(out), np.arange(8.0))


@pytest.mark.parametrize("n,m", [(1024, 7), (4096, 63), (8192, 202)])
def test_sharded_convolve_matches_single_device(mesh, n, m):
    x = create_complex_data(n, n, dtype=np.complex64)
    h = create_complex_data(m, m, dtype=np.complex64)
    expected = conv_ops.convolve_signal_fft(jnp.asarray(x), jnp.asarray(h),
                                            True)
    xs = shard_time_axis(jnp.asarray(x), mesh)
    out = sharded_convolve_signal(xs, jnp.asarray(h), mesh)
    # tolerance is relative to the output scale (f32 accumulation)
    scale = float(np.abs(np.asarray(expected)).max())
    assert_vector_eq(np.asarray(out), np.asarray(expected),
                     tol=1e-5 * max(scale, 1.0))


def test_sharded_convolve_real(mesh):
    x = create_data(1, 2048)
    h = create_data(2, 31)
    expected = conv_ops.convolve_signal_fft(jnp.asarray(x), jnp.asarray(h),
                                            False)
    out = sharded_convolve_signal(shard_time_axis(jnp.asarray(x), mesh),
                                  jnp.asarray(h), mesh)
    assert_vector_eq(np.asarray(out), np.asarray(expected), tol=1e-8)


def test_sharded_sum_and_statistics(mesh):
    data = create_data(3, 4096)
    x = shard_time_axis(jnp.asarray(data), mesh)
    assert abs(sharded_sum(x, mesh).item() - data.sum()) < scaled_tol(1e-6)
    stats = sharded_statistics(x, mesh)
    ref = bd.to_real_time_vec(data).statistics()
    assert abs(stats.sum - ref.sum) < scaled_tol(1e-6)
    assert abs(stats.rms - ref.rms) < scaled_tol(1e-9)
    assert stats.min == ref.min and stats.min_index == ref.min_index
    assert stats.max == ref.max and stats.max_index == ref.max_index
    assert stats.count == ref.count


def test_sharded_statistics_complex(mesh):
    data = create_complex_data(4, 2048)
    x = shard_time_axis(jnp.asarray(data), mesh)
    stats = sharded_statistics(x, mesh)
    ref = bd.to_complex_time_vec(data).statistics()
    assert abs(stats.sum - ref.sum) < scaled_tol(1e-6)
    assert stats.min == ref.min and stats.max == ref.max


def test_channelizer_matches_direct_filterbank():
    """Polyphase channelizer == per-channel downconvert + filter + decimate
    (the textbook identity), checked against a direct evaluation."""
    C, T = 8, 4
    n = 512
    rng = np.random.default_rng(0)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    proto = np.hamming(C * T) / C
    out = np.asarray(channelizer.polyphase_channelizer(
        jnp.asarray(x), jnp.asarray(proto), C))
    # Direct: y_k[m] = sum_j h[j] x[mC - j] e^{2pi i k (mC - j)/C}
    h = proto
    for k in [0, 1, C // 2, C - 1]:
        direct = np.zeros(n // C, dtype=complex)
        for m in range(n // C):
            acc = 0.0
            for j in range(len(h)):
                t = m * C - j
                if 0 <= t < n:
                    acc += h[j] * x[t] * np.exp(2j * np.pi * k * t / C)
            direct[m] = acc
        assert_vector_eq(out[k], direct, tol=1e-4, msg=f"channel {k}")


def test_sharded_channelizer_matches_single(mesh):
    C = 8
    n = 4096
    x = create_complex_data(1, n, dtype=np.complex64)
    proto = (np.hamming(C * 8) / C).astype(np.float32)
    single = np.asarray(channelizer.channelize_and_demod(
        jnp.asarray(x), jnp.asarray(proto), C))
    sharded = np.asarray(channelizer.sharded_channelize_and_demod(
        jnp.asarray(x), jnp.asarray(proto), C, mesh))
    assert_vector_eq(sharded, single, tol=1e-4)


def test_fm_demod_recovers_tone():
    n = 1024
    f = 0.01
    phase = 2 * np.pi * f * np.arange(n)
    x = np.exp(1j * phase)
    demod = np.asarray(channelizer.fm_demodulate(jnp.asarray(x)))
    assert np.allclose(demod[1:], 2 * np.pi * f, atol=1e-5)


def test_par_constructors(mesh):
    data = create_data(5, 1024)
    v = bd.to_real_time_vec_par(data, mesh)
    assert v.points() == 1024
    # Sharded data still computes correctly through the normal API.
    assert abs(v.sum() - data.sum()) < 1e-6
    out = v.scale(2.0)
    assert_vector_eq(np.asarray(out.array), data * 2.0, tol=1e-12)


def test_overlap_discard_method(mesh):
    x = create_complex_data(1, 4096)
    h = create_complex_data(2, 33)
    a = bd.to_complex_time_vec(x)
    b = bd.to_complex_time_vec(h)
    out = a.overlap_discard(b)
    expected = a.convolve_signal(b)
    assert_vector_eq(np.asarray(out.array), np.asarray(expected.array),
                     tol=1e-6)


def test_four_step_fft_matches_jnp():
    from basic_dsp_tpu.parallel import sharded_fft as sf
    for n in [4096, 1 << 14, 900]:
        x = create_complex_data(n, n)
        got = np.asarray(sf.four_step_fft(jnp.asarray(x)))
        exp = np.fft.fft(x)
        scale = np.abs(exp).max()
        assert np.max(np.abs(got - exp)) / scale < scaled_tol(1e-10), n
        gi = np.asarray(sf.four_step_ifft(jnp.asarray(x)))
        ei = np.fft.ifft(x) * n
        assert np.max(np.abs(gi - ei)) / np.abs(ei).max() < scaled_tol(1e-10), n


def test_sharded_fft_matches_single(mesh):
    from basic_dsp_tpu.parallel import sharded_fft as sf
    n = 1 << 14
    x = create_complex_data(n, n)
    xs = shard_time_axis(jnp.asarray(x), mesh)
    got = np.asarray(sf.sharded_fft(xs, mesh))
    exp = np.fft.fft(x)
    assert np.max(np.abs(got - exp)) / np.abs(exp).max() < scaled_tol(1e-10)


@pytest.mark.parametrize("factor,cplx", [
    (1.5, True), (1.5, False), (2.0, True), (10.0, False), (1.25, True),
])
def test_sharded_interpolatef_matches_single_device(mesh, factor, cplx):
    """sharded_interpolatef (halo ppermute + banded matmul per shard) must
    reproduce the single-device interpolatef exactly (same matmul core,
    same circular wrap via the ring)."""
    from basic_dsp_tpu.ops import interp_ops
    from basic_dsp_tpu.parallel import sharded_interpolatef
    n = 8192  # /8 devices = 1024 per shard, divisible by 128*Q for Q<=4
    if cplx:
        x = create_complex_data(3, n, dtype=np.complex64)
    else:
        x = create_data(4, n).astype(np.float32)
    xj = jnp.asarray(x)
    expected = interp_ops.interpolatef(xj, bd.SincFunction(), factor, 0.25,
                                       10, 1.0)
    out = sharded_interpolatef(shard_time_axis(xj, mesh), bd.SincFunction(),
                               factor, 0.25, 10, mesh)
    got = np.asarray(out)
    want = np.asarray(expected)
    assert got.shape == want.shape
    scale = float(np.abs(want).max())
    assert_vector_eq(got, want, tol=1e-5 * max(scale, 1.0))


def test_sharded_interpolatef_rejects_bad_geometry(mesh):
    from basic_dsp_tpu.parallel import sharded_interpolatef
    x = jnp.asarray(create_data(1, 1000).astype(np.float32))
    with pytest.raises(ValueError):
        sharded_interpolatef(x, bd.SincFunction(), 1.5, 0.0, 10, mesh)
    x2 = jnp.asarray(create_data(1, 8192).astype(np.float32))
    with pytest.raises(ValueError):  # irrational factor
        sharded_interpolatef(x2, bd.SincFunction(), 1.4142135, 0.0, 10, mesh)


@pytest.mark.parametrize("cplx", [True, False])
def test_sharded_convolve_mat_matches_single(mesh, cplx):
    """Channel-parallel MIMO convolution (parallel.mimo) == the
    single-device matrix._convolve_mat frequency-domain einsum
    (time_freq/mod.rs:365-453)."""
    from basic_dsp_tpu.parallel import sharded_convolve_mat
    from basic_dsp_tpu import matrix as mat

    rng = np.random.default_rng(21)
    C, n, m = 16, 1024, 9
    if cplx:
        x = (rng.normal(size=(C, n)) + 1j * rng.normal(size=(C, n))
             ).astype(np.complex64)
        imp = (rng.normal(size=(C, C, m)) + 1j * rng.normal(size=(C, C, m))
               ).astype(np.complex64)
    else:
        x = rng.normal(size=(C, n)).astype(np.float32)
        imp = rng.normal(size=(C, C, m)).astype(np.float32)
    expected = np.asarray(mat._convolve_mat(jnp.asarray(x), jnp.asarray(imp),
                                            cplx))
    xs = jax.device_put(jnp.asarray(x), jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(tuple(mesh.axis_names), None)))
    got = np.asarray(sharded_convolve_mat(xs, imp, mesh))
    scale = float(np.abs(expected).max())
    assert_vector_eq(got, expected, tol=1e-5 * max(scale, 1.0))


def test_sharded_convolve_mat_rejects_bad_geometry(mesh):
    from basic_dsp_tpu.parallel import sharded_convolve_mat
    rng = np.random.default_rng(22)
    d = mesh.devices.size
    C = d + 1  # not divisible
    x = jnp.asarray(rng.normal(size=(C, 256)).astype(np.float32))
    imp = rng.normal(size=(C, C, 5)).astype(np.float32)
    with pytest.raises(ValueError, match="mesh size"):
        sharded_convolve_mat(x, imp, mesh)


def test_streaming_fir_with_sharded_chunks(mesh):
    """Streaming under SPMD: StreamingFir.process accepts time-sharded
    chunks (GSPMD propagates the sharding through the jitted step) and
    the chunk-chained result equals the single-shot linear convolution —
    the serving pattern for dryrun stage 6."""
    from basic_dsp_tpu.streaming import StreamingFir

    rng = np.random.default_rng(23)
    n, m, chunk = 4096, 33, 1024
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    taps = (rng.normal(size=m) + 1j * rng.normal(size=m)
            ).astype(np.complex64)
    fir = StreamingFir(jnp.asarray(taps))
    st = fir.init_state()
    outs = []
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(tuple(mesh.axis_names)))
    for i in range(0, n, chunk):
        xc = jax.device_put(jnp.asarray(x[i:i + chunk]), sharding)
        y, st = fir.process(xc, st)
        outs.append(np.asarray(y))
    got = np.concatenate(outs)
    expected = np.convolve(x, taps)[: n]
    scale = float(np.abs(expected).max())
    assert_vector_eq(got, expected, tol=1e-4 * max(scale, 1.0))


@pytest.mark.parametrize("C", [256, 1024])
def test_channelize_mxu_idft_matches_fft_path(C):
    """For C = n1*128 channelize_and_demod takes the MXU factored-IDFT
    planar path (profile_chan2: the XLA batched ifft was the dominant
    stage); it must match the generic jnp.fft.ifft formulation."""
    from basic_dsp_tpu.parallel import channelizer as ch

    rng = np.random.default_rng(31)
    n = C * 32
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    proto = jnp.asarray((np.hamming(C * 4) / C).astype(np.float32))
    # force the MXU path on the CPU test backend (auto-gate is iff-TPU)
    import dataclasses
    from basic_dsp_tpu import config as _cfg
    saved = _cfg.default_config()
    _cfg.set_default_config(dataclasses.replace(
        saved, use_mxu_channel_dft=True))
    try:
        assert ch._idft_eligible(C)
        got = np.asarray(ch.channelize_and_demod(jnp.asarray(x), proto, C))
        # reference formulation: FIR rows + NUMPY ifft channel mixing
        # (an independent oracle — _channelize_rows itself now routes
        # through the MXU IDFT when eligible)
        taps = np.asarray(jax.device_get(ch._merged_tap_rows(proto, C)))
        t = taps.shape[0] - 1
        X = x.reshape(-1, C)
        S = X.shape[0]
        ext = np.concatenate([np.zeros((t, C), X.dtype), X], axis=0)
        u = np.zeros((S, C), np.complex64)
        for p_ in range(t + 1):
            u += taps[p_] * ext[t - p_: t - p_ + S]
        y = (C * np.fft.ifft(u, axis=1)).astype(np.complex64)
        prev = np.concatenate([y[:1], y[:-1]], axis=0)
        want = np.angle(y * np.conj(prev)).T
    finally:
        _cfg.set_default_config(saved)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_idft_rows_planar_matches_ifft():
    """_idft_rows_planar == C * ifft along the minor axis, re-interleaved."""
    from basic_dsp_tpu.parallel import channelizer as ch

    rng = np.random.default_rng(32)
    S, C = 64, 512
    n1 = C // 128
    u = (rng.normal(size=(S, C)) + 1j * rng.normal(size=(S, C))
         ).astype(np.complex64)
    yr, yi = ch._idft_rows_planar(jnp.asarray(u.real), jnp.asarray(u.imag),
                                  C)
    got = (np.asarray(yr) + 1j * np.asarray(yi))  # [s, c1, c2]
    want = C * np.fft.ifft(u, axis=1).astype(np.complex64)
    # y[s, c1 + n1*c2] == got[s, c1, c2]
    want3 = want.reshape(S, 128, n1).transpose(0, 2, 1)  # [s, c1, c2]
    np.testing.assert_allclose(got, want3, rtol=0, atol=2e-3 * np.abs(
        want).max() / 100)


def test_sharded_fft_planar_matches_complex(mesh):
    """sharded_fft_planar (planar (re, im) program boundary — required on
    backends where complex jit I/O is unreliable) == sharded_fft."""
    from basic_dsp_tpu.parallel import sharded_fft as sf

    n = 1 << 14
    x = create_complex_data(n, n)
    xs = shard_time_axis(jnp.asarray(x), mesh)
    want = np.asarray(sf.sharded_fft(xs, mesh))
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(tuple(mesh.axis_names)))
    xr = jax.device_put(jnp.asarray(x.real.astype(np.float32)), sharding)
    xi = jax.device_put(jnp.asarray(x.imag.astype(np.float32)), sharding)
    gr, gi = sf.sharded_fft_planar(xr, xi, mesh)
    got = np.asarray(gr) + 1j * np.asarray(gi)
    scale = np.abs(want).max()
    assert np.max(np.abs(got - want)) / scale < 1e-5


def test_sharded_fft_real_input(mesh):
    """A REAL input must produce the full complex spectrum: the twiddle
    is built at the complex result dtype (an astype to the input dtype
    silently truncated the imaginary part — round-3 review finding)."""
    from basic_dsp_tpu.parallel import sharded_fft as sf

    n = 1 << 12
    x = create_data(41, n).astype(np.float32)
    xs = shard_time_axis(jnp.asarray(x), mesh)
    got = np.asarray(sf.sharded_fft(xs, mesh))
    want = np.fft.fft(x)
    assert np.max(np.abs(got - want)) / np.abs(want).max() < 1e-5
