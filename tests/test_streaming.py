"""Streaming FIR: chunked processing equals the whole-buffer linear
convolution; chains are differentiable (TPU-native bonus beyond the
reference)."""
import jax
import jax.numpy as jnp
import numpy as np

import basic_dsp_tpu as bd
from basic_dsp_tpu import streaming
from basic_dsp_tpu.ops import conv_ops
from tools import assert_vector_eq, create_complex_data


def test_streaming_matches_whole_buffer():
    n, m, chunk = 4096, 33, 256
    x = create_complex_data(1, n, dtype=np.complex64)
    h = create_complex_data(2, m, dtype=np.complex64)
    fir = streaming.StreamingFir(jnp.asarray(h))
    out = np.asarray(streaming.stream_chunks(fir, jnp.asarray(x), chunk))
    # Whole-buffer linear convolution, causal part (lin[0:n]).
    lin = np.convolve(x, np.asarray(h))
    assert_vector_eq(out, lin[:n], tol=1e-3)


def test_streaming_state_carries():
    m = 9
    h = np.zeros(m, dtype=np.complex64)
    h[-1] = 1.0  # pure delay of m-1 samples
    fir = streaming.StreamingFir(jnp.asarray(h))
    state = fir.init_state(jnp.complex64)
    c1 = jnp.asarray(np.arange(16, dtype=np.complex64))
    c2 = jnp.asarray(np.arange(16, 32, dtype=np.complex64))
    o1, state = fir.process(c1, state)
    o2, state = fir.process(c2, state)
    got = np.concatenate([np.asarray(o1), np.asarray(o2)]).real
    expected = np.concatenate([np.zeros(m - 1), np.arange(32 - (m - 1))])
    assert_vector_eq(got, expected, tol=1e-4)


def test_dsp_chain_is_differentiable():
    """jax.grad flows through vector ops (pytree + pure functions) — a
    capability the reference cannot offer."""
    data = np.linspace(0.1, 1.0, 64)

    def loss(scale):
        v = bd.to_real_time_vec(jnp.asarray(data))
        # Reductions that return Python scalars (.sum()) are host-side by
        # design; differentiable code reduces on the array.
        return jnp.sum(v.scale(scale).sin().array)

    g = jax.grad(loss)(1.0)
    expected = float(np.sum(data * np.cos(data)))
    assert abs(float(g) - expected) < 1e-6
