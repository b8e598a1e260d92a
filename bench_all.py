"""Full benchmark suite over the BASELINE.md configs (one JSON line each).

``bench.py`` remains the single headline metric for the driver; this script
reports the whole config table:

1. 1M-sample real sine -> Hamming window + FFT magnitude
2. 4M-sample complex raised-cosine FIR (overlap path)
3. fractional resampling of 44.1 kHz audio (interpolatef x1.5)
4. modulation chain: PRBS symbols -> RC pulse shaping -> passband
5. 1024-channel polyphase channelizer + FM demod
"""
import json
import time

import numpy as np


def timed(fn, *args, iters=10):
    """Per-iteration SLOPE between an ``iters`` and a ``3*iters`` in-jit
    loop (bench.py discipline): per-call fixed costs — the ~25 ms tunnel
    round trip, dispatch, scalar fetch — cancel exactly.

    The loop carry folds EVERY output element back into the next
    iteration's input.  A partial read (e.g. ``out.ravel()[:1]``) is NOT
    safe: XLA slice-propagates it back through matmul-only bodies and
    dead-codes most of the work (measured 0.005 ms for a banded matmul
    that honestly costs ~0.04 ms).  A scalar ``sum(abs(out))`` is honest
    but stalls the axon compiler at some shapes, so the carry is an
    ARRAY of the input's shape: |out| padded to a multiple of n and
    summed down the short axis (the abs blocks the algebraic rewrite
    sum(A@M) -> sums-of-factors)."""
    import jax
    import jax.numpy as jnp

    n = args[0].shape[-1]

    def fold(out):
        flat = jnp.abs(out.ravel()).astype(jnp.float32)
        rows = -(-flat.shape[0] // n)
        flat = jnp.pad(flat, (0, rows * n - flat.shape[0]))
        return jnp.sum(flat.reshape(rows, n), axis=0) * jnp.float32(1e-20)

    def make(k):
        @jax.jit
        def looped(*a):
            def step(_, carry):
                return fold(fn(*a, carry))

            return jax.lax.fori_loop(0, k, step,
                                     jnp.zeros((n,), jnp.float32))

        return looped

    r1, r3 = make(iters), make(3 * iters)
    for _ in range(2):
        float(jnp.sum(r1(*args)))
        float(jnp.sum(r3(*args)))

    def med(r):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(r(*args)))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    slope = (med(r3) - med(r1)) / (2 * iters)
    if slope <= 0:  # tunnel noise: conservative upper bound
        slope = med(r3) / (3 * iters)
    return slope


def main():
    import jax
    import jax.numpy as jnp

    from basic_dsp_tpu.ops import conv_ops, fft_ops, interp_ops
    from basic_dsp_tpu.parallel import channelizer
    from basic_dsp_tpu.windows import HammingWindow
    from basic_dsp_tpu.conv_types import RaisedCosineFunction, SincFunction

    rng = np.random.default_rng(0)
    results = []

    # Config 1: 1M real sine -> windowed FFT magnitude.
    n1 = 1 << 20
    sine = jnp.asarray(np.sin(2 * np.pi * 0.01 * np.arange(n1))
                       .astype(np.float32))
    w1 = HammingWindow().sample(n1, dtype=jnp.float32)

    def cfg1(x, w, carry):
        from basic_dsp_tpu import pipelines
        return pipelines._shifted_mag((x + carry).astype(jnp.complex64) * w)

    dt = timed(cfg1, sine, w1, iters=50)
    results.append(("windowed_fft_magnitude_1m", n1 / dt / 1e6))

    # Config 2: 4M complex RC FIR.
    n2 = 1 << 22
    x_re = jnp.asarray(rng.normal(size=n2).astype(np.float32))
    x_im = jnp.asarray(rng.normal(size=n2).astype(np.float32))
    rc = RaisedCosineFunction(0.35)
    t = ((np.arange(128) - 64) * 0.25).astype(np.float32)
    taps = jnp.asarray(np.asarray(rc.calc(t)))

    def cfg2(xr, xi, h, carry):
        x = (xr + carry) + 1j * xi
        return conv_ops.convolve_signal(x, h.astype(jnp.complex64), True)

    dt = timed(cfg2, x_re, x_im, taps, iters=50)
    results.append(("rc_fir_4m", n2 / dt / 1e6))

    # Config 3: fractional resampling x1.5 of 1M audio samples
    # (slow_down_music), complex stereo-as-IQ.
    n3 = 1 << 20
    a_re = jnp.asarray(rng.normal(size=n3).astype(np.float32))
    a_im = jnp.asarray(rng.normal(size=n3).astype(np.float32))

    def cfg3(xr, xi, carry):
        x = (xr + carry) + 1j * xi
        return interp_ops.interpolatef(x, SincFunction(), 1.5, 0.0, 10, 1.0)

    dt = timed(cfg3, a_re, a_im, iters=20)
    results.append(("interpolatef_1_5x_1m", n3 / dt / 1e6))

    # Config 4: modulation chain (pulse shaping x10 + passband).
    n4 = 1 << 17  # symbols
    s_re = jnp.asarray(rng.choice([-0.5, 0.5], n4).astype(np.float32))
    s_im = jnp.asarray(rng.choice([-0.5, 0.5], n4).astype(np.float32))

    def cfg4(sr, si, carry):
        iq = (sr + carry) + 1j * si
        shaped = interp_ops.interpolatef(iq, RaisedCosineFunction(0.35),
                                         10.0, 0.0, 10, 1.0)
        return jnp.real(shaped)

    dt = timed(cfg4, s_re, s_im, iters=20)
    results.append(("modulation_chain_131k_symbols", 10 * n4 / dt / 1e6))

    # Config 5: 1024-channel channelizer + FM demod over 4M samples.
    n5 = 1 << 22
    C = 1024
    c_re = jnp.asarray(rng.normal(size=n5).astype(np.float32))
    c_im = jnp.asarray(rng.normal(size=n5).astype(np.float32))
    proto = jnp.asarray((np.hamming(C * 8) / C).astype(np.float32))

    def cfg5(xr, xi, p, carry):
        x = (xr + carry) + 1j * xi
        return channelizer.channelize_and_demod(x, p, C)

    dt = timed(cfg5, c_re, c_im, proto, iters=30)
    results.append(("channelizer_1024ch_4m", n5 / dt / 1e6))

    # Optional: VMEM-resident Pallas overlap-save vs the XLA blocked path
    # (BDSP_BENCH_PALLAS=1; not on axon — Mosaic hangs there, CLAUDE.md).
    import os
    if os.environ.get("BDSP_BENCH_PALLAS") not in (None, "", "0"):
        from basic_dsp_tpu.kernels import overlap_save_pallas as osp
        h_long = jnp.asarray(rng.normal(size=384).astype(np.float32))

        def cfg_os_xla(xr, xi, h, carry):
            x = (xr + carry) + 1j * xi
            return conv_ops.overlap_save(x, h.astype(jnp.complex64), True,
                                         4096)

        def cfg_os_pl(xr, xi, h, carry):
            x = (xr + carry) + 1j * xi
            return osp.overlap_save_pallas(x, h, True, 4096)

        dt = timed(cfg_os_xla, x_re, x_im, h_long, iters=20)
        results.append(("overlap_save_xla_384tap_4m", n2 / dt / 1e6))
        dt = timed(cfg_os_pl, x_re, x_im, h_long, iters=20)
        results.append(("overlap_save_pallas_384tap_4m", n2 / dt / 1e6))

    for name, msps in results:
        print(json.dumps({"metric": name, "value": round(msps, 2),
                          "unit": "Msamples/s"}))


if __name__ == "__main__":
    main()
