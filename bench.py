"""Benchmark: Msamples/s on the flagship FIR+FFT chain (BASELINE.md).

Config #2-style workload: 4M-sample complex64 signal, 128-tap raised-cosine
FIR via blocked overlap-save, Hamming window, shifted FFT magnitude.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured throughput / HBM-roofline estimate (the
reference publishes no absolute numbers — BASELINE.md), so 1.0 ==
speed-of-light on this chip's memory bandwidth.

Backend notes: complex arrays crossing the host<->device boundary are not
supported on the axon TPU tunnel, so the signal enters as a real (re, im)
pair and becomes complex inside jit.  The timing loop runs *inside* jit
(lax.fori_loop) so per-call tunnel latency doesn't pollute the measurement.
"""
import json
import time

import numpy as np


ITERS = 50


def main():
    import jax
    import jax.numpy as jnp

    from basic_dsp_tpu.ops import conv_ops, fft_ops
    from basic_dsp_tpu.windows import HammingWindow
    from basic_dsp_tpu.conv_types import RaisedCosineFunction

    n = 1 << 22  # 4M samples
    m = 128
    rng = np.random.default_rng(0)
    x_re = jnp.asarray(rng.normal(size=n).astype(np.float32))
    x_im = jnp.asarray(rng.normal(size=n).astype(np.float32))
    rc = RaisedCosineFunction(0.35)
    t = ((np.arange(m) - m // 2) * 0.25).astype(np.float32)
    taps_re = jnp.asarray(np.asarray(rc.calc(t)))
    window = HammingWindow().sample(n, dtype=jnp.float32)
    fft_len = conv_ops.pick_fft_len(m)

    @jax.jit
    def chain_iters(x_re, x_im, taps_re, window):
        x = x_re + 1j * x_im
        taps = taps_re.astype(jnp.complex64)

        def body(_, carry):
            # Dispatcher routes m=128 to the MXU Toeplitz-matmul path.
            filtered = conv_ops.convolve_signal(carry, taps, True)
            spectrum = fft_ops.fft_shifted(filtered
                                           * window.astype(filtered.dtype))
            # Feed the result back so XLA cannot hoist the chain out of the
            # loop; the spectrum feeds in via its first magnitude.
            return filtered / (jnp.abs(spectrum[0]) + 1.0)

        out = jax.lax.fori_loop(0, ITERS, body, x)
        return jnp.abs(out[0])

    # Host fetch forces completion (block_until_ready does not reliably
    # block through the axon tunnel).
    float(chain_iters(x_re, x_im, taps_re, window))  # compile + warm

    start = time.perf_counter()
    float(chain_iters(x_re, x_im, taps_re, window))
    elapsed = (time.perf_counter() - start) / ITERS
    msamples_per_s = n / elapsed / 1e6

    # HBM roofline estimate for this chain (complex64 = 8 bytes/sample):
    # overlap-save reads x and writes filtered with ~4/3 block expansion on
    # each FFT/IFFT round trip (~4x), window+big-FFT ~2x, |.| ~1.5x
    # => ~7.5 signal-sized HBM round trips at 8B/sample.
    bytes_per_sample = 8 * 7.5
    hbm_gbps = _device_hbm_gbps(jax.devices()[0])
    roofline_msps = hbm_gbps * 1e9 / bytes_per_sample / 1e6
    vs = msamples_per_s / roofline_msps

    print(json.dumps({
        "metric": "fir_fft_chain_throughput",
        "value": round(msamples_per_s, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(vs, 4),
    }))


def _device_hbm_gbps(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    table = {
        "tpu v5 lite": 819.0,   # v5e
        "tpu v5e": 819.0,
        "tpu v5": 1228.0,       # v5p
        "tpu v4": 1228.0,
        "tpu v6 lite": 1640.0,  # v6e / trillium
        "tpu v6e": 1640.0,
    }
    for k, v in table.items():
        if k in kind:
            return v
    return 819.0  # conservative default


if __name__ == "__main__":
    main()
