"""Block-size autotuning — the TPU analog of the reference's one-time
multicore calibration (multicore_support/threading.rs:39-193, which times
sweeps and fits thresholds; ``print_calibration`` threading.rs:282-289).

Here the tunable is the blocked-convolution FFT length.  ``calibrate()``
times the candidates on the actual device for a representative workload and
installs the winner in the default config; ``print_calibration()`` reports
what was measured.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from . import config as _config

_results: Dict[Tuple[int, int], List[Tuple[int, float]]] = {}
_chosen: Optional[int] = None


def calibrate(n: int = 1 << 20, m: int = 128,
              candidates: Tuple[int, ...] = (512, 1024, 2048, 4096, 8192),
              iters: int = 5) -> int:
    """Times the blocked conv at each candidate block length and installs
    the fastest in the default config.  One-time cost is a few seconds
    (compile-dominated), mirroring the reference's 200-500 ms calibration
    contract (threading.rs:237) in spirit."""
    import jax
    import jax.numpy as jnp

    from .ops import conv_ops

    global _chosen
    rng = np.random.default_rng(0)
    x_re = jnp.asarray(rng.normal(size=n).astype(np.float32))
    x_im = jnp.asarray(rng.normal(size=n).astype(np.float32))
    h_re = jnp.asarray(rng.normal(size=m).astype(np.float32))

    timings = []
    for fl in candidates:
        if fl < 2 * m:
            continue

        @jax.jit
        def f(x_re, x_im, h_re, fl=fl):
            x = x_re + 1j * x_im
            h = h_re.astype(jnp.complex64)

            def step(_, carry):
                y = conv_ops.overlap_save(carry, h, True, fl)
                return y / (jnp.abs(y[0]) + 1.0)

            return jnp.abs(jax.lax.fori_loop(0, iters, step, x)[0])

        float(f(x_re, x_im, h_re))  # compile + warm
        t0 = time.perf_counter()
        float(f(x_re, x_im, h_re))
        timings.append((fl, (time.perf_counter() - t0) / iters))

    _results[(n, m)] = timings
    best = min(timings, key=lambda t: t[1])[0]
    _chosen = best
    cfg = _config.default_config()
    _config.set_default_config(
        _config.DspConfig(
            overlap_save_min_len=cfg.overlap_save_min_len,
            overlap_save_min_imp_len=cfg.overlap_save_min_imp_len,
            overlap_save_len_ratio=cfg.overlap_save_len_ratio,
            direct_conv_max_imp_len=cfg.direct_conv_max_imp_len,
            direct_conv_min_len=cfg.direct_conv_min_len,
            fft_block_len=best,
        ))
    return best


def print_calibration() -> str:
    """Debug report of measured timings (reference print_calibration)."""
    lines = []
    if not _results:
        lines.append("not calibrated (call basic_dsp_tpu.autotune.calibrate)")
    for (n, m), timings in _results.items():
        lines.append(f"workload n={n} m={m}:")
        for fl, dt in timings:
            lines.append(f"  fft_len={fl}: {dt * 1e3:.3f} ms/iter "
                         f"({n / dt / 1e6:.0f} Msamples/s)")
    if _chosen:
        lines.append(f"chosen fft_block_len: {_chosen}")
    report = "\n".join(lines)
    print(report)
    return report
