"""Size-sweep benchmark tables — port of reference examples/bench_tables.rs
(1e3 → 1e8 sweep, CSV output for plotting).

Usage: python bench_tables.py [max_exp] [out.csv]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(max_exp=6, out_path="bench_tables.csv"):
    import jax
    import jax.numpy as jnp

    from basic_dsp_tpu.ops import conv_ops, fft_ops

    rng = np.random.default_rng(0)
    rows = ["op, size, msamples_per_s"]
    ops = {
        "scale": lambda x, h: x * 2.0,
        "sin": lambda x, h: jnp.sin(x.real).astype(x.dtype),
        "fft": lambda x, h: jnp.fft.fft(x),
        "convolve_signal": lambda x, h: conv_ops.convolve_signal(x, h, True),
        "fft_shifted": lambda x, h: fft_ops.fft_shifted(x),
    }
    for exp in range(3, max_exp + 1):
        n = 10 ** exp
        x_re = jnp.asarray(rng.normal(size=n).astype(np.float32))
        x_im = jnp.asarray(rng.normal(size=n).astype(np.float32))
        h_re = jnp.asarray(rng.normal(size=32).astype(np.float32))
        for name, body in ops.items():
            iters = max(3, min(20, 10 ** (7 - exp)))

            @jax.jit
            def f(x_re, x_im, h_re, body=body, iters=iters):
                x = x_re + 1j * x_im
                h = h_re.astype(jnp.complex64)

                def step(_, carry):
                    y = body(carry, h)
                    return (y / (jnp.abs(y[0]) + 1.0)).astype(x.dtype)

                return jnp.abs(jax.lax.fori_loop(0, iters, step, x)[0])

            float(f(x_re, x_im, h_re))  # compile
            t0 = time.perf_counter()
            float(f(x_re, x_im, h_re))
            dt = (time.perf_counter() - t0) / iters
            rows.append(f"{name}, {n}, {n / dt / 1e6:.1f}")
            print(rows[-1], flush=True)
    with open(out_path, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    out = sys.argv[2] if len(sys.argv) > 2 else "bench_tables.csv"
    main(max_exp, out)
