"""Scaling-efficiency harness: sharded convolution throughput at mesh
sizes 1..N (BASELINE.md target: >=85% samples/s efficiency 1 chip -> N).

On this environment it exercises the virtual CPU mesh (functional, not a
hardware measurement); on a real pod slice it measures ICI scaling.
Prints one JSON line per mesh size plus the efficiency summary.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from basic_dsp_tpu.parallel import sharded_convolve_signal, shard_time_axis

    devices = jax.devices()
    max_d = len(devices)
    n = 1 << 20
    m = 63
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.normal(size=n) + 1j * rng.normal(size=n))
                    .astype(np.complex64))
    h = jnp.asarray((rng.normal(size=m) + 1j * rng.normal(size=m))
                    .astype(np.complex64))

    results = {}
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= max_d]
    for d in sizes:
        mesh = Mesh(np.array(devices[:d]), ("dsp",))
        xs = shard_time_axis(x, mesh)
        out = sharded_convolve_signal(xs, h, mesh)
        np.asarray(out)  # warm + force
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = sharded_convolve_signal(xs, h, mesh)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / iters
        msps = n / dt / 1e6
        results[d] = msps
        print(json.dumps({"metric": f"sharded_conv_{d}dev",
                          "value": round(msps, 1), "unit": "Msamples/s"}))

    if len(sizes) > 1:
        base = results[sizes[0]]
        top = sizes[-1]
        eff = results[top] / (base * top)
        print(json.dumps({"metric": f"scaling_efficiency_1_to_{top}",
                          "value": round(eff, 3), "unit": "ratio"}))


if __name__ == "__main__":
    main()
