"""Scaling-efficiency harness (BASELINE.md target: >=85% samples/s
efficiency 1 chip -> N) over the three sharded workloads: overlap-save
convolution, the polyphase channelizer, and the distributed four-step FFT.

Records both sweeps:

* **strong scaling** — fixed total problem, mesh sizes 1..N;
* **weak scaling** — fixed per-device work, total grows with the mesh
  (the correctness-side proxy on the virtual CPU mesh, where per-device
  compute time is meaningful but ICI is simulated shared memory).

On this environment it runs the 8-device virtual CPU mesh (functional
proxy); on a real pod slice the same script measures ICI scaling.  Prints
one JSON line per point; ``--out FILE`` also writes the whole record
(SCALING_r02.json is the committed artifact).
"""
import argparse
import json
import time

import numpy as np


def _mk_signal(n, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.normal(size=n) + 1j * rng.normal(size=n))
                       .astype(np.complex64))


def _timeit(fn, iters=5):
    fn()  # warm (compile)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="run on an N-device virtual CPU mesh")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from basic_dsp_tpu.parallel import (channelizer, sharded_fft,
                                        sharded_convolve_signal,
                                        shard_time_axis)

    devices = jax.devices()
    max_d = len(devices)
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= max_d]
    record = {"device_kind": getattr(devices[0], "device_kind",
                                     devices[0].platform),
              "n_devices": max_d, "workloads": {}}

    C = 64
    proto_t = 8

    def conv_run(x, h, mesh):
        return sharded_convolve_signal(shard_time_axis(x, mesh), h, mesh)

    def chan_run(x, proto, mesh):
        return channelizer.sharded_channelize_and_demod(x, proto, C, mesh)

    def fft_run(x, mesh):
        return sharded_fft.sharded_fft(x, mesh)

    def interp_run(x, mesh):
        from basic_dsp_tpu.conv_types import SincFunction
        from basic_dsp_tpu.parallel import sharded_interpolatef
        return sharded_interpolatef(shard_time_axis(x, mesh),
                                    SincFunction(), 1.5, 0.0, 10, mesh)

    h = _mk_signal(63, seed=1)
    proto = jnp.asarray(np.hamming(C * proto_t).astype(np.float32) / C)

    workloads = {
        "sharded_conv": lambda n, mesh: (
            lambda x=_mk_signal(n): (lambda: conv_run(x, h, mesh))),
        "channelizer": lambda n, mesh: (
            lambda x=_mk_signal(n): (lambda: chan_run(x, proto, mesh))),
        "sharded_fft": lambda n, mesh: (
            lambda x=_mk_signal(n): (lambda: fft_run(x, mesh))),
        "sharded_interpolatef": lambda n, mesh: (
            lambda x=_mk_signal(n): (lambda: interp_run(x, mesh))),
    }

    N_STRONG = 1 << 20
    N_PER_DEV = 1 << 17

    for name, make in workloads.items():
        entry = {"strong": [], "weak": []}
        for d in sizes:
            mesh = Mesh(np.array(devices[:d]), ("dsp",))
            # strong: fixed total
            dt = _timeit(make(N_STRONG, mesh)(), iters=args.iters)
            msps = N_STRONG / dt / 1e6
            entry["strong"].append({"devices": d, "ms": round(dt * 1e3, 3),
                                    "msamples_per_s": round(msps, 1)})
            print(json.dumps({"metric": f"{name}_strong_{d}dev",
                              "value": round(msps, 1),
                              "unit": "Msamples/s"}), flush=True)
            # weak: fixed per-device
            n_w = N_PER_DEV * d
            dt_w = _timeit(make(n_w, mesh)(), iters=args.iters)
            entry["weak"].append({"devices": d, "n": n_w,
                                  "ms": round(dt_w * 1e3, 3),
                                  "msamples_per_s": round(n_w / dt_w / 1e6,
                                                          1)})
            print(json.dumps({"metric": f"{name}_weak_{d}dev",
                              "value": round(dt_w * 1e3, 3), "unit": "ms"}),
                  flush=True)
        base = entry["strong"][0]["msamples_per_s"]
        top = entry["strong"][-1]
        entry["strong_efficiency"] = round(
            top["msamples_per_s"] / (base * top["devices"]), 3)
        wt0 = entry["weak"][0]["ms"]
        entry["weak_efficiency"] = round(wt0 / entry["weak"][-1]["ms"], 3)
        record["workloads"][name] = entry
        print(json.dumps({"metric": f"{name}_strong_efficiency",
                          "value": entry["strong_efficiency"],
                          "unit": "ratio"}), flush=True)
        print(json.dumps({"metric": f"{name}_weak_efficiency",
                          "value": entry["weak_efficiency"],
                          "unit": "ratio"}), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"# wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
