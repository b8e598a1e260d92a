"""Per-stage on-chip profile of the flagship FIR+FFT chain (VERDICT r1 #1).

Times each stage of the 4M-sample chain as an in-jit fori_loop (per-call
tunnel latency ~25 ms would otherwise swamp everything), with the output fed
back into the next iteration so XLA cannot hoist the body.  Also measures
candidate big-FFT implementations (four-step / six-step / MXU-DFT-stage-1)
against `jnp.fft.fft`, and the achievable HBM copy bandwidth that anchors
the roofline denominator.

Each stage runs in its OWN process (a failed device computation can poison
the jax client on the axon tunnel — CLAUDE.md):

    python profile_chain.py --list              # stage names
    python profile_chain.py --stage NAME        # run one stage
    for s in $(python profile_chain.py --list); do
        timeout 600 python -u profile_chain.py --stage $s; done

Prints one line per stage: name, median ms/iter, effective GB/s for the
stage's minimum traffic model, and Msamples/s for chain stages.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

N = 1 << 22  # 4M
M = 128      # FIR taps


def dft_matrix(n: int):
    """(re, im) float32 planes — complex arrays cannot cross the host-
    device boundary on axon; combine inside the trace."""
    import jax.numpy as jnp
    k = np.arange(n)
    m = np.exp(-2j * np.pi * np.outer(k, k) / n).astype(np.complex64)
    return (jnp.asarray(m.real.copy()), jnp.asarray(m.imag.copy()))


def build_stages(iters, reps):
    import jax
    try:  # persistent compile cache: keeps re-runs cheap on the tunnel
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    import jax.numpy as jnp
    from basic_dsp_tpu.ops import conv_ops, fft_ops
    from basic_dsp_tpu.windows import HammingWindow
    from basic_dsp_tpu.conv_types import RaisedCosineFunction

    rng = np.random.default_rng(0)
    x_re = jnp.asarray(rng.normal(size=N).astype(np.float32))
    x_im = jnp.asarray(rng.normal(size=N).astype(np.float32))
    rc = RaisedCosineFunction(0.35)
    t = ((np.arange(M) - M // 2) * 0.25).astype(np.float32)
    taps_np = np.asarray(rc.calc(t)).astype(np.float32)
    taps_np /= taps_np.sum()  # unit DC gain: keeps feedback loops stable
    window = HammingWindow().sample(N, dtype=jnp.float32)

    # ---------------- candidate big-FFT kernels -------------------------
    def twiddle(n1, n2, dtype=jnp.float32):
        k1 = jax.lax.broadcasted_iota(dtype, (n1, n2), 0)
        j2 = jax.lax.broadcasted_iota(dtype, (n1, n2), 1)
        ang = (-2.0 * np.pi / (n1 * n2)) * (k1 * j2)
        return jax.lax.complex(jnp.cos(ang), jnp.sin(ang))

    def fourstep(x, n1, n2):
        """X[k1 + n1*k2] = FFT_j2( FFT_j1(A)[k1,j2] * w^(k1 j2) )[k1,k2].

        Returns D with X = D.T.reshape(-1)."""
        A = x.reshape(n1, n2)
        B = jnp.fft.fft(A, axis=0)
        C = B * twiddle(n1, n2)
        return jnp.fft.fft(C, axis=1)

    def fourstep_full(x, n1, n2):
        return fourstep(x, n1, n2).T.reshape(-1)

    def fourstep_mm(x, n1, n2, F):
        """Stage 1 as an MXU DFT matmul (n1 small), twiddle fused into the
        matmul epilogue.  F = (re, im) planes, combined in-trace."""
        A = x.reshape(n1, n2)
        Fc = jax.lax.complex(F[0], F[1])
        B = jnp.matmul(Fc, A, precision="highest")
        C = B * twiddle(n1, n2)
        return jnp.fft.fft(C, axis=1)

    def shifted_mag(D, n2):
        """abs(fftshift(D.T.flat)) computed f32-side: roll k2 then transpose."""
        S = jnp.abs(D)
        return jnp.roll(S, -(n2 // 2), axis=1).T.reshape(-1)

    taps_c = jnp.asarray(taps_np)  # real taps; cast in-trace
    window_f = window
    fl = conv_ops.pick_fft_len(M)
    n1_sq = 1 << ((N - 1).bit_length() // 2)           # ~sqrt(N)

    # ---------------- timing harness ------------------------------------
    # Two-point measurement: time the in-jit loop at iters and 3*iters and
    # take the slope — this cancels the fixed per-call cost (the ~25 ms
    # axon tunnel latency would otherwise dominate sub-ms stages).
    def timed(name, fn, traffic_mb=None, warm=2):
        """fn(x_complex) -> next x_complex."""
        def make(its):
            @jax.jit
            def run(xr, xi):
                x = xr + 1j * xi

                def body(_, carry):
                    return fn(carry)

                out = jax.lax.fori_loop(0, its, body, x)
                return jnp.abs(out.reshape(-1)[0])

            return run

        r1, r2 = make(iters), make(3 * iters)

        def med(r):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(r(x_re, x_im))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[len(ts) // 2], (max(ts) - min(ts)) / min(ts)

        for _ in range(warm):
            float(r1(x_re, x_im))
            float(r2(x_re, x_im))
        (t1, _), (t2, sp2) = med(r1), med(r2)
        ms = (t2 - t1) / (2 * iters) * 1e3
        gbps = (traffic_mb / 1e3) / (ms / 1e3) if traffic_mb else float("nan")
        msps = N / (ms / 1e3) / 1e6
        print(f"{name:28s} {ms:8.3f} ms  {gbps:7.1f} GB/s(model) "
              f"{msps:9.1f} Msamp/s  (rep spread {sp2 * 100:.0f}%)",
              flush=True)
        return ms

    def fb(fn):
        # Scalar feedback: scale ~0.5/iter (underflow-free over 30 iters)
        # while still depending on fn's output so it is not dead code.
        def g(x):
            y = fn(x)
            return x * (0.5 + jnp.abs(y.reshape(-1)[0]) * 1e-30)
        return g

    def tcv(x, prec):
        return conv_ops._toeplitz_conv_impl(x, taps_c.astype(x.dtype),
                                            True, prec)

    stages = {}

    def stage(name, fn, traffic_mb=None):
        stages[name] = lambda: timed(name, fn, traffic_mb=traffic_mb)

    # correctness spot check (64k) vs jnp.fft
    def check():
        @jax.jit
        def _check(xr, xi):
            xc = xr + 1j * xi
            ref = jnp.abs(jnp.fft.fftshift(jnp.fft.fft(xc)))
            a = shifted_mag(fourstep(xc, 256, 256), 256)
            b = shifted_mag(fourstep_mm(xc, 128, 512, dft_matrix(128)), 512)
            return (jnp.max(jnp.abs(a - ref)) / jnp.max(ref),
                    jnp.max(jnp.abs(b - ref)) / jnp.max(ref))
        ea, eb = _check(x_re[:1 << 16], x_im[:1 << 16])
        print(f"# fourstep rel err {float(ea):.2e}  mm-variant "
              f"{float(eb):.2e}", flush=True)
    stages["check"] = check

    stage("copy", lambda x: x * (1.0 + 1e-7), traffic_mb=64)
    stage("conv_toeplitz_highest", lambda x: tcv(x, "highest"),
          traffic_mb=128)
    stage("conv_toeplitz_high", lambda x: tcv(x, "high"), traffic_mb=128)
    stage("conv_os4096",
          lambda x: conv_ops.overlap_save(x, taps_c.astype(jnp.complex64),
                                          True, fl),
          traffic_mb=64 * 4)
    stage("fft_jnp", fb(lambda x: jnp.fft.fft(x)), traffic_mb=64 * 3)
    for n1 in sorted({n1_sq // 2, n1_sq, n1_sq * 2}):
        stage(f"fft_fourstep_{n1}",
              fb(lambda x, n1=n1: fourstep(x, n1, N // n1)),
              traffic_mb=64 * 3)
    stage(f"fft_fourstepT_{n1_sq}",
          fb(lambda x: fourstep_full(x, n1_sq, N // n1_sq)),
          traffic_mb=64 * 4)
    stage("fft_mm128",
          fb(lambda x: fourstep_mm(x, 128, N // 128, dft_matrix(128))),
          traffic_mb=64 * 3)
    stage("fft_mm256",
          fb(lambda x: fourstep_mm(x, 256, N // 256, dft_matrix(256))),
          traffic_mb=64 * 3)
    stage("fft_batched_1024",
          fb(lambda x: jnp.fft.fft(x.reshape(1024, N // 1024), axis=1)),
          traffic_mb=64 * 2)
    stage("fft_batched_128",
          fb(lambda x: jnp.fft.fft(x.reshape(128, N // 128), axis=1)),
          traffic_mb=64 * 2)
    stage("window_mul", lambda x: x * window_f, traffic_mb=64 + 16)
    stage("fftshift_roll", lambda x: jnp.roll(x, N // 2), traffic_mb=128)

    def tail_cur(x):
        sp = fft_ops.fft_shifted(x * window_f)
        return x * (0.5 + jnp.abs(sp.reshape(-1)[0]) * 1e-30)
    stage("tail_current", tail_cur, traffic_mb=64 * 5)

    def tail_new(x, n1, n2, F):
        D = fourstep_mm(x * window_f, n1, n2, F)
        mag = shifted_mag(D, n2)
        return x * (0.5 + mag[0] * 1e-30)
    stage("tail_mm128",
          lambda x: tail_new(x, 128, N // 128, dft_matrix(128)),
          traffic_mb=64 * 4)

    def chain_cur(x):
        filtered = conv_ops.convolve_signal(x, taps_c.astype(jnp.complex64),
                                            True)
        spectrum = fft_ops.fft_shifted(filtered * window_f)
        return filtered * (0.5 + jnp.abs(spectrum.reshape(-1)[0]) * 1e-30)
    stage("CHAIN_current", chain_cur)

    def chain_new(x, n1, n2, F):
        filtered = tcv(x, "highest")
        D = fourstep_mm(filtered * window_f, n1, n2, F)
        mag = shifted_mag(D, n2)
        return filtered * (0.5 + mag[0] * 1e-30)
    stage("CHAIN_mm128",
          lambda x: chain_new(x, 128, N // 128, dft_matrix(128)))
    stage("CHAIN_mm256",
          lambda x: chain_new(x, 256, N // 256, dft_matrix(256)))

    def chain_new4(x, n1, n2):
        filtered = tcv(x, "highest")
        D = fourstep(filtered * window_f, n1, n2)
        mag = shifted_mag(D, n2)
        return filtered * (0.5 + mag[0] * 1e-30)
    stage(f"CHAIN_fourstep_{n1_sq}",
          lambda x: chain_new4(x, n1_sq, N // n1_sq))

    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--stage", type=str, default=None)
    args = ap.parse_args()

    if args.list:
        # Build the name list without touching the device.
        names = ["check", "copy", "conv_toeplitz_highest",
                 "conv_toeplitz_high", "conv_os4096", "fft_jnp"]
        n1_sq = 1 << ((N - 1).bit_length() // 2)
        names += [f"fft_fourstep_{n1}"
                  for n1 in sorted({n1_sq // 2, n1_sq, n1_sq * 2})]
        names += [f"fft_fourstepT_{n1_sq}", "fft_mm128", "fft_mm256",
                  "fft_batched_1024", "fft_batched_128", "window_mul",
                  "fftshift_roll", "tail_current", "tail_mm128",
                  "CHAIN_current", "CHAIN_mm128", "CHAIN_mm256",
                  f"CHAIN_fourstep_{n1_sq}"]
        print("\n".join(names))
        return

    stages = build_stages(args.iters, args.reps)
    if args.stage:
        names = [args.stage]
    else:
        names = list(stages)
    for name in names:
        try:
            stages[name]()
        except Exception as e:  # noqa: BLE001 — keep profiling other stages
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}",
                  flush=True)
            if args.stage:
                sys.exit(1)


if __name__ == "__main__":
    main()
