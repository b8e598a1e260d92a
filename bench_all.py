"""Full benchmark suite over the BASELINE.md configs (one JSON line each).

``bench.py`` remains the single headline metric for the driver; this script
reports the whole config table, each with a dual-resource floor model
(VERDICT r2 #8) so every entry carries a ``vs_baseline``:

1. 1M-sample real sine -> Hamming window + FFT magnitude
2. 4M-sample complex raised-cosine FIR (Toeplitz MXU path)
3. fractional resampling of 44.1 kHz audio (interpolatef x1.5)
4. modulation chain: PRBS symbols -> RC pulse shaping -> passband (planar)
5. 1024-channel polyphase channelizer + FM demod

``--json FILE`` writes the whole table as a driver-readable artifact
(BENCH_ALL_r{N}.json).

Floor model per config: ``floor_ms = max(bytes / 819 GB/s,
mxu_flops / 30.8 TFLOPS)`` — the measured v5e HBM bandwidth and the
MEASURED f32 precision="highest" MXU peak (probe_mxu_peak.py: 30.8
TFLOPS at 6-pass; nominal bf16 is 197).  Bytes and FLOPs are per
iteration of the shipped formulation, derived in the per-config comments
below; ``vs_baseline = floor_ms / measured_ms``.
"""
import argparse
import json
import os
import time

import numpy as np

HBM_GBPS = 819.0          # v5e
MXU_TFLOPS_HIGHEST = 30.8  # measured, probe_mxu_peak.py
MXU_TFLOPS_BF16 = 138.0    # measured 1-pass bf16 peak, probe_mxu_peak.py
VPU_TOPS = 3.52            # measured f32 elementwise rate, probe_vpu_peak.py
                           # (0.28 ps/elem-op; atan2 = ~40 elem-op equiv)


def tunnel_probe(iters: int = 100) -> float:
    """Per-capture device-health probe (VERDICT r3 #3): slope-time a
    DEVICE-THROUGHPUT-bound loop (2 MB x 8 chained elementwise ops per
    iteration, ~1.2 us/iter at the measured VPU rate).  Identical code
    swings 2x with device/tunnel state minutes apart (STATUS r3: cfg1
    measured 6.5 and 11.4 GS/s within 25 min); recording this number
    next to every capture lets the merge protocol keep captures
    comparable and refuse degraded sessions.  (The original (8, 128)
    body was dispatch-noise-dominated — slopes came out 0.01-2.7 us for
    the same healthy device.)  Returns per-iteration microseconds."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((512, 1024), jnp.float32)

    def make(k):
        @jax.jit
        def looped(v):
            def step(_, c):
                for _ in range(8):
                    c = jnp.abs(c) * jnp.float32(0.999) + jnp.float32(1e-6)
                return c
            return jax.lax.fori_loop(0, k, step, v)
        return looped

    r1, r3 = make(iters), make(3 * iters)
    for _ in range(2):
        float(jnp.sum(r1(x))); float(jnp.sum(r3(x)))

    def med(r):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(jnp.sum(r(x)))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    return max((med(r3) - med(r1)) / (2 * iters), 1e-9) * 1e6


def merge_captures(path: str, session: dict, probe_us: float) -> dict:
    """Merge this session's capture into an on-disk artifact (multi-session
    protocol, VERDICT r3 #3).  Per config the artifact accumulates a
    ``captures`` list ({measured_ms, probe_us, ts}); the headline fields
    are the BEST (minimum) measured_ms over all captures, with
    median/spread over the full list and each capture's device-health
    probe recorded for transparency.  Rationale: the slope timing with a
    full-array carry cannot measure FASTER than the device executes, so
    the minimum across sessions is the honest capability number, while
    slower captures reflect degraded device/tunnel states (identical
    code swings 2x between sessions — STATUS r3).  An earlier gating
    variant that dropped captures whose probe exceeded 1.3x the best
    probe backfired: per-config state drifts WITHIN a session, so a
    healthy-probe session could disqualify a better measurement taken
    minutes earlier under a nominally worse probe."""
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    by_metric = {c["metric"]: c for c in merged.get("configs", [])}
    now = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    out_cfgs = []
    for cfg in session["configs"]:
        prev = by_metric.pop(cfg["metric"], {})
        caps = list(prev.get("captures", []))
        caps.append({"measured_ms": cfg["measured_ms"],
                     "probe_us": round(probe_us, 3), "ts": now,
                     "slope_spread": cfg.get("slope_spread")})

        def _ok(c):
            # Reject measurement artifacts from the headline: unstable
            # per-pair slopes (state drifted mid-capture) and anything
            # unphysically past the roofline floor (constant-weight
            # matmul slack legitimately reaches ~1.3-1.4x, never 1.5x).
            sp = c.get("slope_spread")
            if sp is not None and sp > 1.5:
                return False
            if cfg["floor_ms"] / c["measured_ms"] > cfg.get(
                    "max_vs_floor", 1.5):
                return False
            # HBM bytes are a hard wall: constant folding can skip
            # modeled matmul work, never modeled traffic.  A capture
            # below bytes_ms is a drift artifact (a drifting tunnel
            # fabricated cfg4 at 0.33x bytes_ms and cfg5 at 0.91x).
            bytes_ms = cfg.get("model", {}).get("bytes_ms")
            if bytes_ms and c["measured_ms"] < 0.98 * bytes_ms:
                return False
            return True

        pool = [c for c in caps if _ok(c)]
        # Round-4 advisor: if EVERY capture fails the sanity checks
        # (exactly the drifting-tunnel fabrication scenario), do NOT
        # re-admit them — the config is marked unhealthy (vs_baseline 0)
        # until a sane capture lands, instead of a fabricated headline.
        unhealthy = not pool
        if unhealthy:
            pool = caps
        best = min(pool, key=lambda c: c["measured_ms"])
        ms_sorted = sorted(c["measured_ms"] for c in pool)
        med_ms = ms_sorted[len(ms_sorted) // 2]
        dt = best["measured_ms"] * 1e-3
        samples = cfg["value"] * 1e6 * (cfg["measured_ms"] * 1e-3)
        entry = dict(cfg)
        entry.update({
            "measured_ms": best["measured_ms"],
            "value": round(samples / dt / 1e6, 2),
            "vs_baseline": 0.0 if unhealthy else
            round(cfg["floor_ms"] / best["measured_ms"], 4),
            "unhealthy": unhealthy,
            "median_ms": round(med_ms, 4),
            "spread": round(max(ms_sorted) / min(ms_sorted), 3),
            "n_captures": len(caps),
            "captures": caps,
        })
        out_cfgs.append(entry)
    out_cfgs.extend(by_metric.values())  # configs absent this session
    merged.update({k: session[k] for k in
                   ("device", "mxu_tflops_highest", "hbm_gbps")})
    merged["configs"] = out_cfgs
    return merged


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

    def one(r):
        t0 = time.perf_counter()
        float(jnp.sum(r(*args)))
        return time.perf_counter() - t0

    # Median of per-PAIR slopes, r1/r3 measured BACK TO BACK inside each
    # pair: measuring all r1 runs before all r3 runs let a mid-capture
    # tunnel-state improvement fabricate an impossibly low slope (a
    # session recorded cfg4 at 3.05x its roofline FLOOR that way).
    # Within a pair the drift is bounded by one run's duration; the
    # median across pairs then rejects a single drift-contaminated pair.
    slopes = []
    for _ in range(3):
        t1 = one(r1)
        t3 = one(r3)
        s_ = (t3 - t1) / (2 * iters)
        if s_ > 0:
            slopes.append(s_)
    if slopes:
        med_s = sorted(slopes)[len(slopes) // 2]
        timed.last_spread = (max(slopes) / min(slopes)
                            if len(slopes) > 1 else 1.0)
        return med_s
    timed.last_spread = float("inf")
    return one(r3) / (3 * iters)  # conservative upper bound


timed.last_spread = 1.0


def floor_ms(bytes_per_iter: float, flops_per_iter: float,
             mxu_tflops: float = MXU_TFLOPS_HIGHEST,
             vpu_ops_per_iter: float = 0.0):
    """Multi-resource per-iteration floor (ms) and which resource binds.

    ``flops_per_iter`` is MXU work at ``mxu_tflops`` (default: the
    measured precision="highest" 6-pass peak; kernels whose dots run
    3-pass bf16 hi/lo pass the measured bf16 peak instead).
    ``vpu_ops_per_iter`` is elementwise VPU work at the measured
    VPU_TOPS rate — the binding resource for fused elementwise-heavy
    kernels (e.g. the channelizer megakernel)."""
    bt = bytes_per_iter / (HBM_GBPS * 1e9) * 1e3
    ft = flops_per_iter / (mxu_tflops * 1e12) * 1e3
    vt = vpu_ops_per_iter / (VPU_TOPS * 1e12) * 1e3
    fl = max(bt, ft, vt)
    bound = "hbm" if fl == bt else ("compute" if fl == ft else "vpu")
    return fl, bound, bt, ft


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", type=str, default=None,
                    help="also write the table to FILE (driver artifact)")
    ap.add_argument("--merge", type=str, default=None,
                    help="merge this session's capture into FILE "
                         "(multi-session best-of protocol with per-capture "
                         "tunnel-health probes; see merge_captures)")
    args_cli = ap.parse_args()

    # Bounded-liveness probe in a SUBPROCESS (same rationale as
    # bench.py._device_reachable): a down tunnel hangs even trivial ops
    # forever, and a hung capture session blocks the whole harness.
    import subprocess
    import sys as _sys
    try:
        r = subprocess.run(
            [_sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "assert float(jnp.ones((128,)).sum()) == 128.0"],
            timeout=180, capture_output=True)
        reachable = r.returncode == 0
    except subprocess.TimeoutExpired:
        reachable = False
    if not reachable:
        print("# device unreachable (axon tunnel down?) — refusing to "
              "hang; re-run when the tunnel recovers")
        return

    import jax
    import jax.numpy as jnp

    probe_us = tunnel_probe()
    print(f"# tunnel probe: {probe_us:.2f} us/iter")

    from basic_dsp_tpu.ops import conv_ops, interp_ops
    from basic_dsp_tpu.parallel import channelizer
    from basic_dsp_tpu import pipelines
    from basic_dsp_tpu.windows import HammingWindow
    from basic_dsp_tpu.conv_types import RaisedCosineFunction, SincFunction

    rng = np.random.default_rng(0)
    results = []

    def record(name, samples, dt, bpi, fpi, note,
               mxu_tflops=MXU_TFLOPS_HIGHEST, vpu_opi=0.0,
               max_vs_floor=1.5):
        fl, bound, bt, ft = floor_ms(bpi, fpi, mxu_tflops, vpu_opi)
        spread = round(getattr(timed, "last_spread", 1.0), 3)
        results.append({
            "metric": name,
            "value": round(samples / dt / 1e6, 2),
            "unit": "Msamples/s",
            "vs_baseline": round(fl / (dt * 1e3), 4),
            "measured_ms": round(dt * 1e3, 4),
            "slope_spread": spread,
            "floor_ms": round(fl, 4),
            "bound": bound,
            # Per-config capture-sanity ceiling (merge _ok): how far past
            # the modeled floor a REAL capture can sit.  Const-weight
            # configs reach 1.3-1.4x (XLA presplits the constant operand
            # past the measured square peak); configs whose weights are
            # RUNTIME arguments have no such slack and anything past
            # ~1.05x implies more-than-peak MXU throughput, i.e. a
            # drifting-tunnel fabrication (a probe_us=56 session
            # fabricated cfg2 at 1.23x on 2026-08-21).
            "max_vs_floor": max_vs_floor,
            "model": {"bytes_mb": round(bpi / 1e6, 1),
                      "mxu_gflops": round(fpi / 1e9, 3),
                      "bytes_ms": round(bt, 4), "flops_ms": round(ft, 4),
                      "note": note},
        })

    # ---- Config 1: 1M real sine -> windowed FFT magnitude. ----
    # Path: REAL input straight into the four-step (no complex cast —
    # the interleave round trip is not canceled by XLA), Karatsuba
    # stage-1 pruned to ONE dot by the zero imag plane (2*128 F/sample)
    # + kernel sublane DFT-64 (3*2*64) + lane DFT-128 (3*2*128) = 1408
    # F/sample -> 0.046 ms.  Bytes: carry r4 + x r4 (window fused) +
    # stage-1 out w8 + kernel r8 + mag w4 + transpose r4 w4 = 36
    # B/sample (round 5: the big twiddle streams FACTORED — two
    # outer-product planes, ~0 B/sample instead of r8;
    # fourstep._dif_twiddle_factored) -> 0.044 ms -> compute/HBM mixed.
    n1 = 1 << 20
    sine = jnp.asarray(np.sin(2 * np.pi * 0.01 * np.arange(n1))
                       .astype(np.float32))
    w1 = HammingWindow().sample(n1, dtype=jnp.float32)

    # Real input stays REAL to the stage-1 dots (the complex64 cast is
    # an uncancelled interleave round trip; windowed_spectrum rule).
    def cfg1(x, w, carry):
        return pipelines._shifted_mag((x + carry) * w)

    dt = timed(cfg1, sine, w1, iters=50)
    record("windowed_fft_magnitude_1m", n1, dt, 36.0 * n1, 1408.0 * n1,
           "real-pruned four-step n1=128 + Pallas tail; window fused")

    # ---- Config 2: 4M complex RC FIR. ----
    # Toeplitz MXU path, complex x, complex taps: 2 band shifts of
    # (R,128)@(128,128) complex dots; XLA complex dot = 4 real matmuls ->
    # counted as Karatsuba-equivalent 3 (harsher floor): 3*2*128*2 = 1536
    # F/sample.  Bytes/sample: x r8 + carry 4 + out w8 = 20 B.
    n2 = 1 << 22
    x_re = jnp.asarray(rng.normal(size=n2).astype(np.float32))
    x_im = jnp.asarray(rng.normal(size=n2).astype(np.float32))
    rc = RaisedCosineFunction(0.35)
    t = ((np.arange(128) - 64) * 0.25).astype(np.float32)
    taps = jnp.asarray(np.asarray(rc.calc(t)))

    # Planar entry (library boundary convention; the complex pack/unpack
    # is not canceled by XLA — see convolve_signal_planar).
    def cfg2(xr, xi, h, carry):
        re, im = conv_ops.convolve_signal_planar(
            xr + carry, xi, h.astype(jnp.complex64))
        # re + im feeds the fold (every element of both planes is live);
        # a concatenate here measured 0.94 ms for the same 0.27 ms chain
        # (probe_cfg2_reg2) — the concat + pad/reshape fold pattern
        # defeats XLA's loop fusion and triples the measured time.
        return re + im

    dt = timed(cfg2, x_re, x_im, taps, iters=50)
    # max_vs_floor 1.05: taps are runtime ARGS here (no const presplit)
    # and the floor already under-counts the 4-mult complex dots as
    # Karatsuba-3 — past ~1.05 means past the measured MXU peak.
    record("rc_fir_4m", n2, dt, 20.0 * n2, 1536.0 * n2,
           "complex Toeplitz MXU, 2 band shifts, 128 taps",
           max_vs_floor=1.05)

    # ---- Config 3: fractional resampling x1.5 of 1M audio samples
    # (slow_down_music), complex stereo-as-IQ, PLANAR. ----
    # The Sinc taps are real, so the stereo planes resample independently
    # (same rule as config #4: the interleaved complex build/split is
    # pure relayout cost on TPU); BOTH planes are computed and consumed.
    # Composed direct resampler P=3/Q=2: windows (nb, W=384) @ M (384,
    # 384) per plane; out 1.5M samples x 2 planes x 2*384 = 2.30 GFLOP.
    # Bytes: in r8 + carry 4 + ext w8 r8 + out w8 (out-scale) ~ 36 MB.
    n3 = 1 << 20
    a_re = jnp.asarray(rng.normal(size=n3).astype(np.float32))
    a_im = jnp.asarray(rng.normal(size=n3).astype(np.float32))

    def cfg3(xr, xi, carry):
        f = SincFunction()
        re = interp_ops.interpolatef(xr + carry, f, 1.5, 0.0, 10, 1.0)
        im = interp_ops.interpolatef(xi, f, 1.5, 0.0, 10, 1.0)
        return jnp.concatenate([re, im])

    dt = timed(cfg3, a_re, a_im, iters=20)
    record("interpolatef_1_5x_1m", n3, dt,
           12.0 * n3 + 16.0 * (n3 * 3 // 2), 2.0 * 384 * 2 * (n3 * 3 // 2),
           "composed banded-matmul polyphase, P=3 Q=2, planar planes")

    # ---- Config 4: modulation chain (PRBS -> RC pulse shaping x10 ->
    # passband), PLANAR (pipelines.modulation_chain_planar). ----
    # Reference chain semantics (examples/modulation.rs:14-41): the
    # complex baseband is an output too, so BOTH planes are computed and
    # consumed by the fold (jnp.real alone would let XLA drop the imag
    # plane's resample entirely — profile_mod4.log).  Direct path P=10
    # Q=1: out 1.31M x 2 planes x 2*W(=256) = 1.34 GFLOP; bytes: in r8 +
    # carry 4 + ext w8 r8 + out w8/sample_out ~ 14 MB.
    n4 = 1 << 17  # symbols
    s_re = jnp.asarray(rng.choice([-0.5, 0.5], n4).astype(np.float32))
    s_im = jnp.asarray(rng.choice([-0.5, 0.5], n4).astype(np.float32))

    def cfg4(sr, si, carry):
        re, im = pipelines.modulation_chain_planar(sr + carry, si)
        return re + im  # see cfg2: concat defeats loop fusion

    dt = timed(cfg4, s_re, s_im, iters=50)
    record("modulation_chain_131k_symbols", 10 * n4, dt,
           12.0 * n4 + 24.0 * 10 * n4, 2.0 * 256 * 2 * 10 * n4,
           "planar RC pulse shaping, composed banded matmul, P=10")

    # ---- Config 5: 1024-channel channelizer + FM demod over 4M. ----
    # Shipped formulation depends on the dispatch:
    # * Pallas megakernel (TPU default, kernels/channelizer_pallas.py):
    #   one VMEM residency through FIR->IDFT->conj-demod; atan2 outside,
    #   fused into the output transpose (probe_chan_tile).  HBM 32.5
    #   B/sample (x 2 planes r8 + ~3% halo re-read r0.5 + carry r4 +
    #   z-planes w8 r8 + transposed angle w4); MXU 2304 bf16-flops/
    #   sample (outer IDFT: 3 Karatsuba dots x 3-pass hi/lo x 2*128) at
    #   the measured bf16 peak; VPU ~129 elem-ops/sample (FIR 9
    #   row-stencil mul+add x2 planes + ~9 sublane shifts = 54, inner
    #   radix-2 IFFT-8 ~10, twiddle 6, Karatsuba prep 13, demod 6,
    #   XLA atan2 ~40) at the measured 3.52 T/s — HBM binds (0.166 ms).
    # * XLA staged pipeline (fallback): ~56 B/sample across the stage
    #   chain (poly r8 w8, fft r8 w8, demod r8 w8 + carry/in/out),
    #   HBM-bound.
    n5 = 1 << 22
    C = 1024
    c_re = jnp.asarray(rng.normal(size=n5).astype(np.float32))
    c_im = jnp.asarray(rng.normal(size=n5).astype(np.float32))
    proto = jnp.asarray((np.hamming(C * 8) / C).astype(np.float32))

    # Planar entry (same rule as config #4): the library's program
    # boundary carries complex as (re, im) planes (_planar.py), and the
    # interleaved-complex pack/unpack XLA does NOT cancel costs ~0.13 ms
    # at this size (probe_chan_planar_entry: 0.335 vs 0.210 ms).
    def cfg5(xr, xi, p, carry):
        return channelizer.channelize_and_demod_planar(xr + carry, xi, p, C)

    dt = timed(cfg5, c_re, c_im, proto, iters=30)
    from basic_dsp_tpu.parallel.channelizer import _pallas_chan_eligible
    if _pallas_chan_eligible(C, n5 // C, 8):
        record("channelizer_1024ch_4m", n5, dt, 32.5 * n5, 2304.0 * n5,
               "fused Pallas megakernel + XLA atan2-transpose",
               mxu_tflops=MXU_TFLOPS_BF16, vpu_opi=129.0 * n5)
    else:
        record("channelizer_1024ch_4m", n5, dt, 56.0 * n5, 0.0,
               "depthwise polyphase + channel-axis FFT + demod; HBM-bound")

    # Optional: VMEM-resident Pallas overlap-save vs the XLA blocked path
    # (BDSP_BENCH_PALLAS=1; the round-3 kernel compiles and wins on axon,
    # probe_os3.py — this A/B re-measures both paths explicitly).
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
        record("overlap_save_xla_384tap_4m", n2, dt, 0.0, 0.0, "A/B")
        dt = timed(cfg_os_pl, x_re, x_im, h_long, iters=20)
        record("overlap_save_pallas_384tap_4m", n2, dt, 0.0, 0.0, "A/B")

    for r in results:
        print(json.dumps({k: r[k] for k in
                          ("metric", "value", "unit", "vs_baseline")}))
    session = {"device": getattr(jax.devices()[0], "device_kind",
                                 "unknown"),
               "mxu_tflops_highest": MXU_TFLOPS_HIGHEST,
               "hbm_gbps": HBM_GBPS,
               "configs": results}
    if args_cli.json:
        with open(args_cli.json, "w") as f:
            json.dump(session, f, indent=1)
        print(f"# wrote {args_cli.json}")
    if args_cli.merge:
        merged = merge_captures(args_cli.merge, session, probe_us)
        with open(args_cli.merge, "w") as f:
            json.dump(merged, f, indent=1)
        hl = {c["metric"]: (c["vs_baseline"], c.get("n_captures", 1))
              for c in merged["configs"]}
        print(f"# merged into {args_cli.merge}: {hl}")


if __name__ == "__main__":
    main()
