"""On-device numeric accuracy smoke: drives interpolatef and
convolve_signal through the public API on the DEFAULT backend (the real
TPU under axon) against independent numpy realizations of the reference
scalar formulas (interpolation.rs:92-131; centered circular convolution).

Exists because the CPU test suite cannot catch TPU-only numeric
regressions: the MXU's default matmul precision truncates f32 inputs to
bf16 (~5e-3 relative error), which silently violated the reference's
1e-6/1e-4 accuracy contract until every matmul/einsum site was pinned to
precision="highest".  Run after touching any MXU path.
"""
import numpy as np
import basic_dsp_tpu as bd

def oracle(x, factor, delay, conv_len, delta=1.0):
    n = len(x)
    delay = delay / delta
    L = min(conv_len, n // 2)
    is_c = np.iscomplexobj(x)
    new_len = int(round(n * (2 if is_c else 1) * factor))
    new_len += new_len % 2
    pts = new_len // 2 if is_c else new_len
    out = np.zeros(pts, dtype=x.dtype if is_c else np.float64)
    for i in range(pts):
        center = i / factor
        r = np.floor(center)
        acc = 0.0
        for t in range(2 * L + 1):
            w = np.sinc(t - L - (center - r) + delay)
            acc += x[int(r - L + t) % n] * w
        out[i] = acc
    return out

rng = np.random.default_rng(42)
fails = 0
def check(name, factor, n, delay=0.0, conv_len=10, cplx=True):
    global fails
    if cplx:
        re = rng.normal(size=n).astype(np.float32)
        im = rng.normal(size=n).astype(np.float32)
        v = bd.interleave_to_complex_time_vec(re, im)
        x = re.astype(np.complex128) + 1j * im
    else:
        re = rng.normal(size=n).astype(np.float32)
        v = bd.to_real_time_vec(re)
        x = re.astype(np.float64)
    got = v.interpolatef(bd.SincFunction(), factor, delay, conv_len).to_numpy()
    want = oracle(x, factor, delay, conv_len)
    if len(got) != len(want):
        print(f"{name}: FAIL len {len(got)} != {len(want)}"); fails += 1; return
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-30)
    status = "OK" if err < 2e-4 else "FAIL"
    if status == "FAIL": fails += 1
    print(f"{name}: {status}  rel_err={err:.2e}  len={len(got)}", flush=True)

check("rational 1.5x complex (mux path)", 1.5, 300)
check("integer 2x complex (mux path)", 2.0, 256)
check("integer 4x real", 4.0, 250, cplx=False)
check("rational 1.5x real", 1.5, 200, cplx=False)
check("tiny n=8 conv_len=10 (gather path)", 1.5, 8)
check("big denominator 64/63 (gate fallback)", 64/63, 63*16)
check("delay=0.25 rational 1.5x", 1.5, 300, delay=0.25)
check("fractional 0.77x (gather path)", 0.77, 300)
check("irrational-ish 1.333333x", 4/3, 300)
# n >= resample_pallas.MIN_N: exercises the VMEM Pallas banded resampler
# (3-pass bf16 hi/lo dots, ~1e-5 rel — reference f32 FMA grade).
check("rational 1.5x real 64k (pallas kernel)", 1.5, 1 << 16, cplx=False)
print("ALL OK" if fails == 0 else f"{fails} FAILURES")

# toeplitz convolve_signal accuracy on TPU (was bf16-grade before the fix)
def conv_check():
    n, m = 3000, 31  # n>1000, m<=202 -> toeplitz path
    re = rng.normal(size=n).astype(np.float32)
    im = rng.normal(size=n).astype(np.float32)
    v = bd.interleave_to_complex_time_vec(re, im)
    h = rng.normal(size=m).astype(np.float32) + 1j*rng.normal(size=m).astype(np.float32)
    hv = bd.to_complex_time_vec(h.astype(np.complex64))
    got = v.convolve_signal(hv).to_numpy()
    x = re.astype(np.complex128) + 1j*im
    c = m - m//2
    idx = (np.arange(n)[:, None] + c - 1 - np.arange(m)[None, :]) % n
    want = (x[idx] * h.astype(np.complex128)[None, :]).sum(axis=1)
    err = np.abs(got - want).max() / np.abs(want).max()
    print(f"convolve_signal toeplitz: {'OK' if err < 1e-5 else 'FAIL'}  rel_err={err:.2e}", flush=True)
conv_check()

def reorg_checks():
    n = 1000
    re = rng.normal(size=n).astype(np.float32)
    im = rng.normal(size=n).astype(np.float32)
    v = bd.interleave_to_complex_time_vec(re, im)
    x = re.astype(np.complex128) + 1j*im
    got = v.decimatei(4, 2).to_numpy()
    err = np.abs(got - x[2::4]).max()
    print(f"decimatei exact: {'OK' if err == 0 else 'FAIL'}  abs_err={err:.1e}", flush=True)
    got = v.zero_interleave(3).to_numpy()
    want = np.zeros(3*n, dtype=np.complex128); want[0::3] = x
    err = np.abs(got - want).max()
    print(f"zero_interleave exact: {'OK' if err == 0 else 'FAIL'}  abs_err={err:.1e}", flush=True)
reorg_checks()

def fft_checks():
    for n in (4096, 1 << 20):
        re = rng.normal(size=n).astype(np.float32)
        im = rng.normal(size=n).astype(np.float32)
        v = bd.interleave_to_complex_time_vec(re, im)
        got = v.plain_fft().to_numpy()
        want = np.fft.fft(re.astype(np.float64) + 1j * im)
        err = np.abs(got - want).max() / np.abs(want).max()
        # f32 FFT error grows ~sqrt(log n)*eps; 1e-5 is the healthy range.
        print(f"plain_fft n={n}: {'OK' if err < 5e-5 else 'FAIL'}  rel_err={err:.2e}",
              flush=True)
fft_checks()

def real_interp_checks():
    """interpolate_lin / interpolate_hermite rational fast path on-chip
    (banded matmul; must stay f32-exact grade vs the f64 gather oracle)."""
    n = 4096
    data = rng.normal(size=n).astype(np.float32)
    x = data.astype(np.float64)
    for name, factor, delay in [("lin 1.5x", 1.5, 0.0),
                                ("lin 2x d=.25", 2.0, 0.25),
                                ("hermite 1.5x", 1.5, 0.0),
                                ("hermite 2.5x d=-.75", 2.5, -0.75)]:
        v = bd.to_real_time_vec(data)
        if name.startswith("lin"):
            got = v.interpolate_lin(factor, delay).to_numpy()
            dest = int(round((n - 1) * factor)) + 1
            i = np.arange(dest - 1, dtype=np.float64)
            pos = i / factor + delay
            bf = np.floor(pos)
            b = np.clip(bf.astype(np.int64), 0, n - 2)
            want = np.concatenate(
                [x[b] + (x[b + 1] - x[b]) * (pos - bf), x[-1:]])
        else:
            got = v.interpolate_hermite(factor, delay).to_numpy()
            dest = int(round((n - 1) * factor)) + 1
            i = np.arange(dest, dtype=np.float64)
            pos = i / factor + delay
            bf = np.floor(pos)
            b = bf.astype(np.int64)
            t = pos - bf
            g = lambda idx: x[np.clip(idx, 0, n - 1)]
            y1, y2i, y0i, y3i = g(b), g(b + 1), g(b - 1), g(b + 2)
            y0 = np.where(b <= 0, y1 - (y2i - y1), y0i)
            y2 = np.where(b >= n - 1, y1 + (y1 - y0), y2i)
            y3 = np.where(b >= n - 2, y2 + (y2 - y1), y3i)
            t2 = t * t
            want = ((-0.5 * y0 + 1.5 * y1 - 1.5 * y2 + 0.5 * y3) * t * t2
                    + (y0 - 2.5 * y1 + 2.0 * y2 - 0.5 * y3) * t2
                    + (-0.5 * y0 + 0.5 * y2) * t + y1)
        # Interior (banded matmul) is f32-exact (~3e-7); the boundary
        # patch keeps the reference formula's f32 `pos`, whose rounding at
        # large i costs ~1e-4 relative vs this f64 oracle (the old
        # full-gather path is 2.6x worse mid-array — measured 5.4e-4).
        err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-30)
        print(f"real_interp {name}: {'OK' if err < 2e-4 else 'FAIL'}  "
              f"rel_err={err:.2e}", flush=True)
real_interp_checks()
