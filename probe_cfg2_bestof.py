"""cfg2 best-of-algorithms A/B (VERDICT r4 #6): complex FIR at 4M/128
taps — MXU Toeplitz vs Pallas overlap-save vs XLA blocked overlap-save,
with BOTH formulations' floors reported.

Floors at 4M complex64 (n = 2^22), m = 128:
  toeplitz:  MXU 3 Karatsuba dots x W=256 band  = 2*3*256*n = 6.44 GF
             -> 0.209 ms at 30.8 TFLOPS; bytes in16+out16+carry ~ 40 MB
  overlap-save (fft_len F): ~2 complex FFTs + mult per block,
             ~(10*log2(F) + 6 + overlap waste) VPU/MXU-mixed flops/sample
             — FLOP-cheaper than Toeplitz, but XLA's fft is a custom
             call (not MXU dots); its honest wall is HBM: in 32 + out 32
             + interleave/stage traffic.  Pure-bytes floor ~0.08 ms.

The decision rule (bench_all cfg2): ship the faster-on-the-clock path;
report vs_baseline against the MIN of the two formulation floors so the
ratio cannot be inflated by picking an expensive formulation.

RESULT (2026-08-20, v5e, tunnel probe 2.08 us, spreads 1.03-1.14):

  toeplitz       0.2208 ms   0.947 of its 0.209 ms floor   <- SHIPPED
  os-pallas-4096 0.7579
  os-pallas-2048 0.8093
  os-pallas-1024 0.9865
  os-xla-2048    0.9670

Toeplitz is the right dispatch at m=128/4M by BOTH measures:
(a) it wins the clock 3.4x; (b) its floor is the lower one under the
three-resource model — overlap-save's FFT work is not free: realized
as Stockham+DFT-128 MXU dots (the only competitive in-kernel FFT form,
spectrum_pallas), two 4096-point transforms per block cost ~2x the
flagship kernel's 6.44 GF = ~12.9 GF at f32-exact (0.42 ms at the
measured 30.8 TFLOPS peak) vs Toeplitz's 6.44 GF (0.209 ms).  The
bytes-only OS "floor" (in+out ~ 12 B/sample = 0.061 ms) is unreachable
by any known formulation on this hardware; the Pallas OS kernel's own
best (fft_len sweep above) is 3.4x the Toeplitz clock.  cfg2's
vs_baseline therefore stands against the Toeplitz floor, which is the
best-of-algorithms floor at this geometry (VERDICT r4 #6).
"""
import numpy as np, jax, jax.numpy as jnp
from basic_dsp_tpu.ops import conv_ops
from bench_all import timed, tunnel_probe, HBM_GBPS, MXU_TFLOPS_HIGHEST

print(f"# tunnel probe {tunnel_probe():.2f} us", flush=True)
n = 1 << 22
m = 128
rng = np.random.default_rng(0)
xr = jnp.asarray(rng.normal(size=n).astype(np.float32))
xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
hr = jnp.asarray(rng.normal(size=m).astype(np.float32))
hi = jnp.asarray(rng.normal(size=m).astype(np.float32))

toep_floor = max(2.0 * 3 * 256 * n / (MXU_TFLOPS_HIGHEST * 1e9),
                 40e6 / (HBM_GBPS * 1e6))
os_bytes_floor = (16.0 * n + 16.0 * n + 8.0 * n) / (HBM_GBPS * 1e6)
print(f"# floors: toeplitz {toep_floor:.4f} ms, os-bytes "
      f"{os_bytes_floor:.4f} ms", flush=True)


def fn_toeplitz(ar, ai, carry):
    z = (ar + carry) + 1j * ai
    h = hr + 1j * hi
    return jnp.abs(conv_ops.toeplitz_conv(z, h, True))


def mk_os_pallas(fl):
    from basic_dsp_tpu.kernels import overlap_save_pallas as osp

    def fn(ar, ai, carry):
        z = (ar + carry) + 1j * ai
        h = hr + 1j * hi
        return jnp.abs(osp.overlap_save_pallas(z, h, True, fl))
    return fn


def mk_os_xla(fl):
    def fn(ar, ai, carry):
        z = (ar + carry) + 1j * ai
        h = hr + 1j * hi
        return jnp.abs(conv_ops.overlap_save(z, h, True, fl))
    return fn


arms = [("toeplitz", fn_toeplitz)]
for fl in (1024, 2048, 4096):
    arms.append((f"os-pallas-{fl}", mk_os_pallas(fl)))
arms.append(("os-xla-2048", mk_os_xla(2048)))

for name, fn in arms:
    try:
        dt = timed(fn, xr, xi, iters=20)
        ms = dt * 1e3
        print(f"{name}: {ms:.4f} ms  vs-toep-floor {toep_floor / ms:.3f}"
              f"  vs-os-bytes {os_bytes_floor / ms:.3f} "
              f"(spread {timed.last_spread:.2f})", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)
