"""cfg1 (1M real sine -> windowed FFT magnitude) stage breakdown.

Best capture today 0.0779 ms vs the tightened 0.0457 ms floor (~0.59).
Where does the gap sit at the 1M geometry (n1=128, L2=64, m0=64)?
Arms: full chain / stage-1-only (pruned real dot) / kernel-only (row
FFT+mag on precomputed B) / transpose-only.
"""
import numpy as np, jax, jax.numpy as jnp
from basic_dsp_tpu import pipelines
from basic_dsp_tpu.ops import fourstep
from basic_dsp_tpu.kernels import spectrum_pallas as sp
from basic_dsp_tpu.windows import HammingWindow
from bench_all import timed, tunnel_probe

print(f"# tunnel probe {tunnel_probe():.2f} us", flush=True)
n = 1 << 20
sine = jnp.asarray(np.sin(2 * np.pi * 0.01 * np.arange(n))
                   .astype(np.float32))
w1 = HammingWindow().sample(n, dtype=jnp.float32)
n1, n2 = fourstep.factor(n)
print(f"# n1={n1} n2={n2} L2={n2 // 128}", flush=True)
Frn, Fin, Trn, Tin = fourstep._dif_planes(n1, n2)
Fr = jnp.asarray(Frn)
Tfac = fourstep._dif_twiddle_factored(n1, n2)
rng = np.random.default_rng(0)
Brc = jnp.asarray(rng.normal(size=(n1, n2)).astype(np.float32))
Bic = jnp.asarray(rng.normal(size=(n1, n2)).astype(np.float32))


def fn_full(x, w, carry):
    return pipelines._shifted_mag((x + carry) * w)


def fn_stage1(x, w, carry):
    A = ((x + carry) * w).reshape(n1, n2)
    return jnp.matmul(Fr, A, precision="highest")


def fn_kernel(br, bi, carry):
    return sp.rowfft_mag(br + carry[None, :], bi, shift=True,
                         Tfac=Tfac, permuted=True).reshape(n1, -1)


def fn_transpose(br, bi, carry):
    M = (br + carry[None, :]).reshape(n1, n2 // 128, 128)
    return sp.natural_flatten(M, permuted=True)


for name, fn, args in (("full", fn_full, (sine, w1)),
                       ("stage1", fn_stage1, (sine, w1)),
                       ("kernel", fn_kernel, (Brc, Bic)),
                       ("transpose", fn_transpose, (Brc, Bic))):
    dt = timed(fn, *args, iters=40)
    print(f"{name}: {dt * 1e3:.4f} ms (spread {timed.last_spread:.2f})",
          flush=True)
