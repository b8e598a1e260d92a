"""Round-5 audio-rate (44.1<->48 kHz, P/Q = 160/147) measurement record.

History of this round's formulations at 1M f32 on v5e (all parity-
verified against the f64 exact-rational oracle / the generic banded
path before timing):

  generic banded c=2 (r4 shipped)        0.16-0.19 ms   windows + ext
                                                        relayouts bind
  Pallas row-block, slice+concat          0.155         VMEM relayouts
  Pallas row-block, 2 shifted-view dots   0.095-0.124   skinny-row DMA
                                                        binds (0.130 ms
                                                        of pure DMA)
  Pallas row-block, HBM-padded rows       0.108         pad pass + 2x
                                                        read amp
  XLA row-shifted const-weight matmuls    0.0196        SHIPPED
                                                        (_interpolatef_rowblock)

The shipped form: V = ext.reshape(rows, Q) is free in HBM; the window
dot distributes over row-shifted views (out = sum_r V[j+r] @ M_r); XLA
fuses the shifted reads into const-weight matmul operands and presplits
the constant.  The Pallas variants were deleted (wired-or-deleted).

This probe re-measures the SHIPPED dispatch path and prints the ratio
against two floors: the r4 "composed formulation" floor (c=2 banded,
W=384) and this formulation's own floor (2 views x Q MACs/output +
bytes).  Run on the chip: python probe_audio_rate_r5.py
"""
import numpy as np, jax, jax.numpy as jnp
from basic_dsp_tpu.ops import interp_ops
from basic_dsp_tpu.conv_types import SincFunction
from bench_all import timed, tunnel_probe, HBM_GBPS, MXU_TFLOPS_HIGHEST

print(f"# tunnel probe {tunnel_probe():.2f} us", flush=True)
n = 1 << 20
x = jnp.asarray(np.random.default_rng(0).normal(size=n).astype(np.float32))
P, Q, L = 160, 147, 10
out_len = int(round(n * P / Q)); out_len += out_len % 2
fun = SincFunction()
taps, offs = interp_ops.polyphase_taps(fun, P, Q, 0.0, L, jnp.float32)

# parity through the public dispatch vs the f64 exact-rational oracle
got = np.asarray(interp_ops.interpolatef(x, fun, P / Q, 0.0, L, 1.0))
x64 = np.float64(np.asarray(x))
i = np.arange(out_len)
k, p = i // P, i % P
base = k * Q + (p * Q) // P
frac = ((p * Q) % P) / P
t = np.arange(2 * L + 1)
args = t[None, :] - L - frac[:, None]
w = np.asarray(jax.device_get(fun.calc(jnp.asarray(np.float64(args)))))
idx = (base[:, None] + t[None, :] - L) % n
want = (x64[idx] * np.float64(w)).sum(-1)
err = np.abs(got[:out_len] - want).max() / np.abs(want).max()
print(f"# parity dispatch vs f64 oracle: rel {err:.2e}", flush=True)
# 2e-5: the shipped Pallas kernel's 3-pass bf16 grade (the XLA fallback
# form is exact-grade 2e-7; tests pin both).
assert err < 2e-5

fl_r4 = max(((2 * n + out_len) * 4.0 + (out_len // 320) * 384 * 4)
            / (HBM_GBPS * 1e6),
            2.0 * 384 * out_len / (MXU_TFLOPS_HIGHEST * 1e9))
fl_rb = max((2 * n + out_len) * 4.0 / (HBM_GBPS * 1e6),
            2.0 * 2 * Q * out_len / (MXU_TFLOPS_HIGHEST * 1e9))

def fn(a, carry):
    return interp_ops.interpolatef(a + carry, fun, P / Q, 0.0, L, 1.0)

for _ in range(3):
    dt = timed(fn, x, iters=50)
    print(f"dispatch 160/147 1M: {dt * 1e3:.4f} ms "
          f"({n / dt / 1e6:.0f} Msamples/s in)  "
          f"r4-floor {fl_r4:.4f} ratio {fl_r4 / (dt * 1e3):.3f}  "
          f"self-floor {fl_rb:.4f} ratio {fl_rb / (dt * 1e3):.3f} "
          f"(spread {timed.last_spread:.2f})", flush=True)
