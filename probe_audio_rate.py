"""On-chip check of VERDICT r3 #6: 44.1->48 kHz (P/Q=160/147) interpolatef
must ride the MXU banded path and bench >= 0.5 of its floor."""
import warnings
import numpy as np, jax, jax.numpy as jnp
from basic_dsp_tpu.ops import interp_ops
from basic_dsp_tpu.conv_types import SincFunction
from bench_all import timed, tunnel_probe, HBM_GBPS, MXU_TFLOPS_HIGHEST

print(f"# tunnel probe {tunnel_probe():.2f} us", flush=True)
n = 1 << 20
x = jnp.asarray(np.random.default_rng(0).normal(size=n).astype(np.float32))
fun = SincFunction()
L = 10
factor = 160.0 / 147.0
new_points = int(round(n * factor)) + int(round(n * factor)) % 2

with warnings.catch_warnings():
    warnings.simplefilter("error", RuntimeWarning)  # slow-path warn = fail
    def fn(a, carry):
        return interp_ops.interpolatef(a + carry, fun, factor, 0.0, L, 1.0)
    dt = timed(fn, x, iters=30)

P, Q = 160, 147
taps, offs = interp_ops.polyphase_taps(fun, P, Q, 0.0, L, jnp.float32)
c = interp_ops._choose_c(P, Q)
W = taps.shape[-1]
nb = new_points // (P * c) + 1
# shipped banded matmul: (nb, Wb) @ (Wb, P*c) with Wb ~ W + (c-1)*Q/P*...,
# conservative floor: out x W x 2 flops + bytes in/out
flops = new_points * W * 2.0
bytes_ = n * 4 + new_points * 4 + n * 4  # in + out + carry read
floor_ms = max(bytes_ / (HBM_GBPS * 1e6), flops / (MXU_TFLOPS_HIGHEST * 1e9))
print(f"c={c} W={W} measured {dt*1e3:.4f} ms, floor {floor_ms:.4f} ms, "
      f"ratio {floor_ms/(dt*1e3):.3f}, {n/dt/1e6:.0f} Msamples/s", flush=True)
