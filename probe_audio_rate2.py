"""160/147 direct-path floor accounting + c sweep on chip."""
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
P, Q = 160, 147
factor = 160.0 / 147.0
new_points = int(round(n * factor)); new_points += new_points % 2
taps, offs = interp_ops.polyphase_taps(fun, P, Q, 0.0, L, jnp.float32)

for c in (1, 2, 4, 8):
    W = interp_ops._band_W(P, Q, L, c)
    B = c * P
    nb = -(-new_points // B)
    flops = nb * W * B * 2.0
    bytes_ = (n + new_points + n) * 4.0 + nb * W * 4.0
    floor_ms = max(bytes_/(HBM_GBPS*1e6), flops/(MXU_TFLOPS_HIGHEST*1e9))
    def fn(a, carry, c=c):
        out = interp_ops._interpolatef_direct(a + carry, taps, P, Q, offs,
                                              L, new_points, c)
        return jnp.real(out)
    try:
        dt = timed(fn, x, iters=30)
        print(f"c={c:2d} W={W:5d} B={B:5d} shipped-flops {flops/1e9:.3f} GF "
              f"floor {floor_ms:.4f} ms measured {dt*1e3:.4f} ms "
              f"ratio {floor_ms/(dt*1e3):.3f}", flush=True)
    except Exception as e:
        print(f"c={c} FAILED {type(e).__name__}", flush=True)
