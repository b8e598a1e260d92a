"""cfg2 regression bisect: old complex-entry convolve_signal vs new
planar entry, plus tap-dtype variants, same session."""
import numpy as np, jax, jax.numpy as jnp
from basic_dsp_tpu.ops import conv_ops
from bench_all import timed, tunnel_probe

print(f"# tunnel probe {tunnel_probe():.2f} us", flush=True)
n = 1 << 22
rng = np.random.default_rng(0)
xr = jnp.asarray(rng.normal(size=n).astype(np.float32))
xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
taps = jnp.asarray(rng.normal(size=128).astype(np.float32))

def old_cfg2(a, b, h, carry):
    x = (a + carry) + 1j * b
    return conv_ops.convolve_signal(x, h.astype(jnp.complex64), True)

def new_cfg2(a, b, h, carry):
    re, im = conv_ops.convolve_signal_planar(a + carry, b, h.astype(jnp.complex64))
    return jnp.concatenate([re, im])

def new_cfg2_realtaps(a, b, h, carry):
    re, im = conv_ops.convolve_signal_planar(a + carry, b, h)
    return jnp.concatenate([re, im])

for name, fn in [("old complex entry", old_cfg2),
                 ("new planar entry ", new_cfg2),
                 ("planar real taps ", new_cfg2_realtaps)]:
    dt = timed(fn, xr, xi, taps, iters=50)
    print(f"{name} {dt*1e3:8.4f} ms", flush=True)

# nested-jit hypothesis: call the impl's undecorated function directly
impl = conv_ops._toeplitz_planar_impl.__wrapped__
from basic_dsp_tpu import config as _c

def nojit(a, b, h, carry):
    re, im = impl(a + carry, b, h, _c.matmul_precision())
    return jnp.concatenate([re, im])

dt = timed(nojit, xr, xi, taps, iters=50)
print(f"planar impl inlined (no nested jit) {dt*1e3:8.4f} ms", flush=True)
