"""cfg2 regression isolation: which piece of the planar entry is slow."""
import numpy as np, jax, jax.numpy as jnp
from basic_dsp_tpu.ops import conv_ops
from basic_dsp_tpu import config as _c
from bench_all import timed, tunnel_probe

print(f"# tunnel probe {tunnel_probe():.2f} us", flush=True)
n = 1 << 22
rng = np.random.default_rng(0)
xr = jnp.asarray(rng.normal(size=n).astype(np.float32))
xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
taps = jnp.asarray(rng.normal(size=128).astype(np.float32))

impl = conv_ops._toeplitz_planar_impl.__wrapped__

# v0: old complex round trip
def v0(a, b, h, carry):
    x = (a + carry) + 1j * b
    return conv_ops.convolve_signal(x, h.astype(jnp.complex64), True)

# v1: planar, output summed instead of concat
def v1(a, b, h, carry):
    re, im = impl(a + carry, b, h.astype(jnp.complex64), _c.matmul_precision())
    return re + im

# v2: planar real taps, output summed
def v2(a, b, h, carry):
    re, im = impl(a + carry, b, h, _c.matmul_precision())
    return re + im

# v3: planar real CLOSURE taps (fold active), output summed
def v3(a, b, carry):
    re, im = impl(a + carry, b, taps, _c.matmul_precision())
    return re + im

# v4: old toeplitz_conv with complex ext but REAL closure taps
def v4(a, b, carry):
    x = (a + carry) + 1j * b
    return conv_ops.toeplitz_conv(x, taps)

for name, fn, args in [("v0 old complex entry  ", v0, (xr, xi, taps)),
                       ("v1 planar cplx taps   ", v1, (xr, xi, taps)),
                       ("v2 planar real taps   ", v2, (xr, xi, taps)),
                       ("v3 planar closure taps", v3, (xr, xi)),
                       ("v4 old cplx closure   ", v4, (xr, xi))]:
    dt = timed(fn, *args, iters=50)
    print(f"{name} {dt*1e3:8.4f} ms", flush=True)
