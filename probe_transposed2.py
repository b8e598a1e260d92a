"""Focused on-chip A/B: fixed transposed kernel (acc + last-step VMEM
transpose) vs baseline. Non-fused only."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from basic_dsp_tpu import pipelines
from basic_dsp_tpu.windows import HammingWindow
from basic_dsp_tpu.conv_types import RaisedCosineFunction

ITERS = 50
n = 1 << 22
m = 128
rng = np.random.default_rng(0)
x_re = jnp.asarray(rng.normal(size=n).astype(np.float32))
x_im = jnp.asarray(rng.normal(size=n).astype(np.float32))
rc = RaisedCosineFunction(0.35)
t = ((np.arange(m) - m // 2) * 0.25).astype(np.float32)
taps_np = np.asarray(rc.calc(t)).astype(np.float32)
taps_np /= taps_np.sum()
taps_re = jnp.asarray(taps_np)
window = HammingWindow().sample(n, dtype=jnp.float32)
chain = pipelines.fir_fft_chain_planar.__wrapped__

base = chain(x_re, x_im, taps_re, window, n1=64)
try:
    got = chain(x_re, x_im, taps_re, window, n1=64, transposed=True)
    err = float(jnp.max(jnp.abs(got - base)) / jnp.max(base))
    print(f"parity transposed: rel err {err:.2e}", flush=True)
except Exception as e:
    print(f"parity transposed: FAILED {type(e).__name__}: {e}", flush=True)
    raise SystemExit(1)

def make(iters, **kw):
    @jax.jit
    def run(xr, xi):
        def body(_, fb):
            return chain(xr * (1.0 + fb * 1e-33), xi, taps_re, window,
                         n1=64, **kw)
        return jax.lax.fori_loop(0, iters, body,
                                 jnp.zeros((n,), jnp.float32))
    return run

def slope(**kw):
    r1, r3 = make(ITERS, **kw), make(3 * ITERS, **kw)
    for _ in range(2):
        float(jnp.max(r1(x_re, x_im)))
        float(jnp.max(r3(x_re, x_im)))
    def med(r):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.max(r(x_re, x_im)))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]
    return (med(r3) - med(r1)) / (2 * ITERS) * 1e3

for name, kw in [("baseline  ", {}), ("transposed", dict(transposed=True))]:
    print(f"{name}: {slope(**kw):.3f} ms/iter", flush=True)
