"""A/B: factored vs dense big-twiddle streaming in the flagship chain."""
import time
import numpy as np, jax, jax.numpy as jnp
from basic_dsp_tpu import pipelines
from basic_dsp_tpu.windows import HammingWindow
from basic_dsp_tpu.conv_types import RaisedCosineFunction
from bench_all import tunnel_probe

print(f"# tunnel probe {tunnel_probe():.2f} us", flush=True)
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

ref = pipelines.fir_fft_chain_planar(x_re, x_im, taps_re, window, n1=128,
                                     factored_tw=False)
got = pipelines.fir_fft_chain_planar(x_re, x_im, taps_re, window, n1=128,
                                     factored_tw=True)
err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
print(f"# parity factored vs dense: rel {err:.2e}", flush=True)

def make(iters, fac, salt):
    @jax.jit
    def chain(x_re, x_im, _s=salt):
        def body(_, carry):
            mag = pipelines.fir_fft_chain_planar.__wrapped__(
                x_re * (1.0 + carry * 1e-30), x_im, taps_re, window,
                n1=128, factored_tw=fac)
            return mag * 1e-3
        return jax.lax.fori_loop(0, iters, body,
                                 jnp.zeros((n,), jnp.float32))
    return chain

for rep in range(3):
    for fac in (True, False):
        r1, r3 = make(ITERS, fac, rep * 2), make(3 * ITERS, fac, -rep * 2 - 1)
        for _ in range(2):
            float(r1(x_re, x_im)[0]); float(r3(x_re, x_im)[0])
        t0 = time.perf_counter(); float(r1(x_re, x_im)[0])
        t1 = time.perf_counter(); float(r3(x_re, x_im)[0])
        t2 = time.perf_counter()
        sl = ((t2 - t1) - (t1 - t0)) / (2 * ITERS)
        print(f"factored={int(fac)}: {sl * 1e3:.4f} ms/iter "
              f"(vs 0.401 floor: {0.401e-3 / sl:.3f})", flush=True)
