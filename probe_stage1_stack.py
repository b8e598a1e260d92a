"""Stage-1 DFT-64 formulation A/B at flagship geometry: 3-dot Karatsuba
((64,64) weights, quarter MXU utilization) vs 2 stacked-weight dots
([Fr;Fi] (128,64), half utilization) — fewer weight-stationary streams
should win when K = n1 < 128."""
import numpy as np, jax, jax.numpy as jnp
from basic_dsp_tpu.ops import fourstep
from bench_all import timed, tunnel_probe

print(f"# tunnel probe {tunnel_probe():.2f} us", flush=True)
n = 1 << 22
n1 = 64
n2 = n // n1
rng = np.random.default_rng(0)
Ar = jnp.asarray(rng.normal(size=(n1, n2)).astype(np.float32))
Ai = jnp.asarray(rng.normal(size=(n1, n2)).astype(np.float32))
Frn, Fin, Trn, Tin = fourstep._dif_planes(n1, n2)
prec = "highest"

Fr = jnp.asarray(Frn); Fi = jnp.asarray(Fin)
Fm = jnp.asarray(Fin - Frn); Fp = jnp.asarray(Fin + Frn)
Fstack = jnp.asarray(np.concatenate([Frn, Fin], axis=0))  # (2*n1, n1)

def karat(ar, ai, carry):
    a = ar + carry
    k1 = jnp.matmul(Fr, a + ai, precision=prec)
    k2 = jnp.matmul(Fm, a, precision=prec)
    k3 = jnp.matmul(Fp, ai, precision=prec)
    return (k1 - k3) + (k1 + k2)

def stacked(ar, ai, carry):
    a = ar + carry
    p = jnp.matmul(Fstack, a, precision=prec)    # Fr@a ; Fi@a
    q = jnp.matmul(Fstack, ai, precision=prec)   # Fr@ai ; Fi@ai
    br = p[:n1] - q[n1:]
    bi = p[n1:] + q[:n1]
    return br + bi

o1 = jax.jit(lambda a,b: karat(a,b,0.0))(Ar, Ai)
o2 = jax.jit(lambda a,b: stacked(a,b,0.0))(Ar, Ai)
err = float(jnp.max(jnp.abs(o1-o2)) / jnp.max(jnp.abs(o1)))
print(f"parity {err:.2e}", flush=True)
for name, fn in [("karatsuba 3-dot", karat), ("stacked 2-dot  ", stacked)]:
    dt = timed(fn, Ar, Ai, iters=50)
    print(f"{name} {dt*1e3:8.4f} ms", flush=True)
