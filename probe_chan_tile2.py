import numpy as np, jax, jax.numpy as jnp
from basic_dsp_tpu.kernels import channelizer_pallas as ckp
from bench_all import timed, tunnel_probe
print(f"# tunnel probe {tunnel_probe():.2f} us", flush=True)
n=1<<22; C=1024; n1=C//128; S=n//C
rng=np.random.default_rng(0)
xr=jnp.asarray(rng.normal(size=n).astype(np.float32))
xi=jnp.asarray(rng.normal(size=n).astype(np.float32))
tm=jnp.asarray((np.random.default_rng(1).normal(size=(9,C))/C).astype(np.float32))
for R in (256, 512, 1024):
    def fn(a,b,t,carry,R=R):
        zr, zi = ckp.channelize_demod_pallas(a+carry,b,t,C,tile_rows=R,demod=False)
        ang = jnp.arctan2(zi, zr)
        return ang.reshape(S,n1,128).transpose(2,1,0).reshape(C,S)
    dt = timed(fn, xr, xi, tm, iters=30)
    print(f"R={R:5d}  {dt*1e3:8.4f} ms", flush=True)
