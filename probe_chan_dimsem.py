"""A/B dimension_semantics on the channelizer megakernel grid: does
marking the tile dim 'parallel' (vs default) change Mosaic's pipelining
at cfg5 geometry?"""
import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import basic_dsp_tpu.kernels.channelizer_pallas as ckp
from bench_all import timed, tunnel_probe


def main():
    print(f"# tunnel probe {tunnel_probe():.2f} us", flush=True)
    n = 1 << 22
    C = 1024
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.normal(size=n).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
    tm = jnp.asarray((np.random.default_rng(1).normal(size=(9, C)) / C)
                     .astype(np.float32))
    n1 = C // 128
    S = n // C

    for sem in (None, ("parallel",), ("arbitrary",)):
        params = (pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
                  if sem is None else
                  pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024,
                                       dimension_semantics=sem))
        orig_cp = pltpu.CompilerParams

        class _CP:
            def __new__(cls, **kw):
                kw.setdefault("dimension_semantics", sem)
                return orig_cp(**kw) if sem else orig_cp(**{
                    k: v for k, v in kw.items()
                    if k != "dimension_semantics" or v})
        # monkeypatch the module's CompilerParams factory
        ckp.pltpu.CompilerParams = (lambda **kw: orig_cp(
            dimension_semantics=sem, **kw)) if sem else orig_cp

        def fn(a, b, t, carry, tag=str(sem)):
            zr, zi = ckp.channelize_demod_pallas(a + carry, b, t, C,
                                                 demod=False)
            ang = jnp.arctan2(zi, zr)
            return ang.reshape(S, n1, 128).transpose(2, 1, 0).reshape(C, S)

        try:
            dt = timed(fn, xr, xi, tm, iters=30)
            print(f"sem={str(sem):14s}  {dt*1e3:8.4f} ms", flush=True)
        except Exception as e:
            print(f"sem={str(sem):14s}  FAILED {type(e).__name__}", flush=True)
        ckp.pltpu.CompilerParams = orig_cp


if __name__ == "__main__":
    main()
