"""Probe: does Mosaic/Pallas compile on this runtime at all?

Round-1 finding (CLAUDE.md): even a minimal VMEM copy kernel hangs at
compile on the axon tunnel (>6 min).  This probe re-tests with a short
timeout so each round can cheaply re-check whether the Pallas overlap-save
kernel (kernels/) can be enabled in dispatch.

Run under `timeout 300 python probe_pallas.py`; prints PALLAS_OK if the
copy kernel compiles + runs, otherwise the timeout kills it.
"""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    x = jnp.asarray(np.arange(1024, dtype=np.float32).reshape(8, 128))
    fn = pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )
    y = jax.jit(fn)(x)
    ok = bool(np.allclose(np.asarray(y), np.asarray(x) * 2.0))
    print("PALLAS_OK" if ok else "PALLAS_WRONG", flush=True)


if __name__ == "__main__":
    main()
