"""On-chip parity of the overlap-save Pallas kernel across supported
fft_len geometries (1024..16384) and tap counts before enabling the
dispatch gate by default."""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from basic_dsp_tpu.ops import conv_ops
    from basic_dsp_tpu.kernels import overlap_save_pallas as osp

    rng = np.random.default_rng(1)
    n = 1 << 18
    x_re = jnp.asarray(rng.normal(size=n).astype(np.float32))
    x_im = jnp.asarray(rng.normal(size=n).astype(np.float32))
    for fft_len, m in ((1024, 240), (2048, 384), (8192, 1500),
                       (16384, 3000)):
        h_re = jnp.asarray(rng.normal(size=m).astype(np.float32))
        h_im = jnp.asarray(rng.normal(size=m).astype(np.float32))

        @jax.jit
        def pair(xr, xi, hr=h_re, hi=h_im, fl=fft_len):
            x = xr + 1j * xi
            h = hr + 1j * hi
            a = osp.overlap_save_pallas(x, h, True, fl)
            b = conv_ops.overlap_save(x, h, True, fl)
            return jnp.max(jnp.abs(a - b)), jnp.max(jnp.abs(b))

        d, s = pair(x_re, x_im)
        rel = float(d) / float(s)
        print(f"fft_len {fft_len:6d} m {m:5d}: rel err {rel:.3e} "
              f"{'OK' if rel < 2e-5 else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
