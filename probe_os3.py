"""On-chip compile + parity + A/B for the round-3 overlap-save Pallas
kernel rewrite (VERDICT r2 #3).  The round-2 version died in Mosaic with
INTERNAL HTTP 500; the rewrite uses the spectrum kernel's proven idiom
(2-D dots, aligned concats, no lane<->sublane transposes).

Prints PARITY/err, then slope-timed ms/iter for the Pallas kernel vs the
XLA blocked overlap-add path at the same fft_len (384-tap complex conv
at 4M — the long-kernel regime where the blocked path is the dispatch
winner).
"""
import numpy as np

from bench_all import timed


def main():
    import jax
    import jax.numpy as jnp

    from basic_dsp_tpu.ops import conv_ops
    from basic_dsp_tpu.kernels import overlap_save_pallas as osp

    rng = np.random.default_rng(0)
    n = 1 << 22
    m = 384
    fft_len = 4096
    x_re = jnp.asarray(rng.normal(size=n).astype(np.float32))
    x_im = jnp.asarray(rng.normal(size=n).astype(np.float32))
    # complex arrays cannot cross the host<->device boundary on axon
    # (CLAUDE.md): ship the planes, build the complex view inside jit.
    h_re = jnp.asarray(rng.normal(size=m).astype(np.float32))
    h_im = jnp.asarray(rng.normal(size=m).astype(np.float32))

    # --- compile + parity on a small case first (cheap compile) ---
    ns = 1 << 16

    @jax.jit
    def small_pair(xr, xi):
        x = xr + 1j * xi
        h = h_re + 1j * h_im
        a = osp.overlap_save_pallas(x, h, True, fft_len)
        b = conv_ops.overlap_save(x, h, True, fft_len)
        d = jnp.max(jnp.abs(a - b))
        s = jnp.max(jnp.abs(b))
        return d, s

    d, s = small_pair(x_re[:ns], x_im[:ns])
    rel = float(d) / float(s)
    print(f"PARITY small (64k): rel err {rel:.3e}", flush=True)
    assert rel < 1e-5, rel

    # --- A/B at 4M ---
    def pl_conv(xr, xi, carry):
        x = (xr + carry) + 1j * xi
        return osp.overlap_save_pallas(x, h_re + 1j * h_im, True, fft_len)

    def xla_conv(xr, xi, carry):
        x = (xr + carry) + 1j * xi
        return conv_ops.overlap_save(x, h_re + 1j * h_im, True, fft_len)

    for name, fn in (("pallas", pl_conv), ("xla_blocked", xla_conv)):
        dt = timed(fn, x_re, x_im, iters=20) * 1e3
        print(f"{name:12s}: {dt:7.4f} ms/iter "
              f"({n / dt / 1e3:7.1f} Msamples/s)", flush=True)


if __name__ == "__main__":
    main()
