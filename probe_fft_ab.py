"""A/B: whole-signal complex FFT at 4M — XLA jnp.fft.fft vs four-step
variants.  A faster plain_fft accelerates fft/ifft, correlation,
interpolate/interpft everywhere.

Variants:
  xla        jnp.fft.fft(x)
  fourstep   reshape (n1, n2): batched fft cols (axis 0) -> twiddle ->
             batched fft rows -> transpose (sharded_fft's single-chip core)
  mm64       stage-1 as 3-dot Karatsuba DFT-64 matmul (planar), row FFTs
             via jnp.fft, natural-order transpose
All return the full complex spectrum (as planes, summed into the carry).
"""
import numpy as np

from bench_all import timed


def main():
    import jax
    import jax.numpy as jnp
    from basic_dsp_tpu.ops import fourstep

    n = 1 << 22
    rng = np.random.default_rng(0)
    x_re = jnp.asarray(rng.normal(size=n).astype(np.float32))
    x_im = jnp.asarray(rng.normal(size=n).astype(np.float32))

    def xla(xr, xi, carry):
        X = jnp.fft.fft((xr + carry) + 1j * xi)
        return jnp.real(X) + jnp.imag(X)

    def four(xr, xi, carry, n1=2048):
        x = (xr + carry) + 1j * xi
        n2 = n // n1
        A = x.reshape(n1, n2)
        B = jnp.fft.fft(A, axis=0)
        k1 = np.arange(n1)[:, None]
        j2 = np.arange(n2)[None, :]
        tw_np = np.exp(-2j * np.pi * ((k1 * j2) % n) / n).astype(np.complex64)
        C = jnp.fft.fft(B * jnp.asarray(tw_np), axis=1)
        X = C.T.reshape(-1)
        return jnp.real(X) + jnp.imag(X)

    def mm64(xr, xi, carry, n1=64):
        n2 = n // n1
        Ar = (xr + carry).reshape(n1, n2)
        Ai = xi.reshape(n1, n2)
        Frn, Fin, Trn, Tin = fourstep._dif_planes(n1, n2)
        Fr = jnp.asarray(Frn)
        Fm = jnp.asarray(Fin - Frn)
        Fp = jnp.asarray(Fin + Frn)
        k1 = jnp.matmul(Fr, Ar + Ai, precision="highest")
        k2 = jnp.matmul(Fm, Ar, precision="highest")
        k3 = jnp.matmul(Fp, Ai, precision="highest")
        Br, Bi = k1 - k3, k1 + k2
        Tr, Ti = jnp.asarray(Trn), jnp.asarray(Tin)
        C = jax.lax.complex(Br * Tr - Bi * Ti, Br * Ti + Bi * Tr)
        D = jnp.fft.fft(C, axis=1)
        X = D.T.reshape(-1)
        return jnp.real(X) + jnp.imag(X)

    # correctness spot-check on-chip (small)
    ns = 1 << 14
    @jax.jit
    def check(xr, xi):
        x = xr + 1j * xi
        a = jnp.fft.fft(x)
        n1 = 64
        n2 = ns // n1
        Ar, Ai = jnp.real(x).reshape(n1, n2), jnp.imag(x).reshape(n1, n2)
        Frn, Fin, Trn, Tin = fourstep._dif_planes(n1, n2)
        k1 = jnp.matmul(jnp.asarray(Frn), Ar + Ai, precision="highest")
        k2 = jnp.matmul(jnp.asarray(Fin - Frn), Ar, precision="highest")
        k3 = jnp.matmul(jnp.asarray(Fin + Frn), Ai, precision="highest")
        Br, Bi = k1 - k3, k1 + k2
        Tr, Ti = jnp.asarray(Trn), jnp.asarray(Tin)
        C = jax.lax.complex(Br * Tr - Bi * Ti, Br * Ti + Bi * Tr)
        b = jnp.fft.fft(C, axis=1).T.reshape(-1)
        return jnp.max(jnp.abs(a - b)), jnp.max(jnp.abs(a))

    d, sc = check(x_re[:ns], x_im[:ns])
    print(f"mm64 parity (16k): rel {float(d)/float(sc):.3e}", flush=True)

    for name, fn in (("xla", xla), ("fourstep2048", four), ("mm64", mm64)):
        dt = timed(fn, x_re, x_im, iters=30) * 1e3
        print(f"{name:14s}: {dt:7.4f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
