"""A/B: complex-tap Toeplitz FIR (config #2's path) — XLA complex matmul
(4 real dots per shift) vs planar 3-dot Karatsuba with traced tap planes.
4M complex64, 128 complex taps.
"""
import numpy as np

from bench_all import timed


def main():
    import jax
    import jax.numpy as jnp
    from basic_dsp_tpu.ops import conv_ops

    n = 1 << 22
    m = 128
    rng = np.random.default_rng(0)
    x_re = jnp.asarray(rng.normal(size=n).astype(np.float32))
    x_im = jnp.asarray(rng.normal(size=n).astype(np.float32))
    h_re = jnp.asarray(rng.normal(size=m).astype(np.float32) / m)
    h_im = jnp.asarray(rng.normal(size=m).astype(np.float32) / m)

    def cur(xr, xi, carry):
        x = (xr + carry) + 1j * xi
        h = h_re + 1j * h_im
        return conv_ops.toeplitz_conv(x, h, True)

    def karat(xr, xi, carry):
        # planar Karatsuba complex Toeplitz: same clip/extension math as
        # _toeplitz_body, 3 real matmuls per shift instead of XLA's
        # complex-dot lowering
        xr = xr + carry
        start, length, c = conv_ops._clip_kernel(n, m)
        qr = h_re[start:start + length][::-1]
        qi = h_im[start:start + length][::-1]
        m_eff = length
        R = -(-n // 128)
        n_shifts = -(-(m_eff + 127) // 128)
        need = R * 128 + 128 * n_shifts
        k = (m_eff - c) % n

        def ext_of(v):
            pieces = [v[n - k:]] if k else []
            rem = need - k
            while rem > 0:
                take = min(rem, n)
                pieces.append(v[:take])
                rem -= take
            return jnp.concatenate(pieces, axis=-1)

        extr, exti = ext_of(xr), ext_of(xi)
        j = np.arange(128)[:, None]
        col = np.arange(128)[None, :]
        outr = jnp.zeros((R * 128,), jnp.float32)
        outi = jnp.zeros((R * 128,), jnp.float32)
        for a in range(n_shifts):
            e = 128 * a + j - col
            mask = (e >= 0) & (e < m_eff)
            idx = np.where(mask, e, 0)
            mj = jnp.asarray(mask)
            Tar = jnp.where(mj, qr[idx], 0.0)
            Tai = jnp.where(mj, qi[idx], 0.0)
            Tam = Tai - Tar
            Tap = Tai + Tar
            br = extr[128 * a: 128 * a + R * 128].reshape(R, 128)
            bi = exti[128 * a: 128 * a + R * 128].reshape(R, 128)
            k1 = jnp.matmul(br + bi, Tar, precision="highest")
            k2 = jnp.matmul(br, Tam, precision="highest")
            k3 = jnp.matmul(bi, Tap, precision="highest")
            outr = outr + (k1 - k3).reshape(-1)
            outi = outi + (k1 + k2).reshape(-1)
        return outr[:n] + outi[:n]

    # parity at the full size (plane-sum proxy)
    @jax.jit
    def check(xr, xi):
        x = xr + 1j * xi
        a = conv_ops.toeplitz_conv(x, h_re + 1j * h_im, True)
        return jnp.real(a) + jnp.imag(a)

    @jax.jit
    def check2(xr, xi):
        return karat(xr, xi, jnp.zeros_like(xr))

    a = check(x_re, x_im)
    b = check2(x_re, x_im)
    d = float(jnp.max(jnp.abs(a - b)))
    sc = float(jnp.max(jnp.abs(a)))
    print(f"karatsuba parity: rel {d / sc:.3e}", flush=True)

    for name, fn in (("xla_complex", cur), ("karatsuba3", karat)):
        dt = timed(fn, x_re, x_im, iters=30) * 1e3
        print(f"{name:12s}: {dt:7.4f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
