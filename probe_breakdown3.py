"""Cumulative stage breakdown of the CURRENT flagship planar chain
(round 3; bench.py geometry: 4M, n1=64, exact + budget modes), with the
honest array-carry fold (bench_all.timed).  Per-stage cost = difference
of consecutive cumulative rows.

Stages (cumulative):
  fir        two planar Toeplitz FIRs + window
  stage1     + 3-dot Karatsuba DFT-64 over rows
  twiddle    + big twiddle on planes
  kernel     + Pallas row-FFT/shift/|.| kernel
  chain      + final magnitude transpose (the full chain)
"""
import sys

import numpy as np

from bench_all import timed


def main():
    import jax
    import jax.numpy as jnp

    from basic_dsp_tpu.ops import conv_ops, fourstep
    from basic_dsp_tpu.kernels import spectrum_pallas as sp
    from basic_dsp_tpu.windows import HammingWindow
    from basic_dsp_tpu.conv_types import RaisedCosineFunction

    n = 1 << 22
    m = 128
    n1 = 64
    n2 = n // n1
    rng = np.random.default_rng(0)
    x_re = jnp.asarray(rng.normal(size=n).astype(np.float32))
    x_im = jnp.asarray(rng.normal(size=n).astype(np.float32))
    rc = RaisedCosineFunction(0.35)
    tt = ((np.arange(m) - m // 2) * 0.25).astype(np.float32)
    taps_np = np.asarray(rc.calc(tt)).astype(np.float32)
    taps_np /= taps_np.sum()
    taps = jnp.asarray(taps_np)
    window = HammingWindow().sample(n, dtype=jnp.float32)
    Frn, Fin, Trn, Tin = fourstep._dif_planes(n1, n2)

    def parts(xr, xi, carry, upto, prec, kbudget):
        tf = taps.astype(xr.dtype)
        wf = window.astype(xr.dtype)
        xs = xr * (1.0 + carry * 1e-30)
        Ar = (conv_ops._toeplitz_body(xs, tf, prec) * wf).reshape(n1, n2)
        Ai = (conv_ops._toeplitz_body(xi, tf, prec) * wf).reshape(n1, n2)
        if upto == "fir":
            return Ar + Ai
        Fr = jnp.asarray(Frn)
        Fm = jnp.asarray(Fin - Frn)
        Fp = jnp.asarray(Fin + Frn)
        k1 = jnp.matmul(Fr, Ar + Ai, precision=prec)
        k2 = jnp.matmul(Fm, Ar, precision=prec)
        k3 = jnp.matmul(Fp, Ai, precision=prec)
        Br, Bi = k1 - k3, k1 + k2
        if upto == "stage1":
            return Br + Bi
        Tr, Ti = jnp.asarray(Trn), jnp.asarray(Tin)
        Cr = Br * Tr - Bi * Ti
        Ci = Br * Ti + Bi * Tr
        if upto == "twiddle":
            return Cr + Ci
        M = sp.rowfft_mag(Cr, Ci, shift=True, budget=kbudget)
        if upto == "kernel":
            return M
        return M.transpose(2, 1, 0).reshape(-1)

    for mode, prec, kbudget in (("exact", "highest", None),
                                ("high", "high", "high")):
        prev = 0.0
        for upto in ("fir", "stage1", "twiddle", "kernel", "chain"):
            def fn(xr, xi, carry, u=upto, p=prec, kb=kbudget):
                return parts(xr, xi, carry, u, p, kb)

            dt = timed(fn, x_re, x_im, iters=50) * 1e3
            print(f"{mode:5s} {upto:8s}: cum {dt:7.4f} ms  "
                  f"(stage {dt - prev:+7.4f})", flush=True)
            prev = dt


if __name__ == "__main__":
    main()
