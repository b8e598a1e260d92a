"""Per-stage channelizer profile + depthwise-conv FIR experiment (round 2).

The merged-stencil channelizer (channelizer.py) runs ~1.4 ms at 4M/1024ch
on v5e; the row-stencil FIR is ~1.0 ms of that, reading the 32 MB ext array
~10x (t+1 offset slices).  Candidate: lax.conv_general_dilated depthwise
over the row axis (feature_group_count=C, both complex planes as batch) —
XLA's conv emitter can block the input in VMEM and reuse it across taps.

Stages print: name, ms/iter (slope), Msamp/s.
"""
from __future__ import annotations

import sys
import time

import numpy as np

N = 1 << 22
C = 1024
ITERS = 30
REPS = 3


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from basic_dsp_tpu.parallel import channelizer as ch

    rng = np.random.default_rng(0)
    x_re = jnp.asarray(rng.normal(size=N).astype(np.float32))
    x_im = jnp.asarray(rng.normal(size=N).astype(np.float32))
    proto = jnp.asarray((np.hamming(C * 8) / C).astype(np.float32))
    TM = ch._merged_tap_rows(proto, C)          # (t+1, C)
    t = TM.shape[0] - 1
    S = N // C

    def ext_of(x):
        X = x.reshape(-1, C)
        return jnp.concatenate([jnp.zeros((t, C), X.dtype), X], axis=0)

    # ---- depthwise-conv FIR --------------------------------------------
    # u[s,c] = sum_p TM[p,c] * ext[s + t - p, c]  ==  VALID depthwise conv
    # with rhs[w,0,c] = TM[t-w, c], both complex planes in the batch dim.
    rhs = jnp.flip(TM, axis=0).reshape(t + 1, 1, C)

    def fir_depthwise(ext):
        lhs = jnp.stack([jnp.real(ext), jnp.imag(ext)], axis=0)  # (2,S+t,C)
        out = jax.lax.conv_general_dilated(
            lhs, rhs.astype(lhs.dtype), window_strides=(1,),
            padding="VALID", dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=C, precision="highest")
        return jax.lax.complex(out[0], out[1])                   # (S, C)

    def fir_merged(ext):
        s = ext.shape[0] - t
        tr = TM.astype(ext.dtype)
        u = ext[t: t + s] * tr[0][None, :]
        for p in range(1, t + 1):
            u = u + ext[t - p: t - p + s] * tr[p][None, :]
        return u

    # parity check at small size
    @jax.jit
    def _check(xr, xi):
        ext = ext_of((xr + 1j * xi))
        a = fir_merged(ext)[:32]
        errs = []
        for f in (fir_depthwise,):
            b = f(ext)[:32]
            errs.append(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
        return tuple(errs)

    errs = _check(x_re[: C * 32], x_im[: C * 32])
    print("# vs merged rel err: dw {:.2e}"
          .format(*[float(e) for e in errs]), flush=True)

    # ---- stages ---------------------------------------------------------
    def full_cur(x):
        return ch.channelize_and_demod(x, proto, C)

    def full_dw(x):
        y = fir_depthwise(ext_of(x))
        y = C * jnp.fft.ifft(y, axis=1)
        prev = jnp.concatenate([y[:1], y[:-1]], axis=0)
        return jnp.angle(y * jnp.conj(prev)).T

    def stage_fir_merged(x):
        return fir_merged(ext_of(x))

    def stage_fir_dw(x):
        return fir_depthwise(ext_of(x))

    def stage_ifft(x):
        return C * jnp.fft.ifft(x.reshape(S, C), axis=1)

    def stage_demod_t(x):
        y = x.reshape(S, C)
        prev = jnp.concatenate([y[:1], y[:-1]], axis=0)
        return jnp.angle(y * jnp.conj(prev)).T

    # ---- two-stage MXU DFT for the 1024-point minor-axis IFFT ----------
    # C = c1*32 + c2; ifft factors into two 32-contractions + twiddle.
    # C*ifft(u)[k] = sum_c u[c] w^{+ck} (w = e^{2pi i/C}): with
    # c = 32*c1 + c2, k = k1 + 32*k2:  sum_c2 [w32^{c2 k2}] * T[c2, k1] *
    # (sum_c1 F32[c1, k1] u[.., c1, c2])  where F32[c1,k1]=w32^{c1 k1},
    # T[c2,k1] = w1024^{c2 k1}.
    r = 32
    F32 = np.exp(2j * np.pi * np.outer(np.arange(r), np.arange(r)) / r
                 ).astype(np.complex64)
    T32 = np.exp(2j * np.pi * np.outer(np.arange(r), np.arange(r)) / C
                 ).astype(np.complex64)
    F32j = (jnp.asarray(F32.real.copy()), jnp.asarray(F32.imag.copy()))
    T32j = (jnp.asarray(T32.real.copy()), jnp.asarray(T32.imag.copy()))

    def ifft_mxu(u):
        F = jax.lax.complex(*F32j)
        T = jax.lax.complex(*T32j)
        A = u.reshape(-1, r, r)                       # (S, c1, c2)
        B = jnp.einsum("sce,ck->sek", A, F.astype(u.dtype),
                       precision="highest")           # (S, c2, k1)
        Bt = B * T.astype(u.dtype)[None, :, :]
        Y = jnp.einsum("sek,em->smk", Bt, F.astype(u.dtype),
                       precision="highest")           # (S, k2, k1)
        return Y.reshape(-1, C)                       # flat k = k1 + 32*k2

    def full_mxu_ifft(x):
        ext = ext_of(x)
        s = ext.shape[0] - t
        tr = TM.astype(ext.dtype)
        u = ext[t: t + s] * tr[0][None, :]
        for p in range(1, t + 1):
            u = u + ext[t - p: t - p + s] * tr[p][None, :]
        y = ifft_mxu(u)
        prev = jnp.concatenate([y[:1], y[:-1]], axis=0)
        return jnp.angle(y * jnp.conj(prev)).T

    @jax.jit
    def _check2(xr, xi):
        u = (xr + 1j * xi).reshape(-1, C)
        a = C * jnp.fft.ifft(u, axis=1)
        b = ifft_mxu(u)
        return jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a))

    print("# ifft_mxu rel err {:.2e}".format(
        float(_check2(x_re[: C * 32], x_im[: C * 32]))), flush=True)

    def stage_ifft_mxu(x):
        return ifft_mxu(x.reshape(S, C))

    stages = {
        "full_current": (full_cur, True),
        "full_depthwise": (full_dw, True),
        "full_mxu_ifft": (full_mxu_ifft, True),
        "fir_merged": (stage_fir_merged, False),
        "fir_depthwise": (stage_fir_dw, False),
        "ifft_minor": (stage_ifft, False),
        "ifft_mxu": (stage_ifft_mxu, False),
        "demod_transpose": (stage_demod_t, True),
    }

    which = sys.argv[1:] or list(stages)

    for name in which:
        fn, real_out = stages[name]

        def make(iters):
            @jax.jit
            def run(xr, xi):
                x = xr + 1j * xi

                def body(_, carry):
                    x, fb = carry
                    out = fn(x * (1.0 + fb * 1e-30))
                    return x, jnp.abs(out.reshape(-1)[0])

                _, fb = jax.lax.fori_loop(0, iters, body,
                                          (x, jnp.float32(0.0)))
                return fb

            return run

        r1, r3 = make(ITERS), make(3 * ITERS)
        for _ in range(2):
            float(r1(x_re, x_im))
            float(r3(x_re, x_im))

        def med(r):
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(r(x_re, x_im))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[len(ts) // 2], (max(ts) - min(ts)) / min(ts)

        (t1, _), (t3, sp) = med(r1), med(r3)
        ms = (t3 - t1) / (2 * ITERS) * 1e3
        print(f"{name:18s} {ms:7.3f} ms/iter  {N / ms / 1e3:8.1f} Msamp/s  "
              f"(spread {sp * 100:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
