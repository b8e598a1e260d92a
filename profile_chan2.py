"""Round-3 honest cumulative stage profile of config #5 (1024-channel
channelizer + FM demod, 4M samples) with the bench_all array-carry fold.

Stages (cumulative): fir (depthwise conv) -> +ifft (channel DFT) ->
+demod (angle) -> +transpose (full chain).
"""
import numpy as np

from bench_all import timed


def main():
    import jax
    import jax.numpy as jnp

    from basic_dsp_tpu.parallel import channelizer as ch

    n = 1 << 22
    C = 1024
    rng = np.random.default_rng(0)
    x_re = jnp.asarray(rng.normal(size=n).astype(np.float32))
    x_im = jnp.asarray(rng.normal(size=n).astype(np.float32))
    proto = jnp.asarray((np.hamming(C * 8) / C).astype(np.float32))

    def stage(xr, xi, carry, upto):
        x = (xr + carry) + 1j * xi
        taps_merged = ch._merged_tap_rows(proto, C)
        t = taps_merged.shape[0] - 1
        X = x.reshape(-1, C)
        S = X.shape[0]
        ext = jnp.concatenate([jnp.zeros((t, C), X.dtype), X], axis=0)
        tp1 = taps_merged.shape[0]
        rhs = jnp.flip(taps_merged, axis=0).reshape(tp1, 1, C)
        lhs = jnp.stack([jnp.real(ext), jnp.imag(ext)], axis=0)
        out = jax.lax.conv_general_dilated(
            lhs, rhs.astype(lhs.dtype), window_strides=(1,),
            padding="VALID", dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=C, precision="highest")
        if upto == "fir":
            return out[0, :S] + out[1, :S]
        u = jax.lax.complex(out[0, :S], out[1, :S])
        y = C * jnp.fft.ifft(u, axis=1)
        if upto == "ifft":
            return jnp.real(y) + jnp.imag(y)
        prev = jnp.concatenate([y[:1], y[:-1]], axis=0)
        ang = jnp.angle(y * jnp.conj(prev))
        if upto == "demod":
            return ang
        return ang.T

    prev_dt = 0.0
    for upto in ("fir", "ifft", "demod", "chain"):
        def fn(xr, xi, carry, u=upto):
            return stage(xr, xi, carry, u)

        dt = timed(fn, x_re, x_im, iters=30) * 1e3
        print(f"{upto:6s}: cum {dt:7.4f} ms (stage {dt - prev_dt:+7.4f})",
              flush=True)
        prev_dt = dt


if __name__ == "__main__":
    main()
