"""TPU smoke test: drives the high-level vector API on the default
backend (the real chip under axon) — one call per major op family.

This catches runtime-specific regressions that the CPU test suite can't
(e.g. complex host-boundary and eager-dispatch limitations).  Prints one
OK line per family; exits nonzero on the first failure.
"""
import sys

import numpy as np


def main():
    # Families run in a child process so a failure cannot poison the
    # caller's jax client.  NOTE: within the child, one failed device
    # computation can cascade on some runtimes — trust the FIRST FAIL
    # line; rerun to confirm later ones.
    import subprocess
    if "--family" not in sys.argv:
        out = subprocess.run([sys.executable, __file__, "--family"],
                             capture_output=True, text=True)
        sys.stdout.write(out.stdout)
        return out.returncode


def _run_families():
    import basic_dsp_tpu as bd

    rng = np.random.default_rng(0)
    n = 4096
    re = rng.normal(size=n).astype(np.float32)
    im = rng.normal(size=n).astype(np.float32)

    v = bd.interleave_to_complex_time_vec(re, im)
    r = bd.to_real_time_vec(re)

    checks = []

    def check(name, fn):
        try:
            fn()
            checks.append((name, "OK"))
            print(f"{name}: OK", flush=True)
        except Exception as e:
            checks.append((name, f"FAIL {e!r}"))
            print(f"{name}: FAIL {e!r}", flush=True)

    check("elementary", lambda: float(
        np.abs(v.scale(2.0 + 0j).add(v).to_numpy()).max()))
    check("trig", lambda: float(r.sin().cos().sum()))
    check("fft_roundtrip", lambda: float(
        np.abs(v.fft().ifft().to_numpy() - v.to_numpy()).max()))
    check("windowed_fft", lambda: float(
        v.windowed_fft(bd.HammingWindow()).magnitude().sum()))
    check("convolve_signal", lambda: float(np.abs(
        v.convolve_signal(bd.to_complex_time_vec(
            rng.normal(size=31).astype(np.complex64))).to_numpy()).max()))
    check("convolve_fn", lambda: float(np.abs(
        v.convolve(bd.SincFunction(), 0.5, 10).to_numpy()).max()))
    check("interpolatef", lambda: v.interpolatef(
        bd.SincFunction(), 1.5, 0.0, 10).points())
    check("interpolatei", lambda: v.interpolatei(
        bd.SincFunction(), 2).points())
    check("interpft", lambda: v.interpft(2 * n).points())
    check("correlate", lambda: float(np.abs(v.correlate(
        v.prepare_argument_padded()).to_numpy()).max()))
    check("statistics", lambda: v.statistics().count)
    check("sum_prec", lambda: r.sum_prec())
    check("matrix_mimo", lambda: _matrix_check(bd, rng))
    check("sfft", lambda: bd.to_real_time_vec(
        rng.normal(size=1001).astype(np.float32)).plain_sfft().points())

    bad = [c for c in checks if c[1] != "OK"]
    print(f"{len(checks) - len(bad)}/{len(checks)} families OK")
    return 1 if bad else 0


def _matrix_check(bd, rng):
    data = (rng.normal(size=(2, 512)) + 1j * rng.normal(size=(2, 512)))
    re = np.ascontiguousarray(data.real.astype(np.float32))
    im = np.ascontiguousarray(data.imag.astype(np.float32))
    rows = [bd.interleave_to_complex_time_vec(re[i], im[i]) for i in range(2)]
    mat = bd.from_rows(rows)
    imp = rng.normal(size=(2, 2, 5)).astype(np.float32)
    out = mat.convolve_mat(imp)
    return float(np.abs(out.to_numpy()).max())


if __name__ == "__main__":
    if "--family" in sys.argv:
        sys.exit(_run_families())
    sys.exit(main())
