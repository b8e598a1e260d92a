"""Planar complex representation for hostile runtimes.

Some TPU runtimes (the axon tunnel here) cannot pass complex arrays across
jit program boundaries (as inputs, outputs, or host transfers) — support is
intermittent at best.  In planar mode every complex array that would cross
a program boundary travels as a :class:`PlanarComplex` pytree of two real
planes; the complex view exists only *inside* traced computations.

The whole vector API funnels device computation through :func:`call`
(see vector.py), so enabling the mode is transparent to users.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_mode: Optional[bool] = None


_native_f64 = None


def complex_dtype_for(*dtypes):
    """Complex result dtype for the given operand dtypes, CAPPED at
    complex64 on backends without native f64.

    TPUs have no f64; the documented contract (docs/API.md, config.
    warn_if_no_native_f64) is that f64 flavors compute at f32 grade
    there.  The cap makes that literal: on the axon runtime an
    in-program f64->c128 convert is not merely slow, it ABORTS the
    process ("Unsupported CVT X64 expansion from f64 to c128",
    x64_rewriter.cc — measured 2026-08-19 via the f64 C-ABI facade)."""
    cd = jnp.result_type(*dtypes, jnp.complex64)
    if cd == jnp.dtype(jnp.complex128) and not _has_native_f64():
        from . import config
        strict = config.default_config().strict_f64
        if strict == "host":
            # f64 flavors keep their dtype; call() routes their
            # programs to the host CPU backend (true-f64 contract at
            # host speed — vector_types/mod.rs:121-123).
            return cd
        if strict:
            raise FloatingPointError(
                "strict_f64: a complex128 computation was requested on a "
                "backend without native f64 — it would silently compute "
                "at f32 grade (docs/API.md accuracy grades). Set "
                "DspConfig.strict_f64='host' to run f64 flavors on the "
                "host CPU backend, use the *_prec reductions (device "
                "double-float, f64-grade on any backend), or unset "
                "DspConfig.strict_f64.")
        return jnp.dtype(jnp.complex64)
    return cd


def f64_host_mode() -> bool:
    """True when f64-flavor programs must run on the host CPU backend:
    ``DspConfig.strict_f64 == "host"`` (the default) on a no-native-f64
    device, with x64 enabled.

    Inert while ``jax_enable_x64`` is off: without x64 the f64 dtypes do
    not exist (``device_put`` canonicalizes f64->f32 — round-4 advisor
    finding), so routing would silently store f32 under an f64 promise,
    and plain numpy inputs (f64 by default) would wrongly drag every
    vector onto the host."""
    from . import config
    return (config.default_config().strict_f64 == "host"
            and bool(jax.config.jax_enable_x64)
            and not _has_native_f64())


def _is_f64_family(a) -> bool:
    dt = getattr(a, "dtype", None)
    return dt is not None and jnp.dtype(dt) in (
        jnp.dtype(jnp.float64), jnp.dtype(jnp.complex128))


def _is_weak_scalar(a) -> bool:
    # Python-scalar-derived operands (weak-typed or 0-d) must not decide
    # host routing: under x64, ``jnp.asarray(1+2j)`` yields weak f64
    # planes, and treating them as f64-family would silently route an
    # all-f32 chain (e.g. scaling an f32 vector by a complex scalar) to
    # the host CPU — contradicting "f32 flavors stay on the accelerator"
    # (round-4 advisor finding).
    return bool(getattr(a, "weak_type", False)) or getattr(a, "ndim", None) == 0


def _wants_host(arrays) -> bool:
    for a in arrays:
        if is_planar(a):
            if _is_f64_family(a.re) and not _is_weak_scalar(a.re):
                return True
        elif _is_f64_family(a) and not _is_weak_scalar(a):
            return True
    return False


@functools.lru_cache(maxsize=1)
def _cpu_device():
    return jax.devices("cpu")[0]


def _has_native_f64() -> bool:
    global _native_f64
    if _native_f64 is None:
        try:
            _native_f64 = jax.devices()[0].platform != "tpu"
        except Exception:
            # Probe failed (backend init / tunnel outage): do NOT cache,
            # and answer the SAFE value — the capped (no-f64) behavior
            # only costs precision, whereas an un-capped f64->c128
            # convert hard-aborts the axon runtime (round-3 advisor
            # finding: latching True here defeated the cap permanently).
            return False
    return _native_f64


def set_planar_complex(enabled: bool) -> None:
    """Force planar-complex mode on/off (default: auto-detect axon)."""
    global _mode
    _mode = bool(enabled)


def planar_mode() -> bool:
    global _mode
    if _mode is None:
        env = os.environ.get("BDSP_PLANAR_COMPLEX")
        if env is not None:
            _mode = env not in ("", "0", "false")
        else:
            _mode = _detect_hostile_backend()
    return _mode


def _detect_hostile_backend() -> bool:
    """True if the default backend cannot move complex arrays across the
    host boundary (probe: tiny eager transfer round trip — no compile)."""
    try:
        names = set(getattr(jax._src.xla_bridge, "backends")().keys())
        if "axon" in names:
            return True
    except Exception:
        pass
    try:
        probe = jnp.asarray(np.ones(2, dtype=np.complex64))
        np.asarray(probe)  # forces the device round trip
        return False
    except Exception:
        return True


class PlanarComplex:
    """A complex array stored as two real planes (a jax pytree)."""

    __slots__ = ("re", "im")

    def __init__(self, re, im):
        self.re = re
        self.im = im

    # --- array-like surface used by the vector layer -------------------
    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    @property
    def dtype(self):
        return complex_dtype_for(self.re.dtype)

    def __getitem__(self, idx):
        return PlanarComplex(self.re[idx], self.im[idx])

    def __repr__(self):
        return f"PlanarComplex(shape={self.shape}, dtype={self.dtype})"


jax.tree_util.register_pytree_node(
    PlanarComplex,
    lambda p: ((p.re, p.im), None),
    lambda aux, children: PlanarComplex(*children))


def is_planar(x) -> bool:
    return isinstance(x, PlanarComplex)


def unwrap(x):
    """PlanarComplex -> complex array (inside a trace); passthrough else."""
    if is_planar(x):
        cdtype = complex_dtype_for(x.re.dtype)
        return x.re.astype(cdtype) + 1j * x.im.astype(cdtype)
    return x


def wrap(y, mode: bool):
    """complex array -> PlanarComplex when mode is on; recursive over
    tuples/lists."""
    if isinstance(y, (tuple, list)):
        return type(y)(wrap(v, mode) for v in y)
    if mode and hasattr(y, "dtype") and jnp.iscomplexobj(y):
        return PlanarComplex(jnp.real(y), jnp.imag(y))
    return y


def unwrap_planes(x):
    """Returns (re, im) planes for either representation (device ops)."""
    if is_planar(x):
        return x.re, x.im
    return call(jnp.real, x), call(jnp.imag, x)


def is_complex_repr(x) -> bool:
    """True if x represents complex data (either dtype or planar)."""
    return is_planar(x) or (hasattr(x, "dtype") and jnp.iscomplexobj(x))


@functools.lru_cache(maxsize=1024)
def _compiled(fn, mode: bool, static, _epoch: int, _salt: int = 0):
    """_epoch folds config.precision_epoch() into the cache key so that
    set_matmul_precision() immediately invalidates traced programs.
    _salt forces a fresh trace for host-callback (``_no_jit``) statics —
    their sampled values are baked into the jaxpr as constants, so a cache
    hit would silently reuse a previous call's samples."""
    @jax.jit
    def g(*arrays):
        args = [unwrap(a) for a in arrays]
        out = fn(*args, *static)
        return wrap(out, mode)

    return g


_nojit_salt = 0


def call(fn, *arrays, static=()):
    """Runs ``fn(*arrays, *static)`` under a cached jit with planar
    pack/unpack at the program boundary.  ``static`` entries are baked into
    the trace (must be hashable); ``arrays`` may be jnp arrays, Python
    scalars, or PlanarComplex.

    Host-callback statics (marked ``_no_jit``) are legal here because every
    argument they are sampled at is arange-derived and therefore concrete
    during tracing; each call retraces (see ``_salt``) so callbacks are
    re-sampled like the reference's per-call FFI evaluation."""
    mode = planar_mode()
    if mode:
        # Complex scalars must not become complex program inputs either.
        arrays = tuple(
            PlanarComplex(jnp.asarray(a.real), jnp.asarray(a.imag))
            if isinstance(a, complex) else a
            for a in arrays)
    if _wants_host(arrays) and f64_host_mode():
        # strict_f64="host": f64-flavor programs run on the host CPU
        # backend (jit follows committed argument placement), keeping
        # the reference's f64 compute contract on devices without
        # native f64.  device_put is a no-op for already-host arrays.
        dev = _cpu_device()
        arrays = tuple(jax.device_put(a, dev) if hasattr(a, "dtype")
                       or is_planar(a) else a
                       for a in arrays)
    from . import config
    salt = 0
    # _no_jit may sit on the object itself or (for bound-method statics
    # like fun.calc_freq) on the method's instance.
    if any(getattr(s, "_no_jit", False)
           or getattr(getattr(s, "__self__", None), "_no_jit", False)
           for s in static):
        global _nojit_salt
        _nojit_salt += 1
        salt = _nojit_salt
    return _compiled(fn, mode, tuple(static),
                     config.precision_epoch(), salt)(*arrays)


def to_host(x) -> np.ndarray:
    """Device -> host, transferring complex data as real planes."""
    if is_planar(x):
        return np.asarray(x.re) + 1j * np.asarray(x.im)
    if hasattr(x, "dtype") and jnp.iscomplexobj(x):
        re = np.asarray(call(jnp.real, x))
        im = np.asarray(call(jnp.imag, x))
        return re + 1j * im
    return np.asarray(x)


def from_host_complex(re, im):
    """Host real/imag -> device complex representation.

    The f64 dtype policy (strict_f64 raise / no-native-f64 cap) is applied
    HERE, eagerly: the jit path below is trace-cached, so a policy check
    inside the trace would be skipped whenever a compiled program is
    reused (a strict_f64 flip after warm-up would silently not raise)."""
    dt_re = getattr(re, "dtype", None) or np.asarray(re).dtype
    dt_im = getattr(im, "dtype", None) or np.asarray(im).dtype
    cdtype = complex_dtype_for(dt_re, dt_im)
    rdtype = np.zeros((), np.dtype(cdtype)).real.dtype
    if rdtype == np.dtype(np.float64) and f64_host_mode():
        # Keep f64 planes OFF the accelerator entirely: even the
        # host->device transfer of f64 data is unsupported on some
        # runtimes, and call() routes their programs to the CPU anyway.
        dev = _cpu_device()
        re = jax.device_put(np.asarray(re, rdtype), dev)
        im = jax.device_put(np.asarray(im, rdtype), dev)
    else:
        re = jnp.asarray(re).astype(rdtype)
        im = jnp.asarray(im).astype(rdtype)
    if planar_mode():
        return PlanarComplex(re, im)
    return call(_combine, re, im)


def _combine(re, im):
    cdtype = complex_dtype_for(re.dtype, im.dtype)
    return re.astype(cdtype) + 1j * im.astype(cdtype)


def real_dtype_of(x):
    if is_planar(x):
        return x.re.dtype
    return jnp.zeros((), x.dtype).real.dtype
