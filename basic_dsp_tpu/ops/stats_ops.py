"""Statistics, sums and dot products.

Behavioral parity with reference general/statistics.rs and
general/precise_stats.rs:

* real stats: sum/count/average, ``rms = sqrt(mean(x^2))``, min/max with the
  index of the first occurrence (statistics.rs:250-263).
* complex stats: min/max selected by norm; ``rms = sqrt(mean(x*x))`` with the
  *complex* square and complex sqrt (statistics.rs:340-353).
* ``statistics_split(len)``: stats over interleaved sub-sequences — element
  ``j`` contributes to bucket ``j % len`` with index ``j // len``
  (statistics.rs:398-429).  The reference caps ``len <= 16``
  (STATS_VEC_CAPACTIY); we keep the same cap for API parity.
* ``sum_sq`` squares complex values with the complex product
  (statistics.rs:532-561).
* ``*_prec`` variants accumulate in f64 — the TPU substitute for the
  reference's Kahan/Neumaier compensation (precise_stats.rs:120-124) with at
  least the same accuracy contract.

Everything returns a pytree of scalars so the results psum/merge cleanly
across shards — the merge semantics (statistics.rs:211-250) are what the
reference already uses for its per-thread partials, i.e. they are
shard-ready by construction.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .. import _planar

STATS_VEC_CAPACITY = 16


@dataclasses.dataclass
class Statistics:
    """Statistics about numeric data (reference statistics.rs:11-31)."""

    sum: Any
    count: int
    average: Any
    rms: Any
    min: Any
    min_index: int
    max: Any
    max_index: int

    @classmethod
    def empty(cls) -> "Statistics":
        """Reference Stats::empty (statistics.rs:185-196)."""
        return cls(sum=0.0, count=0, average=0.0, rms=0.0,
                   min=float("inf"), min_index=0, max=float("-inf"),
                   max_index=0)

    @classmethod
    def invalid(cls) -> "Statistics":
        """Reference Stats::invalid (statistics.rs:198-209)."""
        nan = float("nan")
        return cls(sum=0.0, count=0, average=nan, rms=nan, min=nan,
                   min_index=0, max=nan, max_index=0)


def _as_stats(sum_, count, average, rms, min_, min_idx, max_, max_idx):
    return Statistics(sum=sum_, count=int(count), average=average, rms=rms,
                      min=min_, min_index=int(min_idx), max=max_,
                      max_index=int(max_idx))


def _minmax_keys(key: jnp.ndarray):
    """NaN-skipping min/max keys, pinned to the reference's strict-compare
    update (statistics.rs:250-263: ``elem > max`` / ``elem < min`` are false
    for NaN, so NaN never becomes min/max — only sum/rms get poisoned).
    All-NaN input leaves min=+inf / max=-inf at index 0, exactly like the
    reference's untouched ``Stats::empty`` fields."""
    nan = jnp.isnan(key)
    inf = jnp.array(jnp.inf, dtype=key.dtype)
    return jnp.where(nan, inf, key), jnp.where(nan, -inf, key)


def _real_stats_arrays(x: jnp.ndarray):
    n = x.shape[-1]
    s = jnp.sum(x, axis=-1)
    sq = jnp.sum(x * x, axis=-1)
    kmin, kmax = _minmax_keys(x)
    mn_i = jnp.argmin(kmin, axis=-1)
    mx_i = jnp.argmax(kmax, axis=-1)
    return (s, s / n, jnp.sqrt(sq / n),
            jnp.min(kmin, axis=-1), mn_i, jnp.max(kmax, axis=-1), mx_i)


def _complex_stats_arrays(x: jnp.ndarray):
    n = x.shape[-1]
    s = jnp.sum(x, axis=-1)
    sq = jnp.sum(x * x, axis=-1)
    kmin, kmax = _minmax_keys(jnp.abs(x))
    mn_i = jnp.argmin(kmin, axis=-1)
    mx_i = jnp.argmax(kmax, axis=-1)
    return (s, s / n, jnp.sqrt(sq / n),
            jnp.take_along_axis(x, mn_i[..., None], axis=-1)[..., 0], mn_i,
            jnp.take_along_axis(x, mx_i[..., None], axis=-1)[..., 0], mx_i)


def _host_scalar(v):
    """Planar-aware scalar fetch."""
    h = _planar.to_host(v)
    if np.iscomplexobj(h):
        return complex(h)
    return h.item() if hasattr(h, "item") else h


def statistics(x: jnp.ndarray, is_complex: bool) -> Statistics:
    """Single-pass statistics (reference statistics.rs:365-386, 589-611)."""
    n = x.shape[-1]
    if n == 0:
        nan = complex("nan") if is_complex else float("nan")
        zero = 0j if is_complex else 0.0
        return Statistics(sum=zero, count=0, average=nan, rms=nan, min=nan,
                          min_index=0, max=nan, max_index=0)
    fn = _complex_stats_arrays if is_complex else _real_stats_arrays
    s, avg, rms, mn, mn_i, mx, mx_i = (
        _host_scalar(v) for v in _planar.call(fn, x))
    return _as_stats(s, n, avg, rms, mn, int(mn_i), mx, int(mx_i))


def statistics_split(x: jnp.ndarray, length: int, is_complex: bool):
    """Stats over ``length`` interleaved sub-sequences
    (reference statistics.rs:398-429, 623-655)."""
    if length == 0:
        return []
    rows = []
    for k in range(length):
        if _planar.is_planar(x):
            sub = _planar.PlanarComplex(x.re[..., k::length],
                                        x.im[..., k::length])
        else:
            sub = x[..., k::length]
        rows.append(statistics(sub, is_complex))
    return rows


def _sum(x):
    return jnp.sum(x, axis=-1)


def _sum_sq(x):
    return jnp.sum(x * x, axis=-1)


def sum_(x: jnp.ndarray):
    return _host_scalar(_planar.call(_sum, x))


def sum_sq(x: jnp.ndarray):
    """Sum of x*x; for complex data this is the complex square
    (reference statistics.rs:532-561)."""
    return _host_scalar(_planar.call(_sum_sq, x))


def _to_prec(x: jnp.ndarray) -> jnp.ndarray:
    """Widen to a 64-bit accumulator dtype when x64 is enabled; otherwise
    stay in f32 (the chunked host-combine path below supplies the accuracy
    on f32-only backends)."""
    if jnp.iscomplexobj(x):
        return x.astype(jnp.complex128) if jax.config.jax_enable_x64 else x
    return x.astype(jnp.float64) if jax.config.jax_enable_x64 else x


def _chunked_prec_sum(x: jnp.ndarray, square: bool):
    """Precise sum on f32-only backends (TPU): pull the exact f32 values to
    host and accumulate in f64 — the same contract as the reference's
    Kahan/Neumaier-compensated f64 accumulation of f32 inputs
    (precise_stats.rs:120-124, 622-660)."""
    h = _planar.to_host(x)
    h = h.astype(np.complex128 if np.iscomplexobj(h) else np.float64)
    if square:
        h = h * h
    s = h.sum(axis=-1)
    return complex(s) if np.iscomplexobj(h) else float(s)


def sum_prec(x: jnp.ndarray):
    """f64-accumulated sum (reference precise_stats.rs sum_prec)."""
    return _chunked_prec_sum(x, square=False)


def sum_sq_prec(x: jnp.ndarray):
    return _chunked_prec_sum(x, square=True)


def statistics_prec(x: jnp.ndarray, is_complex: bool) -> Statistics:
    base = statistics(x, is_complex)  # min/max/indices are exact already
    n = x.shape[-1]
    if n == 0:
        return base
    s = _chunked_prec_sum(x, square=False)
    sq = _chunked_prec_sum(x, square=True)
    rms = (sq / n) ** 0.5 if not is_complex else complex(sq / n) ** 0.5
    return Statistics(sum=s, count=n, average=s / n, rms=rms, min=base.min,
                      min_index=base.min_index, max=base.max,
                      max_index=base.max_index)


def statistics_split_prec(x: jnp.ndarray, length: int, is_complex: bool):
    rows = []
    for k in range(length):
        if _planar.is_planar(x):
            sub = _planar.PlanarComplex(x.re[..., k::length],
                                        x.im[..., k::length])
        else:
            sub = x[..., k::length]
        rows.append(statistics_prec(sub, is_complex))
    return rows


def _dot(x, y):
    return jnp.sum(x * y, axis=-1)


def dot_product(x: jnp.ndarray, y: jnp.ndarray):
    """Dot product WITHOUT conjugation — the reference multiplies complex
    element pairs directly (dot_products.rs:294-309)."""
    return _host_scalar(_planar.call(_dot, x, y))


def dot_product_prec(x: jnp.ndarray, y: jnp.ndarray):
    hx = _planar.to_host(x)
    hy = _planar.to_host(y)
    hx = hx.astype(np.complex128 if np.iscomplexobj(hx) else np.float64)
    hy = hy.astype(np.complex128 if np.iscomplexobj(hy) else np.float64)
    out = (hx * hy).sum(axis=-1)
    return complex(out) if np.iscomplexobj(out) else float(out)


def merge_stats(parts):
    """Merge partial Statistics (reference Stats::merge,
    statistics.rs:211-250) — the cross-shard reduction used by the
    distributed layer.  ``rms`` in partials must hold sqrt(mean sq) over the
    partial; we recombine via count-weighted mean of squares."""
    parts = [p for p in parts if p.count > 0]
    if not parts:
        nan = float("nan")
        return Statistics(sum=0.0, count=0, average=nan, rms=nan, min=nan,
                          min_index=0, max=nan, max_index=0)
    total = sum(p.count for p in parts)
    s = sum(p.sum for p in parts)
    sumsq = sum((p.rms ** 2) * p.count for p in parts)
    is_complex = any(isinstance(p.sum, complex) for p in parts)

    def key(v):
        return abs(v) if is_complex else v

    mn = min(parts, key=lambda p: key(p.min))
    mx = max(parts, key=lambda p: key(p.max))
    if is_complex:
        rms = complex(sumsq / total) ** 0.5
    else:
        rms = (sumsq / total) ** 0.5
    return Statistics(sum=s, count=total, average=s / total, rms=rms,
                      min=mn.min, min_index=mn.min_index, max=mx.max,
                      max_index=mx.max_index)


def merge_stats_cols(parts_list):
    """Merge several StatsVec (lists of per-bucket Statistics) column-wise
    (reference Stats::merge_cols, statistics.rs:150-169) — the cross-shard
    reduction for ``statistics_split`` partials."""
    if not parts_list:
        return []
    length = len(parts_list[0])
    return [merge_stats([parts[i] for parts in parts_list])
            for i in range(length)]
