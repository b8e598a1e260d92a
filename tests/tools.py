"""Shared test fixtures, modeled on reference tests/tools/mod.rs:
seeded data generators, rich-diff assert helpers, and a parameterized
runner that exercises sizes on both the plain and the blocked/sharded code
paths (the reference's single-core vs multi-core analog)."""
import numpy as np


def assert_vector_eq(left, right, tol=1e-6, msg=""):
    left = np.asarray(left)
    right = np.asarray(right)
    assert left.shape == right.shape, (
        f"{msg}: shape {left.shape} != {right.shape}")
    diff = np.abs(left - right)
    bad = diff > tol
    if bad.any():
        idx = int(np.argmax(bad))
        raise AssertionError(
            f"{msg}: {int(bad.sum())}/{left.size} elements differ by >{tol}; "
            f"first at {idx}: {left.flat[idx]} != {right.flat[idx]} "
            f"(max diff {diff.max()})")


def create_data(seed, length, dtype=np.float64):
    rng = np.random.default_rng(seed)
    return rng.uniform(-10.0, 10.0, length).astype(dtype)


def create_complex_data(seed, points, dtype=np.complex128):
    rng = np.random.default_rng(seed)
    return (rng.uniform(-10.0, 10.0, points)
            + 1j * rng.uniform(-10.0, 10.0, points)).astype(dtype)


def multitone(seed, points, tones=4, dtype=np.float64):
    """Band-limited multi-tone signal (reference tools/mod.rs:189-212) —
    smooth enough for interpolation cross-checks."""
    rng = np.random.default_rng(seed)
    t = np.arange(points, dtype=dtype)
    out = np.zeros(points, dtype=dtype)
    for _ in range(tones):
        freq = rng.uniform(0.001, 0.05)
        phase = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(0.1, 1.0)
        out += (amp * np.sin(2 * np.pi * freq * t + phase)).astype(dtype)
    return out
