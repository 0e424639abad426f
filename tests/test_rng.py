"""Bit-exactness of the RNG primitives against a pure-integer oracle."""

import numpy as np

from spectral_tpu.ops import rng as jrng
from tests import oracle


def test_radical_inverse_bit_exact():
    ns = np.array([0, 1, 2, 3, 7, 100, 12345, 2**31, 2**32 - 1], dtype=np.uint32)
    got = np.asarray(jrng.radical_inverse(ns))
    want = np.array([oracle.radical_inverse(int(n)) for n in ns], dtype=np.float32)
    assert np.array_equal(got, want)


def test_hammersley_bit_exact():
    for n, cap in [(0, 10), (5, 10), (9, 10), (0, 1), (99, 100), (57, 1000)]:
        gx, gy = jrng.hammersley(np.uint32(n), np.uint32(cap))
        wx, wy = oracle.hammersley(n, cap)
        assert float(gx) == float(wx)
        assert float(gy) == float(wy)


def test_hammersley_documented_sequence():
    # reference doc comment (src/shader.rs:664-669) for N=10
    expected = [
        (0.05, 0.5), (0.15, 0.25), (0.25, 0.75), (0.35, 0.125), (0.45, 0.625),
        (0.55, 0.375), (0.65, 0.875), (0.75, 0.0625), (0.85, 0.5625), (0.95, 0.3125),
    ]
    for n, (ex, ey) in enumerate(expected):
        gx, gy = jrng.hammersley(np.uint32(n), np.uint32(10))
        assert abs(float(gx) - ex) < 1e-6
        assert float(gy) == ey


def test_pcg3d_bit_exact():
    rng = np.random.default_rng(42)
    xs = rng.integers(0, 2**32, size=64, dtype=np.uint32)
    ys = rng.integers(0, 2**32, size=64, dtype=np.uint32)
    zs = rng.integers(0, 2**32, size=64, dtype=np.uint32)
    gx, gy, gz = jrng.random_pcg3d(xs, ys, zs)
    for i in range(64):
        wx, wy, wz = oracle.random_pcg3d(int(xs[i]), int(ys[i]), int(zs[i]))
        assert float(gx[i]) == float(wx)
        assert float(gy[i]) == float(wy)
        assert float(gz[i]) == float(wz)


def test_pcg3d_range():
    x, y, z = jrng.random_pcg3d(
        np.arange(1000, dtype=np.uint32),
        np.arange(1000, 2000, dtype=np.uint32),
        np.full(1000, 7, dtype=np.uint32),
    )
    for a in (x, y, z):
        a = np.asarray(a)
        assert a.min() >= 0.0 and a.max() <= 1.0
        # crude uniformity check
        assert 0.4 < a.mean() < 0.6
