"""Range-coder round-trip and compression-efficiency tests (pure host)."""

import numpy as np
import pytest
from scipy.stats import norm

from contextgs_tpu.compression import coder


def gaussian_cdf_rows(means, scales, lo, hi, q=1.0):
    """Float CDF rows over symbols lo..hi for per-element gaussians."""
    grid = np.arange(lo, hi + 2) - 0.5          # bin edges in symbol units
    x = grid[None, :] * q
    c = norm.cdf(x, means[:, None] * q, np.maximum(scales[:, None], 1e-9) * q)
    c = (c - c[:, :1]) / np.maximum(c[:, -1:] - c[:, :1], 1e-12)
    return np.clip(c, 0.0, 1.0)


def test_roundtrip_per_symbol_cdf(rng):
    n = 5000
    means = rng.normal(size=n) * 3
    scales = 0.5 + rng.random(n) * 2
    symbols_val = np.round(rng.normal(size=n) * 2 + means).astype(np.int64)
    lo, hi = int(symbols_val.min()) - 2, int(symbols_val.max()) + 2
    rows = coder.quantize_cdf(gaussian_cdf_rows(means, scales, lo, hi))
    syms = (symbols_val - lo).astype(np.int32)
    data = coder.encode(rows, syms)
    out = coder.decode(rows, data)
    np.testing.assert_array_equal(out, syms)
    # size close to the ideal entropy
    lik = norm.cdf(symbols_val + 0.5, means, scales) - \
        norm.cdf(symbols_val - 0.5, means, scales)
    ideal_bits = -np.log2(np.maximum(lik, 1e-9)).sum()
    assert len(data) * 8 < ideal_bits * 1.05 + 128, \
        f"{len(data)*8} vs ideal {ideal_bits}"


def test_roundtrip_shared_cdf_bernoulli(rng):
    n = 20000
    p = 0.83
    bits = (rng.random(n) < p).astype(np.int32)
    row = coder.quantize_cdf(np.array([0.0, 1 - p, 1.0]))
    data = coder.encode_shared(row, bits)
    out = coder.decode_shared(row, n, data)
    np.testing.assert_array_equal(out, bits)
    ideal = n * (-(p * np.log2(p) + (1 - p) * np.log2(1 - p)))
    assert len(data) * 8 < ideal * 1.05 + 128


def test_roundtrip_extreme_rows(rng):
    # nearly-degenerate CDFs (tiny scale → one dominant symbol)
    n = 1000
    means = np.zeros(n)
    scales = np.full(n, 1e-6)
    rows = coder.quantize_cdf(gaussian_cdf_rows(means, scales, -5, 5))
    syms = np.full(n, 5, np.int32)  # symbol 0 at offset 5
    data = coder.encode(rows, syms)
    np.testing.assert_array_equal(coder.decode(rows, data), syms)
    # all (valid) symbols remain decodable even with probability ~0
    syms2 = np.asarray(rng.integers(0, 11, n), np.int32)
    data2 = coder.encode(rows, syms2)
    np.testing.assert_array_equal(coder.decode(rows, data2), syms2)


def test_empty_stream():
    rows = np.zeros((0, 5), np.uint16)
    assert coder.encode(rows, np.zeros(0, np.int32)) == b""
    assert coder.decode(rows, b"").shape == (0,)
