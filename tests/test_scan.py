"""Pallas lane-cumsum kernels vs jnp.cumsum (exactness contracts)."""

import jax.numpy as jnp
import numpy as np

from contextgs_tpu.ops.scan import lane_cumsum


def test_lane_cumsum_i32_exact(rng):
    # packed forward-fill words: prefix values must be bit-exact i32
    x = rng.integers(-(2**28), 2**28, (2, 100_000)).astype(np.int32)
    out = np.asarray(lane_cumsum(jnp.asarray(x)))
    np.testing.assert_array_equal(out, np.cumsum(x, axis=1, dtype=np.int32))


def test_lane_cumsum_f32(rng):
    x = rng.normal(size=(8, 33_000)).astype(np.float32)
    out = np.asarray(lane_cumsum(jnp.asarray(x)))
    ref = np.cumsum(x.astype(np.float64), axis=1)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-3)


def test_lane_cumsum_1d_exclusive(rng):
    x = rng.integers(0, 1000, 5000).astype(np.int32)
    out = np.asarray(lane_cumsum(jnp.asarray(x), exclusive=True))
    ref = np.concatenate([[0], np.cumsum(x)[:-1]]).astype(np.int32)
    np.testing.assert_array_equal(out, ref)


def test_lane_cumsum_odd_sizes(rng):
    for n in (1, 127, 129, 4097):
        x = rng.integers(0, 100, (8, n)).astype(np.int32)
        out = np.asarray(lane_cumsum(jnp.asarray(x)))
        np.testing.assert_array_equal(out, np.cumsum(x, axis=1))
