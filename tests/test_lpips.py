"""LPIPS scoring-math tests (random weights; pretrained weights are gated)."""

import jax
import jax.numpy as jnp
import numpy as np

from contextgs_tpu.ops.lpips import load_weights, lpips, random_weights


def test_lpips_identity_and_symmetry(rng):
    w = random_weights(jax.random.PRNGKey(0))
    a = jnp.asarray(rng.random((3, 32, 32)).astype(np.float32))
    b = jnp.asarray(rng.random((3, 32, 32)).astype(np.float32))
    f = jax.jit(lambda x, y: lpips(w, x, y))
    assert float(f(a, a)) < 1e-8
    dab, dba = float(f(a, b)), float(f(b, a))
    assert np.isclose(dab, dba, rtol=1e-5)
    assert dab > 0
    # closer images score lower
    a2 = jnp.clip(a + 0.01 * (b - a), 0, 1)
    assert float(f(a, a2)) < dab


def test_lpips_weights_gated():
    assert load_weights("/nonexistent/path.npz") is None
