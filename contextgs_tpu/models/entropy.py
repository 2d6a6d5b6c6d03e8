"""Entropy models: conditional-gaussian rate estimator, Bernoulli mask rate,
and a learned factorized prior (the compressai EntropyBottleneck replacement).

Behavioral spec: /root/reference/utils/entropy_models.py:30-156 and compressai's
EntropyBottleneck as used at /root/reference/scene/gaussian_model.py:135,1556
(forward only — the reference never optimizes the aux/quantile loss, so medians
stay at their init of 0 and quantization is plain rounding).

All functions are pure; the factorized prior's parameters live in an explicit
pytree so they join the main optimizer like any other parameter group.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from contextgs_tpu.models.quant import CLAMP_STEPS

LIKELIHOOD_BOUND = 1e-6
_LOG2 = math.log(2.0)


def low_bound(x: jnp.ndarray, bound: float = LIKELIHOOD_BOUND) -> jnp.ndarray:
    """clamp(x, min=bound); gradient passes if x >= bound OR the gradient pushes
    x up (ref entropy_models.py:141-156, Low_bound)."""

    @jax.custom_vjp
    def f(x):
        return jnp.maximum(x, bound)

    def fwd(x):
        return jnp.maximum(x, bound), x

    def bwd(x, g):
        pass_through = (x >= bound) | (g < 0)
        return (jnp.where(pass_through, g, 0.0),)

    f.defvjp(fwd, bwd)
    return f(x)


def _std_normal_cdf(x):
    return 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def gaussian_bits(x: jnp.ndarray, mean: jnp.ndarray, scale: jnp.ndarray,
                  q, x_mean=None) -> jnp.ndarray:
    """Per-element bits under N(mean, scale) integrated over the Q-bin
    (ref Entropy_gaussian, entropy_models.py:30-50): clamps x to
    x_mean ± 15000·Q, scale to ≥1e-9, likelihood low-bounded at 1e-6."""
    if x_mean is not None:
        lo = jax.lax.stop_gradient(x_mean - CLAMP_STEPS * q)
        hi = jax.lax.stop_gradient(x_mean + CLAMP_STEPS * q)
        x = jnp.clip(x, lo, hi)
    scale = jnp.maximum(scale, 1e-9)
    upper = _std_normal_cdf((x + 0.5 * q - mean) / scale)
    lower = _std_normal_cdf((x - 0.5 * q - mean) / scale)
    likelihood = low_bound(jnp.abs(upper - lower))
    return -jnp.log(likelihood) / _LOG2


def bernoulli_bits(x: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Bits of ±1 symbols under P(+1)=p (ref Entropy_bernoulli,
    entropy_models.py:53-64)."""
    p = jnp.clip(p, 1e-6, 1 - 1e-6)
    pos = (1 + x) / 2.0
    neg = (1 - x) / 2.0
    return (-jnp.log(p) * pos - jnp.log(1 - p) * neg) / _LOG2


def binary_grid_size_bits(mask: jnp.ndarray, valid=None):
    """Ideal Bernoulli bit count of a {0,1} grid + 32 bits for the probability
    (ref get_binary_vxl_size, encodings.py:15-32). Returns (p, total_bits)."""
    if valid is None:
        total = mask.size
        pos = mask.sum()
    else:
        total = valid.sum()
        pos = (mask * valid).sum()
    p = jnp.clip(pos / jnp.maximum(total, 1), 1e-6, 1 - 1e-6)
    bits = pos * (-jnp.log(p)) / _LOG2 + (total - pos) * (-jnp.log(1 - p)) / _LOG2
    return p, bits + 32.0


# ---------------------------------------------------------------------------
# Learned factorized prior (EntropyBottleneck replacement)
# ---------------------------------------------------------------------------

class FactorizedPrior(NamedTuple):
    """Per-channel monotone CDF network c(x) = sigmoid(g_K(...g_1(x)...)).

    matrices[i]: [C, f_{i+1}, f_i]; biases[i]: [C, f_{i+1}, 1];
    factors[i]: [C, f_{i+1}, 1] (absent for the last layer).
    """

    matrices: tuple
    biases: tuple
    factors: tuple


def init_factorized_prior(key: jax.Array, channels: int,
                          filters=(3, 3, 3, 3), init_scale: float = 10.0
                          ) -> FactorizedPrior:
    """Matches compressai's EntropyBottleneck init (and the vendored
    Entropy_factorized, ref entropy_models.py:67-105): matrices filled with
    log(expm1(1/scale/f)), biases U(-0.5, 0.5), factors zero."""
    dims = (1,) + tuple(filters) + (1,)
    scale = init_scale ** (1.0 / (len(filters) + 1))
    matrices, biases, factors = [], [], []
    keys = jax.random.split(key, len(filters) + 1)
    for i in range(len(filters) + 1):
        init = math.log(math.expm1(1.0 / scale / dims[i + 1]))
        matrices.append(jnp.full((channels, dims[i + 1], dims[i]), init,
                                 jnp.float32))
        biases.append(jax.random.uniform(keys[i],
                                         (channels, dims[i + 1], 1),
                                         jnp.float32, -0.5, 0.5))
        if i < len(filters):
            factors.append(jnp.zeros((channels, dims[i + 1], 1), jnp.float32))
    return FactorizedPrior(tuple(matrices), tuple(biases), tuple(factors))


def _logits_cumulative(prior: FactorizedPrior, x: jnp.ndarray) -> jnp.ndarray:
    """x: [C, 1, N] → logits [C, 1, N] (ref entropy_models.py:107-123)."""
    logits = x
    n_layers = len(prior.matrices)
    for i in range(n_layers):
        m = jax.nn.softplus(prior.matrices[i])
        logits = jnp.einsum("cij,cjn->cin", m, logits) + prior.biases[i]
        if i < len(prior.factors):
            logits = logits + jnp.tanh(prior.factors[i]) * jnp.tanh(logits)
    return logits


def factorized_likelihood(prior: FactorizedPrior, x: jnp.ndarray) -> jnp.ndarray:
    """Likelihood of x [N, C] under the factorized prior (Q=1 bins), with the
    sign trick for numerical stability (ref entropy_models.py:125-142 /
    compressai EntropyBottleneck._likelihood)."""
    xt = x.T[:, None, :]                                 # [C,1,N]
    lower = _logits_cumulative(prior, xt - 0.5)
    upper = _logits_cumulative(prior, xt + 0.5)
    sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
    likelihood = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
    return low_bound(likelihood[:, 0, :].T)              # [N,C]


def factorized_forward(prior: FactorizedPrior, x: jnp.ndarray, key, training: bool):
    """(noisy or rounded) latent + its likelihood, mirroring
    compressai.EntropyBottleneck.forward with medians fixed at 0
    (ref gaussian_model.py:1556)."""
    if training:
        y = x + (jax.random.uniform(key, x.shape, x.dtype) - 0.5)
    else:
        y = x + jax.lax.stop_gradient(jnp.round(x) - x)
    return y, factorized_likelihood(prior, y)


def factorized_pmf_table(prior: FactorizedPrior, min_sym: int, max_sym: int
                         ) -> jnp.ndarray:
    """PMF of each integer symbol in [min_sym, max_sym] per channel → [C, S].

    Used by the codec to build rANS CDF tables (replaces compressai's
    EntropyBottleneck.update(), ref gaussian_model.py:1016)."""
    grid = jnp.arange(min_sym, max_sym + 1, dtype=jnp.float32)
    c = prior.matrices[0].shape[0]
    xt = jnp.broadcast_to(grid[None, None, :], (c, 1, grid.shape[0]))
    lower = _logits_cumulative(prior, xt - 0.5)
    upper = _logits_cumulative(prior, xt + 0.5)
    sign = -jnp.sign(lower + upper)
    pmf = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
    return pmf[:, 0, :]                                  # [C,S]
