"""Blend math shared by the reference rasterizer and the Pallas kernels.

Constants and per-instance alpha evaluation follow the CUDA reference
rasterizer semantics (see ops/rasterize/projection.py docstring): gaussian
weight G = exp(power) with power ≤ 0, alpha = min(0.99, opacity·G), alphas
below 1/255 are skipped, and blending stops once transmittance would fall
below 1e-4 (the culprit instance excluded).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

ALPHA_EPS = 1.0 / 255.0
T_EPS = 1e-4
MAX_ALPHA = 0.99
LOG_T_EPS = math.log(T_EPS)


def alpha_from_power(power: jnp.ndarray, opacity: jnp.ndarray) -> jnp.ndarray:
    """power ≤ 0 gaussian exponent + opacity → blend alpha with CUDA skip rules."""
    gauss = jnp.exp(power)
    alpha = jnp.minimum(MAX_ALPHA, opacity * gauss)
    alpha = jnp.where(power > 0.0, 0.0, alpha)       # outside-ellipse guard
    alpha = jnp.where(alpha < ALPHA_EPS, 0.0, alpha)
    return alpha


def gaussian_power(dx: jnp.ndarray, dy: jnp.ndarray, conic_a, conic_b, conic_c):
    """-0.5 dᵀ Conic d with d = mean2d - pixel (broadcasting ok)."""
    return -0.5 * (conic_a * dx * dx + conic_c * dy * dy) - conic_b * dx * dy
