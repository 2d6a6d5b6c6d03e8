"""Straight-through quantizers (behavioral spec: /root/reference/utils/encodings.py).

All quantizers are identity in the backward pass (STE), implemented with
`stop_gradient` algebra rather than custom autograd classes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ANCHOR_ROUND_DIGITS = 16
Q_ANCHOR = 1.0 / (2 ** ANCHOR_ROUND_DIGITS - 1)
CLAMP_STEPS = 15_000  # ±15000·Q clamp window (ref encodings.py:12,207-210)


def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """round(x) with identity gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def ste_multistep(x: jnp.ndarray, q, x_mean=None) -> jnp.ndarray:
    """round(x/Q)·Q with STE and the reference's ±15000·Q clamp
    (ref encodings.py:203-216). `x_mean` recentres the clamp window the way
    Entropy_gaussian does (ref entropy_models.py:37-41) — the reference's
    STE_multistep clamps around 0, which is what x_mean=None reproduces."""
    lo = -CLAMP_STEPS * q
    hi = CLAMP_STEPS * q
    if x_mean is not None:
        lo, hi = x_mean + lo, x_mean + hi
    x = jnp.clip(x, jax.lax.stop_gradient(lo), jax.lax.stop_gradient(hi))
    return x + jax.lax.stop_gradient(jnp.round(x / q) * q - x)


def uniform_noise_quant(x: jnp.ndarray, q, key: jax.Array) -> jnp.ndarray:
    """Training-time quantization surrogate: x + U(-Q/2, Q/2)
    (ref gaussian_model.py:1610-1616)."""
    return x + (jax.random.uniform(key, x.shape, x.dtype) - 0.5) * q


def ste_binary(x: jnp.ndarray) -> jnp.ndarray:
    """sign(x) ∈ {−1,+1}; gradient passes only inside [−1,1]
    (ref encodings.py:183-200)."""
    out = jnp.where(x >= 0, 1.0, -1.0)
    mask = (jnp.abs(x) <= 1.0).astype(x.dtype)
    return x * mask + jax.lax.stop_gradient(out - x * mask)


def quantize_anchor(anchors: jnp.ndarray, min_v: jnp.ndarray, max_v: jnp.ndarray):
    """16-bit uniform quantization of anchor xyz into [min_v, max_v] with STE.

    Returns (dequantized anchors, integer codes). Ref encodings.py:219-231.
    """
    interval = (max_v - min_v) * Q_ANCHOR + 1e-6
    codes = jnp.clip(jnp.floor((anchors - min_v) / interval),
                     0, 2 ** ANCHOR_ROUND_DIGITS - 1)
    deq = codes * interval + min_v
    return anchors + jax.lax.stop_gradient(deq - anchors), \
        jax.lax.stop_gradient(codes).astype(jnp.uint32)


def mask_ste(mask_logit: jnp.ndarray, threshold: float = 0.01) -> jnp.ndarray:
    """Hard binary mask (sigmoid(m) > thresh) with sigmoid-gradient STE
    (ref gaussian_model.py:295-299: `get_mask`)."""
    s = jax.nn.sigmoid(mask_logit)
    hard = (s > threshold).astype(mask_logit.dtype)
    return s + jax.lax.stop_gradient(hard - s)
