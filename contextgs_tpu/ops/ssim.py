"""Windowed SSIM, JAX (behavioral spec: /root/reference/utils/loss_utils.py:17-63).

11x11 Gaussian window (sigma=1.5), per-channel depthwise convolution with
SAME-style padding of window//2, C1=0.01², C2=0.03², matching the reference's
torch implementation so the (1-SSIM) loss term is numerically comparable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=4)
def _gaussian_window(window_size: int, sigma: float):
    # numpy on purpose: this is cached across jit traces, so it must be a
    # constant, never a traced array
    import numpy as np

    x = np.arange(window_size, dtype=np.float32) - window_size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    w2d = np.outer(g, g)
    # stays numpy: jnp conversion inside a jit trace would stage a constant
    # tracer into the cache and leak it into later traces
    return (w2d / w2d.sum()).astype(np.float32)


def _filter2d(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2D conv, img [C,H,W], window [k,k], padding k//2 each side.

    precision=HIGHEST is load-bearing: TPU convs default to bf16 multiplies,
    and the variance terms below are computed as E[x²]−μ² — catastrophic
    cancellation at bf16 makes σ² wrong by ~1e-2, which flips the SSIM
    denominator near zero in flat image regions and blows the SSIM map up to
    ±100s (observed: "SSIM"=6.4 on valid [0,1] images at 512², which turned
    the (1−SSIM) loss term into gradient ASCENT and collapsed training at
    realistic scale — the r3 non-convergence root cause)."""
    c = img.shape[0]
    k = window.shape[0]
    lhs = img[None]                                    # [1,C,H,W]
    rhs = jnp.broadcast_to(window[None, None], (c, 1, k, k))
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    return out[0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over [C,H,W] images in [0,1]."""
    w = _gaussian_window(window_size, sigma)
    mu1 = _filter2d(img1, w)
    mu2 = _filter2d(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    # clamp: E[x²]−μ² is ≥ 0 mathematically; f32 rounding can leave a tiny
    # negative residue in perfectly flat windows (true σ² could never make
    # the denominator negative, so this is a pure numerical guard)
    sigma1_sq = jnp.maximum(_filter2d(img1 * img1, w) - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(_filter2d(img2 * img2, w) - mu2_sq, 0.0)
    sigma12 = _filter2d(img1 * img2, w) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return ssim_map.mean()


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(a - b).mean()


def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """PSNR over [C,H,W] in [0,1] (ref utils/image_utils.py:17-19)."""
    mse = jnp.mean((a - b) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))
