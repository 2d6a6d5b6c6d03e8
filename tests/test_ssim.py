"""SSIM correctness (behavioral spec: /root/reference/utils/loss_utils.py:17-63).

The TPU regression here is load-bearing: XLA lowers f32 convs to bf16
multiplies at default precision, and SSIM's E[x²]−μ² variance form then
suffers catastrophic cancellation in low-variance (flat) windows — the
denominator flips near zero and the SSIM "mean" explodes (observed 6.4 on
valid [0,1] images at 512², which turned the (1−SSIM) loss term into gradient
ascent and collapsed at-scale training — the r3 non-convergence root cause).
ops/ssim.py pins Precision.HIGHEST; these tests pin the contract.
"""

import numpy as np
import pytest

from contextgs_tpu.ops.ssim import psnr, ssim
from tests.conftest import ON_TPU


def _torch_ssim(a, b, window_size=11, sigma=1.5):
    """Independent torch implementation of windowed SSIM (the metric's
    public definition; matches the reference's constants)."""
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(np.asarray(a)[None]).double()
    y = torch.from_numpy(np.asarray(b)[None]).double()
    c = x.shape[1]
    g = torch.exp(-((torch.arange(window_size).double()
                     - window_size // 2) ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    w = (g[:, None] @ g[None, :]).expand(c, 1, window_size, window_size)
    pad = window_size // 2
    mu1 = F.conv2d(x, w, padding=pad, groups=c)
    mu2 = F.conv2d(y, w, padding=pad, groups=c)
    s11 = F.conv2d(x * x, w, padding=pad, groups=c) - mu1 ** 2
    s22 = F.conv2d(y * y, w, padding=pad, groups=c) - mu2 ** 2
    s12 = F.conv2d(x * y, w, padding=pad, groups=c) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s11 + s22 + c2))
    return float(m.mean())


def _flat_blob_images(res=512, seed=0):
    """Mostly-flat images with a smooth blob — mild cancellation case."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / res
    blob = np.exp(-(((xx - 0.4) ** 2 + (yy - 0.55) ** 2) / 0.02))
    img1 = np.stack([0.4 * blob, 0.3 * blob, 0.5 * blob]).astype(np.float32)
    img2 = img1 + rng.normal(0, 0.03, img1.shape).astype(np.float32)
    return np.clip(img1, 0, 1), np.clip(img2, 0, 1)


def _smooth_gradient_images(res=512):
    """Smooth bright low-frequency images (noise-free) — the catastrophic
    cancellation trigger: per-window true variance ≪ bf16 rounding of
    E[x²]≈μ²≈0.25, so the old default-precision conv drove the SSIM
    denominator negative (map excursions to ±1e6 measured on real scene GTs;
    this synthetic pair reproduces mean>1 with map max ≈ 5900)."""
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / res
    base = 0.45 + 0.25 * np.sin(2 * np.pi * xx * 1.5) * np.cos(2 * np.pi * yy)
    a = np.stack([base, base * 0.9 + 0.05, base * 1.05]).astype(np.float32)
    b = (a * 0.85 + 0.05).astype(np.float32)
    return np.clip(a, 0, 1), np.clip(b, 0, 1)


def test_ssim_matches_torch_random():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    b = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    assert abs(float(ssim(a, b)) - _torch_ssim(a, b)) < 1e-4


def test_ssim_matches_torch_flat_regions():
    a, b = _flat_blob_images(res=128)
    assert abs(float(ssim(a, b)) - _torch_ssim(a, b)) < 1e-4


def test_ssim_bounded_above():
    # SSIM ≤ 1 for any pair of real images — the r3 collapse violated this
    a, b = _flat_blob_images(res=256, seed=2)
    assert float(ssim(a, b)) <= 1.0 + 1e-5
    assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)


@pytest.mark.tpu
@pytest.mark.skipif(not ON_TPU, reason="needs the real TPU chip")
def test_ssim_tpu_precision_regression():
    """On-chip: smooth bright 512² images must NOT blow past 1 (bf16-conv
    cancellation regression; requires Precision.HIGHEST in _filter2d).
    Without the fix this input yields mean≈1.03 with map max ≈ 5900."""
    a, b = _smooth_gradient_images(res=512)
    v = float(ssim(a, b))
    assert v <= 1.0 + 1e-4, f"SSIM exploded on TPU: {v}"
    assert abs(v - _torch_ssim(a, b)) < 5e-4


def test_psnr_basic():
    a = np.zeros((3, 8, 8), np.float32)
    b = np.full((3, 8, 8), 0.1, np.float32)
    assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-4)
