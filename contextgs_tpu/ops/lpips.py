"""LPIPS perceptual metric (VGG16 backbone + linear heads), JAX.

Behavioral spec: the vendored lpipsPyTorch in the reference
(/root/reference/lpipsPyTorch/modules/lpips.py:8-35, networks.py:12-96) and the
pip `lpips` package the drivers actually use (ref train.py:50-51).

This environment has no network egress and no cached torchvision/lpips
weights, so the metric is *gated*: the architecture and scoring math are
implemented and tested with random weights; real evaluation requires pointing
CONTEXTGS_LPIPS_WEIGHTS at an .npz produced by `export_weights_from_torch`
(run it once on any machine with torchvision + lpips installed).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature slices used by LPIPS: conv blocks ending at relu1_2, relu2_2,
# relu3_3, relu4_3, relu5_3
_VGG_CFG = [
    (2, 64),    # block 1: 2 convs, 64 ch
    (2, 128),
    (3, 256),
    (3, 512),
    (3, 512),
]
# ImageNet normalization used by LPIPS' ScalingLayer
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPSWeights(NamedTuple):
    convs: tuple     # ((w [kh,kw,cin,cout], b [cout]), ...)
    lins: tuple      # per-stage 1x1 weights [c] (non-negative)


def load_weights(path: Optional[str] = None) -> Optional[LPIPSWeights]:
    """Load exported weights; returns None when unavailable (gated)."""
    path = path or os.environ.get("CONTEXTGS_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    convs = []
    i = 0
    while f"conv{i}_w" in data:
        convs.append((jnp.asarray(data[f"conv{i}_w"]),
                      jnp.asarray(data[f"conv{i}_b"])))
        i += 1
    lins = tuple(jnp.asarray(data[f"lin{j}"]) for j in range(5))
    return LPIPSWeights(convs=tuple(convs), lins=lins)


def random_weights(key: jax.Array) -> LPIPSWeights:
    """Random-initialized weights (for tests of the scoring math only)."""
    convs = []
    cin = 3
    keys = jax.random.split(key, 16)
    ki = 0
    for n_convs, cout in _VGG_CFG:
        for _ in range(n_convs):
            w = jax.random.normal(keys[ki], (3, 3, cin, cout)) * 0.05
            convs.append((w, jnp.zeros((cout,))))
            cin = cout
            ki += 1
    lins = tuple(jnp.abs(jax.random.normal(keys[15], (c,))) * 0.01
                 for _, c in _VGG_CFG)
    return LPIPSWeights(convs=tuple(convs), lins=lins)


def _vgg_features(w: LPIPSWeights, x: jnp.ndarray) -> list:
    """x [3,H,W] in [0,1] → list of 5 stage activations [C,h,w]."""
    h = ((x * 2 - 1) - _SHIFT[:, None, None]) / _SCALE[:, None, None]
    h = h[None]                                   # [1,3,H,W]
    feats = []
    ci = 0
    for bi, (n_convs, _) in enumerate(_VGG_CFG):
        for _ in range(n_convs):
            wgt, b = w.convs[ci]
            h = jax.lax.conv_general_dilated(
                h, wgt, (1, 1), "SAME",
                dimension_numbers=("NCHW", "HWIO", "NCHW"))
            h = jax.nn.relu(h + b[None, :, None, None])
            ci += 1
        feats.append(h[0])
        if bi < len(_VGG_CFG) - 1:
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
    return feats


def lpips(w: LPIPSWeights, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance between [3,H,W] images in [0,1]
    (ref lpipsPyTorch/modules/lpips.py:28-35: unit-normalize channel features,
    squared diff, 1x1 linear head, spatial mean, sum over stages)."""
    f1 = _vgg_features(w, img1)
    f2 = _vgg_features(w, img2)
    total = jnp.zeros(())
    for a, b, lin in zip(f1, f2, w.lins):
        na = a / jnp.maximum(jnp.linalg.norm(a, axis=0, keepdims=True), 1e-10)
        nb = b / jnp.maximum(jnp.linalg.norm(b, axis=0, keepdims=True), 1e-10)
        d = (na - nb) ** 2                        # [C,h,w]
        total = total + jnp.mean(jnp.sum(lin[:, None, None] * d, axis=0))
    return total


def export_weights_from_torch(out_path: str) -> None:  # pragma: no cover
    """Run on a machine with torchvision+lpips to produce the .npz this module
    loads (not runnable in this zero-egress container)."""
    import lpips as lpips_pkg  # type: ignore
    import torch

    net = lpips_pkg.LPIPS(net="vgg")
    arrs = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
            [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
            [m for m in net.net.slice5]
    i = 0
    for m in convs:
        if isinstance(m, torch.nn.Conv2d):
            arrs[f"conv{i}_w"] = m.weight.detach().permute(2, 3, 1, 0).numpy()
            arrs[f"conv{i}_b"] = m.bias.detach().numpy()
            i += 1
    for j, lin in enumerate(net.lins):
        arrs[f"lin{j}"] = lin.model[1].weight.detach()[0, :, 0, 0].numpy()
    np.savez(out_path, **arrs)
