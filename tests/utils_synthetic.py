"""Synthetic scenes/cameras for tests: random gaussians in front of a camera."""

import numpy as np

from contextgs_tpu.scene.cameras import Camera


def make_test_camera(width=32, height=32, fov=1.0, R=None, T=None):
    R = np.eye(3) if R is None else R
    T = np.zeros(3) if T is None else T
    return Camera(uid=0, colmap_id=0, R=R, T=T, fov_x=fov, fov_y=fov,
                  image=None, width=width, height=height)


def make_random_gaussians(rng, n, z_range=(1.5, 5.0), xy_extent=0.8,
                          scale_range=(0.02, 0.12), opacity_range=(0.3, 1.0)):
    means = np.stack([
        rng.uniform(-xy_extent, xy_extent, n),
        rng.uniform(-xy_extent, xy_extent, n),
        rng.uniform(*z_range, n),
    ], axis=1).astype(np.float32)
    scales = rng.uniform(*scale_range, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacities = rng.uniform(*opacity_range, n).astype(np.float32)
    return means, scales, quats, colors, opacities
