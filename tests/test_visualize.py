"""Tests for utils/visualize.py (numpy/PIL port of ref visualize_utils)."""

import numpy as np
import pytest

from contextgs_tpu.utils import visualize as vz


def test_to_rgb8_range_and_auto_minmax():
    x = np.array([[0.0, 0.5, 1.0]])
    u = vz.to_rgb8(x, x_max=1.0, x_min=0.0)
    assert u.dtype == np.uint8
    assert u[0, 0] == 0 and u[0, 2] == 255
    # auto min/max stretches to full range
    u2 = vz.to_rgb8(np.array([2.0, 4.0]))
    assert u2[0] == 0 and u2[1] == 255


def test_apply_jet_endpoints():
    m = vz.apply_jet(np.array([0, 128, 255], np.uint8))
    assert m.shape == (3, 3)
    # jet: low → blue-ish, mid → green-ish, high → red-ish
    assert m[0, 2] > m[0, 0] and m[1, 1] >= 200 and m[2, 0] > m[2, 2]


def test_array_to_image_shapes_and_modes():
    chw = np.random.default_rng(0).uniform(0, 1, (3, 8, 10)).astype(np.float32)
    img = vz.array_to_image(chw)
    assert img.shape == (8, 10, 3) and img.dtype == np.uint8
    # single channel broadcasts; 2D promotes
    img1 = vz.array_to_image(chw[0])
    assert img1.shape == (8, 10, 3)
    assert np.all(img1[..., 0] == img1[..., 1])
    # jet mode recolors
    imgj = vz.array_to_image(chw[:1], mode="jet")
    assert imgj.shape == (8, 10, 3)
    with pytest.raises(ValueError):
        vz.array_to_image(np.zeros((2, 4, 4)))
    # mask zeroes the output
    imgm = vz.array_to_image(chw, mask=np.zeros((8, 10), np.float32))
    assert imgm.max() == 0


def test_add_label_writes_pixels():
    pytest.importorskip("PIL")
    img = np.zeros((64, 128, 3), np.uint8)
    out = vz.add_label_centered(img, "hello", color=(0, 255, 0))
    assert out.shape == img.shape
    assert out[..., 1].sum() > 0          # green text appeared
    out_b = vz.add_label_centered(img, "hello", alignment="bottom")
    assert out_b[..., 1].sum() > 0
    with pytest.raises(ValueError):
        vz.add_label_centered(img, "x", alignment="left")


def test_normals_flat_plane_points_at_camera():
    """A constant-depth plane: cross(vertical,horizontal) = -z·(2d/f)², and
    the reference negates (-n/||n||) → unit normals (0,0,+1) inside."""
    h, w = 16, 16
    depth = np.full((h, w), 2.0, np.float32)
    focal = np.array([[100.0, 0.0], [0.0, 100.0]], np.float32)
    princpt = np.array([w / 2, h / 2], np.float32)
    uv = np.stack(np.meshgrid(np.arange(w), np.arange(h), indexing="xy"),
                  axis=0).astype(np.float32)[None]
    pos = vz.depth_to_cam_positions(depth[None, None], uv, focal[None],
                                    princpt[None])
    assert pos.shape == (1, 3, h, w)
    np.testing.assert_allclose(pos[0, 2], depth)
    n = vz.normals_from_positions(pos)
    inner = n[0, :, 2:-2, 2:-2]
    # norm+1e-5 regularizer (kept from the reference) biases ~0.6% here
    np.testing.assert_allclose(inner[2], 1.0, atol=1e-2)
    np.testing.assert_allclose(inner[0], 0.0, atol=1e-4)
    img = vz.visualize_normal(depth, focal, princpt)
    assert img.shape == (h, w, 3)
