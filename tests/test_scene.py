"""Scene/data layer tests: camera math, PLY IO, COLMAP round trip, splits."""

import json
import os

import numpy as np
import pytest

from contextgs_tpu.scene import colmap
from contextgs_tpu.scene.cameras import Camera
from contextgs_tpu.scene.dataset_readers import (load_blender_scene,
                                                 load_colmap_scene)
from contextgs_tpu.scene.ply_io import (read_ply, read_point_cloud, write_ply,
                                        write_point_cloud)
from contextgs_tpu.utils.graphics import (focal_to_fov, fov_to_focal,
                                          perspective_projection,
                                          qvec_to_rotmat, rotmat_to_qvec,
                                          world_to_view)


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return qvec_to_rotmat(q)


def test_quaternion_roundtrip(rng):
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec_to_rotmat(q)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(rotmat_to_qvec(R), q, atol=1e-8)


def test_fov_focal_inverse():
    assert np.isclose(focal_to_fov(fov_to_focal(0.8, 640), 640), 0.8)


def test_projection_matrix_maps_frustum_corners():
    P = perspective_projection(0.01, 100.0, 0.9, 0.7)
    # a view-space point on the right frustum edge at znear maps to NDC x=1
    z = 0.01
    x = np.tan(0.45) * z
    hom = P @ np.array([x, 0, z, 1.0])
    ndc = hom[:3] / hom[3]
    assert np.isclose(ndc[0], 1.0, atol=1e-6)
    # w_clip must equal view z (z_sign=+1 convention)
    assert np.isclose(hom[3], z)


def test_camera_center_matches_inverse_pose(rng):
    R = random_rotation(rng)
    T = rng.normal(size=3)
    cam = Camera(uid=0, colmap_id=0, R=R, T=T, fov_x=0.9, fov_y=0.7,
                 image=None, width=64, height=48)
    # world->view in row-vector convention: [x,1] @ world_view = view coords
    c = np.concatenate([cam.camera_center, [1.0]])
    view = c @ cam.world_view
    np.testing.assert_allclose(view[:3], 0.0, atol=1e-5)


def test_ply_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(100, 3))
    rgb = (rng.random((100, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "pc.ply")
    write_point_cloud(p, xyz, rgb)
    xyz2, rgb2, normals = read_point_cloud(p)
    np.testing.assert_allclose(xyz2, xyz, atol=1e-6)
    np.testing.assert_allclose(rgb2 * 255, rgb, atol=0.5)
    assert normals.shape == (100, 3)


def test_ply_generic_fields(tmp_path, rng):
    fields = {"a": rng.normal(size=50).astype(np.float32),
              "b": rng.integers(0, 255, 50).astype(np.uint8)}
    p = str(tmp_path / "g.ply")
    write_ply(p, fields)
    out = read_ply(p)
    np.testing.assert_array_equal(out["a"], fields["a"])
    np.testing.assert_array_equal(out["b"], fields["b"])


def _write_synthetic_colmap(root, rng, n_cams=10, n_pts=200):
    sparse = os.path.join(root, "sparse/0")
    os.makedirs(sparse, exist_ok=True)
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 64, 48,
                                   np.array([60.0, 60.0, 32.0, 24.0]))}
    colmap.write_cameras_binary(cams, os.path.join(sparse, "cameras.bin"))
    images = {}
    for i in range(1, n_cams + 1):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        images[i] = colmap.ColmapImage(i, q, rng.normal(size=3), 1, f"im_{i:03d}.png")
    colmap.write_images_binary(images, os.path.join(sparse, "images.bin"))
    xyz = rng.normal(size=(n_pts, 3))
    rgb = rng.integers(0, 255, (n_pts, 3))
    colmap.write_points3d_binary(xyz, rgb, os.path.join(sparse, "points3D.bin"))
    return xyz


def test_colmap_binary_roundtrip(tmp_path, rng):
    xyz = _write_synthetic_colmap(str(tmp_path), rng)
    sparse = str(tmp_path / "sparse/0")
    cams = colmap.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 64
    images = colmap.read_images_binary(os.path.join(sparse, "images.bin"))
    assert len(images) == 10
    assert images[3].name == "im_003.png"
    xyz2, rgb2, _ = colmap.read_points3d_binary(os.path.join(sparse, "points3D.bin"))
    np.testing.assert_allclose(xyz2, xyz)


def test_colmap_scene_split(tmp_path, rng):
    _write_synthetic_colmap(str(tmp_path), rng, n_cams=16)
    info = load_colmap_scene(str(tmp_path), eval_split=True, load_images=False)
    # every 8th camera (sorted by name) is test (ref dataset_readers.py:170-171)
    assert len(info.test_cameras) == 2
    assert len(info.train_cameras) == 14
    assert info.radius > 0
    assert info.points.shape[1] == 3


def test_blender_scene(tmp_path, rng):
    try:
        from PIL import Image
    except ImportError:
        pytest.skip("PIL unavailable")
    root = str(tmp_path)
    frames = []
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    for i in range(3):
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0, 2 + i]
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})
        img = (rng.random((24, 32, 4)) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, f"train/r_{i}.png"))
    meta = {"camera_angle_x": 0.7, "frames": frames}
    for split in ("train", "test"):
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    info = load_blender_scene(root, white_background=True)
    assert len(info.train_cameras) == 3 and len(info.test_cameras) == 3
    cam = info.train_cameras[0]
    assert cam.image.shape == (24, 32, 3)
    assert cam.width == 32 and cam.height == 24
    # random init point cloud created
    assert info.points.shape == (10_000, 3)
