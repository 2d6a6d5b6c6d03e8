#!/usr/bin/env python
"""Write a 3D-consistent synthetic COLMAP scene for end-to-end drives.

Ground-truth images are rendered from a fixed random gaussian set with this
repo's own (oracle-checked) rasterizer; the gaussian means become the SfM
point cloud. Gives train.py a real multi-view-consistent target without any
external dataset (none exist in this container).

Usage: python scripts/make_synth_scene.py OUT_DIR [n_gauss] [n_cams] [res]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import numpy as np


def make_scene(out, n_gauss=3000, n_cams=54, res=128, seed=0):
    import jax.numpy as jnp
    from PIL import Image

    from contextgs_tpu.ops.rasterize import rasterize
    from contextgs_tpu.scene import colmap
    from contextgs_tpu.scene.cameras import Camera
    from contextgs_tpu.utils.graphics import fov_to_focal, rotmat_to_qvec

    rng = np.random.default_rng(seed)
    means = np.stack([rng.uniform(-1.2, 1.2, n_gauss),
                      rng.uniform(-1.0, 1.0, n_gauss),
                      rng.uniform(-1.2, 1.2, n_gauss)], 1).astype(np.float32)
    scales = rng.uniform(0.01, 0.05, (n_gauss, 3)).astype(np.float32)
    quats = rng.normal(size=(n_gauss, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    colors = rng.uniform(0, 1, (n_gauss, 3)).astype(np.float32)
    opac = rng.uniform(0.5, 1.0, n_gauss).astype(np.float32)
    g = tuple(map(jnp.asarray, (means, scales, quats, colors, opac)))

    os.makedirs(os.path.join(out, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(out, "images"), exist_ok=True)

    fov = 1.1
    focal = fov_to_focal(fov, res)
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", res, res,
                                   np.array([focal, focal, res / 2, res / 2]))}
    images = {}
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams
        # camera orbiting the scene at radius 4, looking at the origin
        campos = np.array([4.0 * np.sin(ang), 0.6 * np.sin(3 * ang),
                           4.0 * np.cos(ang)])
        fwd = -campos / np.linalg.norm(campos)
        up0 = np.array([0.0, 1.0, 0.0])
        right = np.cross(up0, fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        # world->cam rotation with rows (right, up, fwd); colmap convention
        Rwc = np.stack([right, up, fwd])
        T = -Rwc @ campos
        cam = Camera(uid=i, colmap_id=i + 1, R=Rwc.T, T=T, fov_x=fov,
                     fov_y=fov, image=None, width=res, height=res)
        img = rasterize(*g, world_view=jnp.asarray(cam.world_view),
                        full_proj=jnp.asarray(cam.full_proj),
                        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
                        width=res, height=res, bg=jnp.ones(3),
                        budget=1 << 17, chunk_size=128,
                        backend="pallas").image
        arr = np.clip(np.transpose(np.asarray(img), (1, 2, 0)), 0, 1)
        name = f"r_{i:03d}.png"
        Image.fromarray((arr * 255).astype(np.uint8)).save(
            os.path.join(out, "images", name))
        qw = rotmat_to_qvec(Rwc)
        images[i + 1] = colmap.ColmapImage(i + 1, qw, T, 1, name)

    colmap.write_cameras_binary(cams, os.path.join(out, "sparse/0/cameras.bin"))
    colmap.write_images_binary(images, os.path.join(out, "sparse/0/images.bin"))
    # jittered means as the SfM point stand-in
    pts = means + rng.normal(scale=0.01, size=means.shape).astype(np.float32)
    colmap.write_points3d_binary(pts, (colors * 255).astype(np.uint8),
                                 os.path.join(out, "sparse/0/points3D.bin"))
    print(f"wrote {out}: {n_gauss} gaussians, {n_cams} cams @ {res}px")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gs_scene"
    make_scene(out,
               n_gauss=int(sys.argv[2]) if len(sys.argv) > 2 else 3000,
               n_cams=int(sys.argv[3]) if len(sys.argv) > 3 else 54,
               res=int(sys.argv[4]) if len(sys.argv) > 4 else 128)
