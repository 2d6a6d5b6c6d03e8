#!/usr/bin/env python
"""Build a hard synthetic benchmark scene (VERDICT r1 next-round #2).

No external datasets exist in this container, so quality validation uses a
textured, occlusion-heavy synthetic scene whose ground truth is rendered by
this repo's own oracle-checked rasterizer from a dense gaussian set:

- geometry: a textured room (floor + 3 walls) + a central textured sphere +
  a torus-like ring + floating semi-transparent occluder blobs
- >= 60k ground-truth gaussians with procedural high-frequency textures
- N cameras on a jittered orbit looking at the scene center (written as a
  binary COLMAP model, ref scene/dataset_readers.py:142-200 reads it back)
- SfM stand-in: noisy subsample of the true gaussian means (points3D.bin)

Usage:
  python scripts/make_synth_scene.py --out /tmp/bench_scene \
      [--res 512] [--cams 120] [--gauss 80000] [--points 120000]
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import numpy as np


def tex(p, k1, k2, phase):
    """Procedural high-frequency rgb texture over 3D points [N,3]."""
    a = np.sin(p[:, 0] * k1 + phase) * np.cos(p[:, 1] * k2)
    b = np.sin((p[:, 1] + p[:, 2]) * k2 * 0.7 + 2 * phase)
    c = ((np.floor(p[:, 0] * k1) + np.floor(p[:, 2] * k1)) % 2)  # checker
    rgb = np.stack([0.5 + 0.45 * a, 0.5 + 0.45 * b, 0.2 + 0.75 * c], 1)
    return np.clip(rgb, 0, 1)


def surface_gaussians(rng, n, kind, extent=2.0):
    if kind == "floor":
        p = np.stack([rng.uniform(-extent, extent, n),
                      np.full(n, -1.0),
                      rng.uniform(-extent, extent, n)], 1)
        s = np.stack([np.full(n, 0.035), np.full(n, 0.008),
                      np.full(n, 0.035)], 1)
        rgb = tex(p, 4.0, 6.0, 0.0)
    elif kind == "wall_z":
        p = np.stack([rng.uniform(-extent, extent, n),
                      rng.uniform(-1.0, 1.5, n),
                      np.full(n, extent)], 1)
        s = np.stack([np.full(n, 0.035), np.full(n, 0.035),
                      np.full(n, 0.008)], 1)
        rgb = tex(p, 5.0, 3.0, 1.0)
    elif kind == "wall_x":
        sgn = 1.0 if rng.random() > 0.5 else -1.0
        p = np.stack([np.full(n, sgn * extent),
                      rng.uniform(-1.0, 1.5, n),
                      rng.uniform(-extent, extent, n)], 1)
        s = np.stack([np.full(n, 0.008), np.full(n, 0.035),
                      np.full(n, 0.035)], 1)
        rgb = tex(p, 3.5, 5.5, 2.0)
    elif kind == "sphere":
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        p = v * 0.6 + np.array([0.0, 0.0, 0.3])
        s = np.full((n, 3), 0.02)
        rgb = tex(p * 3.0, 7.0, 9.0, 0.5)
    elif kind == "ring":
        t = rng.uniform(0, 2 * np.pi, n)
        u = rng.uniform(0, 2 * np.pi, n)
        R, r = 1.1, 0.12
        p = np.stack([(R + r * np.cos(u)) * np.cos(t),
                      0.35 + r * np.sin(u),
                      (R + r * np.cos(u)) * np.sin(t)], 1)
        s = np.full((n, 3), 0.018)
        rgb = tex(p * 4.0, 6.0, 4.0, 3.0)
    else:  # occluder blobs
        centers = rng.uniform(-1.2, 1.2, (12, 3)) * np.array([1, 0.6, 1])
        ci = rng.integers(0, 12, n)
        p = centers[ci] + rng.normal(size=(n, 3)) * 0.12
        s = np.full((n, 3), 0.05)
        rgb = tex(p * 2.0, 8.0, 8.0, 4.0)
    return p.astype(np.float32), s.astype(np.float32), rgb.astype(np.float32)


def orbit_camera(i, n, rng):
    """Camera-to-world pose on a jittered orbit; returns (q_wxyz, t) of the
    WORLD->CAM transform in COLMAP convention."""
    ang = 2 * np.pi * i / n + rng.normal() * 0.02
    height = 0.45 + 0.5 * np.sin(3 * ang) + rng.normal() * 0.05
    rad = 3.4 + rng.normal() * 0.1
    pos = np.array([rad * np.sin(ang), height, -rad * np.cos(ang)])
    look = np.array([0.0, 0.1, 0.3]) - pos
    look /= np.linalg.norm(look)
    up = np.array([0.0, -1.0, 0.0])   # colmap y-down
    right = np.cross(up, look)
    right /= np.linalg.norm(right)
    up2 = np.cross(look, right)
    Rcw = np.stack([right, up2, look], 1)       # cam->world (columns)
    Rwc = Rcw.T
    t = -Rwc @ pos
    # rotation matrix -> quaternion (wxyz)
    m = Rwc
    tr = np.trace(m)
    if tr > 0:
        s = math.sqrt(tr + 1.0) * 2
        q = np.array([0.25 * s, (m[2, 1] - m[1, 2]) / s,
                      (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s])
    else:
        i_ = np.argmax(np.diag(m))
        j, k = (i_ + 1) % 3, (i_ + 2) % 3
        s = math.sqrt(max(1.0 + m[i_, i_] - m[j, j] - m[k, k], 1e-12)) * 2
        q = np.zeros(4)
        q[0] = (m[k, j] - m[j, k]) / s
        q[1 + i_] = 0.25 * s
        q[1 + j] = (m[j, i_] + m[i_, j]) / s
        q[1 + k] = (m[k, i_] + m[i_, k]) / s
    return q / np.linalg.norm(q), t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--cams", type=int, default=120)
    ap.add_argument("--gauss", type=int, default=80_000)
    ap.add_argument("--points", type=int, default=120_000)
    ap.add_argument("--budget", type=int, default=1 << 21)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--force_cpu", action="store_true",
                    help="render GT on the CPU backend (sitecustomize pins "
                         "the TPU plugin, so JAX_PLATFORMS is ignored; the "
                         "runtime config API is the only switch)")
    args = ap.parse_args()

    import jax
    if args.force_cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp
    from PIL import Image

    from contextgs_tpu.ops.rasterize import rasterize
    from contextgs_tpu.scene import colmap
    from contextgs_tpu.scene.cameras import Camera

    rng = np.random.default_rng(args.seed)
    parts = [("floor", 0.22), ("wall_z", 0.14), ("wall_x", 0.14),
             ("sphere", 0.18), ("ring", 0.12), ("blobs", 0.20)]
    ps, ss, cs = [], [], []
    ops = []
    for kind, frac in parts:
        n = int(args.gauss * frac)
        p, s, rgb = surface_gaussians(rng, n, kind)
        ps.append(p); ss.append(s); cs.append(rgb)
        if kind == "blobs":
            ops.append(rng.uniform(0.25, 0.6, n).astype(np.float32))
        else:
            ops.append(rng.uniform(0.85, 1.0, n).astype(np.float32))
    means = np.concatenate(ps)
    scales = np.concatenate(ss) * (1.0 + 0.3 * rng.random((len(means), 1)))
    colors = np.concatenate(cs)
    opac = np.concatenate(ops)
    quats = rng.normal(size=(len(means), 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    G = len(means)
    print(f"GT gaussians: {G}")

    res = args.res
    fov = 1.05
    focal = res / (2 * math.tan(fov / 2))
    root = args.out
    sparse = os.path.join(root, "sparse/0")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)

    cams = {1: colmap.ColmapCamera(1, "PINHOLE", res, res,
                                   np.array([focal, focal, res / 2, res / 2]))}
    colmap.write_cameras_binary(cams, os.path.join(sparse, "cameras.bin"))

    jm, jsc, jq, jc, jo = map(jnp.asarray, (means, scales, quats, colors, opac))
    images = {}
    for i in range(1, args.cams + 1):
        q, t = orbit_camera(i - 1, args.cams, rng)
        images[i] = colmap.ColmapImage(i, q, t, 1, f"im_{i:04d}.png")
        # render GT through the repo's own camera math (same path training uses)
        from contextgs_tpu.utils.graphics import qvec_to_rotmat
        R = qvec_to_rotmat(q).T   # dataset_readers convention: R = Rwc.T
        cam = Camera(uid=i, colmap_id=i, R=R, T=t, fov_x=fov, fov_y=fov,
                     image=None, width=res, height=res)
        out = rasterize(jm, jsc, jq, jc, jo,
                        world_view=jnp.asarray(cam.world_view),
                        full_proj=jnp.asarray(cam.full_proj),
                        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
                        width=res, height=res, bg=jnp.zeros(3),
                        budget=args.budget, chunk_size=128)
        assert not bool(out.overflowed), "raise --budget"
        img = np.clip(np.transpose(np.asarray(out.image), (1, 2, 0)), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(root, "images", f"im_{i:04d}.png"))
        if i % 20 == 0:
            print(f"rendered {i}/{args.cams}")
    colmap.write_images_binary(images, os.path.join(sparse, "images.bin"))

    sel = rng.choice(G, size=min(args.points, G), replace=False)
    xyz = means[sel] + rng.normal(size=(len(sel), 3)) * 0.005
    rgb = (colors[sel] * 255).astype(np.uint8)
    colmap.write_points3d_binary(xyz, rgb, os.path.join(sparse, "points3D.bin"))
    np.savez(os.path.join(root, "oracle.npz"), means=means, scales=scales,
             quats=quats, colors=colors, opac=opac)
    print(f"scene written to {root}: {args.cams} cams @ {res}^2, "
          f"{len(sel)} SfM points")


if __name__ == "__main__":
    main()
