"""Measure rect-corner waste: the fraction of tile instances whose max alpha
over their tile is < 1/255 — the blend skip rule zeroes every pixel of such
an instance, so a per-candidate ellipse-vs-tile test could drop it.

This quantifies the headroom of per-tile (non-rect) footprint culling beyond
the opacity-aware ellipse BBOX already applied at projection
(ops/rasterize/projection.py:174-189). Headroom here shrinks only the BLEND
kernels' dynamic chunk counts — the glue (sorts, gathers, ffills) is
static-shaped in the instance budget, and the budget cannot drop below the
RECT demand because expansion enumerates rect cells (see VALIDATION.md r5).

Usage: python scripts/corner_diag.py [--n_gauss 200000] [--width 1280] ...
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_gauss", type=int, default=200_000)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--budget", type=int, default=768 * 1024)
    ap.add_argument("--scale_lo", type=float, default=0.004)
    ap.add_argument("--scale_hi", type=float, default=0.02)
    ap.add_argument("--force_cpu", action="store_true")
    args = ap.parse_args()

    if args.force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from contextgs_tpu.ops.rasterize.projection import project_gaussians
    from contextgs_tpu.ops.rasterize.sorting import expand_and_sort
    import math
    from contextgs_tpu.scene.cameras import Camera

    W, H, G = args.width, args.height, args.n_gauss
    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-3, 3, G), rng.uniform(-2, 2, G),
                      rng.uniform(2.0, 12.0, G)], 1).astype(np.float32)
    scales = rng.uniform(args.scale_lo, args.scale_hi, (G, 3)).astype(np.float32)
    quats = rng.normal(size=(G, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.9, G).astype(np.float32)

    cam = Camera(uid=0, colmap_id=0, R=np.eye(3), T=np.zeros(3), fov_x=1.2,
                 fov_y=2 * math.atan(math.tan(0.6) * H / W),
                 image=None, width=W, height=H)
    ts = 16
    tiles_x, tiles_y = (W + ts - 1) // ts, (H + ts - 1) // ts

    @jax.jit
    def diag(means, scales, quats, opac):
        # rect demand without / with the opacity-aware ellipse bbox
        proj_plain = project_gaussians(
            means, scales, quats, jnp.asarray(cam.world_view),
            jnp.asarray(cam.full_proj), cam.tanfovx, cam.tanfovy, W, H, ts)
        proj = project_gaussians(
            means, scales, quats, jnp.asarray(cam.world_view),
            jnp.asarray(cam.full_proj), cam.tanfovx, cam.tanfovy, W, H, ts,
            opacities=opac)
        inst = expand_and_sort(proj, tiles_x, tiles_y, args.budget,
                               align=128)
        # per aligned instance: max alpha over its tile's 16x16 pixel grid
        g = inst.gauss_ids                                  # [B_pad]
        m2 = proj.means2d[g]                                # [B_pad,2]
        con = proj.conics[g]                                # [B_pad,3]
        op = opac[g]
        t = jnp.minimum(inst.tile_ids, tiles_x * tiles_y - 1)
        tx = (t % tiles_x) * ts
        ty = (t // tiles_x) * ts
        px = tx[:, None] + jnp.arange(ts)[None, :]          # [B_pad,16]
        py = ty[:, None] + jnp.arange(ts)[None, :]
        dx = px.astype(jnp.float32) - m2[:, 0:1]            # [B_pad,16]
        dy = py.astype(jnp.float32) - m2[:, 1:2]
        # power(px,py) = -0.5(a dx^2 + c dy^2) - b dx dy, maximized over the
        # 16x16 grid: evaluate the separable pieces and combine
        # full [B,16,16] would be 16x memory; fold y into the lane dim in two
        # passes of 16
        def max_alpha(i, best):
            dyi = jax.lax.dynamic_slice_in_dim(dy, i, 1, axis=1)
            powr = (-0.5 * (con[:, 0:1] * dx * dx
                            + con[:, 2:3] * dyi * dyi)
                    - con[:, 1:2] * dx * dyi)
            return jnp.maximum(best, jnp.max(powr, axis=1))
        best = jax.lax.fori_loop(0, ts, max_alpha,
                                 jnp.full(g.shape, -jnp.inf))
        alpha_max = op * jnp.exp(jnp.minimum(best, 0.0))
        live = inst.valid
        wasted = live & (alpha_max < 1.0 / 255.0)
        return dict(demand_plain=proj_plain.n_tiles.sum(),
                    demand_tight=proj.n_tiles.sum(),
                    n_valid=live.sum(), n_wasted=wasted.sum())

    t0 = time.time()
    out = {k: int(v) for k, v in jax.device_get(diag(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac))).items()}
    out["wasted_frac"] = round(out["n_wasted"] / max(out["n_valid"], 1), 4)
    out["bbox_gain"] = round(1 - out["demand_tight"] /
                             max(out["demand_plain"], 1), 4)
    out["wall_s"] = round(time.time() - t0, 1)
    print(out)


if __name__ == "__main__":
    main()
