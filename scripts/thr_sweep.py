#!/usr/bin/env python
"""Rasterizer throughput vs (gaussian count, resolution) sweep.

VERDICT r3 #8: the throughput table needs reference-scale realism — a 1080p
row and a 2M-gaussian row next to the 200k/720p bench point (reference scenes
run 1-6M gaussians at 1080p-class resolutions). Same measurement protocol as
bench.py: fwd+bwd chained inside one jit, scalar-fetch fence.

Usage: python scripts/thr_sweep.py [--iters 20]
       [--configs 200000x1280x720,1000000x1280x720,...]
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import numpy as np

DEFAULT = ("200000x1280x720,1000000x1280x720,2000000x1280x720,"
           "200000x1920x1080,1000000x1920x1080")


def probe_demand(means, scales, quats, opac, cam, width, height):
    """Tile-instance demand of this workload (tight opacity-aware rects) —
    what the train loop's watermark policy would size the budget from."""
    import jax
    import jax.numpy as jnp
    from contextgs_tpu.ops.rasterize.projection import project_gaussians

    @jax.jit
    def d(means, scales, quats, opac):
        proj = project_gaussians(
            means, scales, quats, jnp.asarray(cam.world_view),
            jnp.asarray(cam.full_proj), cam.tanfovx, cam.tanfovy,
            width, height, 16, opacities=opac)
        return jnp.sum(proj.n_tiles)
    return int(d(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
                 jnp.asarray(opac)))


def measure(n_gauss, width, height, iters, budget, vis_cap=None):
    import jax
    import jax.numpy as jnp
    from contextgs_tpu.ops.rasterize import rasterize
    from contextgs_tpu.scene.cameras import Camera

    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-3, 3, n_gauss),
                      rng.uniform(-2, 2, n_gauss),
                      rng.uniform(2.0, 12.0, n_gauss)], 1).astype(np.float32)
    # keep the per-pixel blend load roughly constant across G (a real scene's
    # splat density doesn't scale with its gaussian count): shrink scales as
    # G grows so instances/pixel stay in the bench regime
    s_hi = 0.02 * math.sqrt(200_000 / n_gauss)
    scales = rng.uniform(0.2 * s_hi, s_hi, (n_gauss, 3)).astype(np.float32)
    quats = rng.normal(size=(n_gauss, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    colors = rng.uniform(0, 1, (n_gauss, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, n_gauss).astype(np.float32)

    cam = Camera(uid=0, colmap_id=0, R=np.eye(3), T=np.zeros(3), fov_x=1.2,
                 fov_y=2 * math.atan(math.tan(0.6) * height / width),
                 image=None, width=width, height=height)
    if budget is None:
        # right-size like the train loop's watermark policy (1.3x headroom,
        # align-granular): glue is STATIC in the budget, so a fixed oversized
        # budget mismeasures the framework — 200k/720p at a 2.76M budget ran
        # 134 ms where the same workload at the adapted 768k budget runs
        # 36 ms (r5 measure log)
        demand = probe_demand(means, scales, quats, opac, cam, width, height)
        budget = max(-(-int(demand * 1.3) // 256) * 256, 65536)
    cam_kw = dict(world_view=jnp.asarray(cam.world_view),
                  full_proj=jnp.asarray(cam.full_proj),
                  tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
                  width=width, height=height, bg=jnp.zeros(3),
                  budget=budget, chunk_size=128, backend="pallas",
                  vis_cap=vis_cap)

    def loss(means, scales, quats, colors, opac):
        out = rasterize(means, scales, quats, colors, opac, **cam_kw)
        return jnp.sum(out.image * out.image)

    grad = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

    @jax.jit
    def bench_n(means, scales, quats, colors, opac):
        def body(i, m):
            g = grad(m, scales, quats, colors, opac)[0]
            return m + 0.0 * g
        return jnp.sum(jax.lax.fori_loop(0, iters, body, means))

    # overflow probe (one un-chained call) so the row is honest about drops
    probe = jax.jit(lambda *a: rasterize(*a, **cam_kw)[4:6])
    args = tuple(map(jnp.asarray, (means, scales, quats, colors, opac)))
    ovf, vovf = (bool(np.asarray(x)) for x in probe(*args))

    out = bench_n(*args)
    np.asarray(out)
    t0 = time.time()
    np.asarray(bench_n(*args))
    dt = time.time() - t0
    return iters * width * height / dt / 1e6, dt / iters, ovf or vovf, budget


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--configs", default=DEFAULT)
    ap.add_argument("--budget_per_mpix", type=int, default=0,
                    help="fixed budget per Mpix (0 = auto: probe the demand "
                         "and apply the train loop's 1.3x watermark policy)")
    args = ap.parse_args()

    print(f"{'gaussians':>10} {'res':>10} {'ms/iter':>9} {'Mpix/s':>8} ovf")
    for spec in args.configs.split(","):
        g, w, h = (int(x) for x in spec.split("x"))
        budget = (min(args.budget_per_mpix * w * h // 1_000_000, 6 << 20)
                  if args.budget_per_mpix else None)
        # react to overflow like the train loop: double and re-measure, so a
        # row is never a truncated (silently lighter) workload
        for _ in range(3):
            mpix, s_iter, ovf, used = measure(g, w, h, args.iters, budget)
            if not ovf:
                break
            budget = used * 2
        print(f"{g:>10} {w:>5}x{h:<4} {s_iter*1e3:>9.1f} {mpix:>8.2f} "
              f"{'OVERFLOW' if ovf else 'ok'} (budget {used})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
