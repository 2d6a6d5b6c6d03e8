#!/usr/bin/env python
"""Stage-by-stage profile of the real rasterize() pipeline on bench shapes.

The one profiling tool for this repo (consolidates round-1 scratch). Times
each pipeline stage as actually consumed by rasterize()/its VJP, with
fetch-synced timing (block_until_ready is NOT a reliable fence under the axon
tunnel — only pulling bytes is), plus an end-to-end fwd+bwd number identical
to bench.py's.

Usage: python scripts/profile.py [--gauss 200000] [--width 1280]
       [--height 720] [--iters 10] [--budget 786432] [--e2e-only]
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    """Reliable device fence: pull one leaf's bytes."""
    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "shape")]
    np.asarray(leaves[0])


def timeit(name, fn, *xs, iters=10):
    @jax.jit
    def chained(*xs):
        def body(i, c):
            x0 = jax.tree.map(
                lambda a: a + a.dtype.type(1e-30) * c.astype(a.dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, xs[0])
            out = fn(x0, *xs[1:])
            s = sum(jnp.sum(l).astype(jnp.float32)
                    for l in jax.tree_util.tree_leaves(out)
                    if jnp.issubdtype(l.dtype, jnp.number))
            return 0.5 * c + 1e-20 * s
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    fetch(chained(*xs))
    t0 = time.time()
    fetch(chained(*xs))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:28s} {dt:8.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gauss", type=int, default=200_000)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--budget", type=int, default=768 * 1024)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--scale-lo", type=float, default=0.004)
    ap.add_argument("--scale-hi", type=float, default=0.02)
    ap.add_argument("--e2e-only", action="store_true")
    args = ap.parse_args()

    from contextgs_tpu.ops.rasterize import rasterize
    from contextgs_tpu.ops.rasterize.projection import project_gaussians
    from contextgs_tpu.ops.rasterize.sorting import expand_and_sort
    from contextgs_tpu.ops.rasterize.tile_kernel import (
        blend_backward_pallas, blend_forward_pallas)
    from contextgs_tpu.scene.cameras import Camera

    W, H, G, ITERS = args.width, args.height, args.gauss, args.iters
    BUDGET, CHUNK, TILE = args.budget, args.chunk, 16
    tiles_x, tiles_y = (W + TILE - 1) // TILE, (H + TILE - 1) // TILE
    n_tiles = tiles_x * tiles_y

    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-3, 3, G), rng.uniform(-2, 2, G),
                      rng.uniform(2.0, 12.0, G)], 1).astype(np.float32)
    scales = rng.uniform(args.scale_lo, args.scale_hi, (G, 3)).astype(np.float32)
    quats = rng.normal(size=(G, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    colors = rng.uniform(0, 1, (G, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, G).astype(np.float32)
    cam = Camera(uid=0, colmap_id=0, R=np.eye(3), T=np.zeros(3), fov_x=1.2,
                 fov_y=2 * math.atan(math.tan(0.6) * H / W),
                 image=None, width=W, height=H)
    wv, fp = jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj)
    jargs = tuple(map(jnp.asarray, (means, scales, quats, colors, opac)))

    cam_kw = dict(world_view=wv, full_proj=fp, tanfovx=cam.tanfovx,
                  tanfovy=cam.tanfovy, width=W, height=H, bg=jnp.zeros(3),
                  budget=BUDGET, chunk_size=CHUNK, backend="pallas")

    # --- end-to-end fwd+bwd (same as bench.py) ---
    def loss(m, s, q, c, o):
        out = rasterize(m, s, q, c, o, **cam_kw)
        return jnp.sum(out.image * out.image)

    grad = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

    @jax.jit
    def e2e(m, s, q, c, o):
        def body(i, mm):
            g = grad(mm, s, q, c, o)[0]
            return mm + 0.0 * g
        return jax.lax.fori_loop(0, ITERS, body, m)

    fetch(e2e(*jargs))
    t0 = time.time()
    fetch(e2e(*jargs))
    dt = (time.time() - t0) / ITERS * 1e3
    mpixs = W * H / dt / 1e3
    print(f"{'E2E fwd+bwd':28s} {dt:8.2f} ms   = {mpixs:.1f} Mpix/s")
    if args.e2e_only:
        return

    # --- stages as consumed ---
    def proj_fn(m, s, q, o):
        return project_gaussians(m, s, q, wv, fp, cam.tanfovx, cam.tanfovy,
                                 W, H, TILE, opacities=o)

    proj = jax.jit(proj_fn)(jargs[0], jargs[1], jargs[2], jargs[4])
    fetch(proj)

    def eas_used(p):
        i = expand_and_sort(p, tiles_x, tiles_y, BUDGET, align=CHUNK)
        return (i.rank_aligned, i.tile_bounds, i.perm, i.order, i.inv_order, i.seg_bounds, i.total, i.overflowed)

    inst = jax.jit(lambda p: expand_and_sort(p, tiles_x, tiles_y, BUDGET,
                                             align=CHUNK))(proj)
    fetch(inst)

    from contextgs_tpu.ops.rasterize import _pack

    gauss_rows = jnp.concatenate(
        [proj.means2d, proj.conics, jargs[4][:, None], jargs[3]], axis=1)
    packed = jax.jit(_pack)(gauss_rows, inst.order, inst.rank_aligned)
    fetch(packed)

    fwd_out, wms = jax.jit(lambda p, b: blend_forward_pallas(
        p, b, n_tiles, tiles_x, TILE, CHUNK, False))(packed, inst.tile_bounds)
    fetch(fwd_out)
    cot = jnp.ones((4, n_tiles * 256), jnp.float32)

    def bwd_reduce(g16, perm, seg_bounds, inv_order):
        # mirror of _pack_blend_bwd's segment reduce (16-wide rows)
        PACKW = g16.shape[0]
        gRM = jax.lax.optimization_barrier(g16.T)
        gT = jnp.concatenate([gRM, jnp.zeros((1, PACKW), g16.dtype)])
        g_depth = gT[perm]
        cs = jnp.concatenate([jnp.zeros((1, PACKW), g16.dtype),
                              jnp.cumsum(g_depth, axis=0)])
        B = g_depth.shape[0]
        cs_b = cs[jnp.clip(seg_bounds, 0, B)]
        per_rank = cs_b[1:] - cs_b[:-1]
        return jax.lax.optimization_barrier(per_rank[inv_order])[:, :9]

    def proj_vjp(m, s, q, o):
        _, vjp = jax.vjp(lambda a, b, c: proj_fn(a, b, c, o).means2d,
                         m, s, q)
        return vjp(jnp.ones((G, 2), jnp.float32))

    total = 0.0
    total += timeit("projection fwd", proj_fn, jargs[0], jargs[1], jargs[2],
                    jargs[4], iters=ITERS)
    total += timeit("expand_and_sort (used)", eas_used, proj, iters=ITERS)
    total += timeit("pack row-gathers", _pack, gauss_rows, inst.order,
                    inst.rank_aligned, iters=ITERS)
    total += timeit("blend fwd", lambda p, b: blend_forward_pallas(
        p, b, n_tiles, tiles_x, TILE, CHUNK, False), packed, inst.tile_bounds,
        iters=ITERS)
    total += timeit("blend bwd", lambda p, f, w, c, b: blend_backward_pallas(
        p, b, f, w, c, n_tiles, tiles_x, TILE, CHUNK, False),
        packed, fwd_out, wms, cot, inst.tile_bounds, iters=ITERS)
    total += timeit("bwd segment reduce", bwd_reduce, packed,
                    inst.perm, inst.seg_bounds, inst.inv_order, iters=ITERS)
    total += timeit("projection vjp", proj_vjp, jargs[0], jargs[1], jargs[2],
                    jargs[4], iters=ITERS)
    print(f"{'TOTAL (stages)':28s} {total:8.2f} ms")
    print(f"instances: {int(inst.total)}  b_pad: {packed.shape[1]}  "
          f"aligned sum: {int(inst.tile_bounds[-1])}  "
          f"chunks: {int(inst.tile_bounds[-1]) // CHUNK}")


if __name__ == "__main__":
    main()
