#!/usr/bin/env python
"""Decompose _pack cost on real bench indices."""

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
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(name, fn, *xs, iters=20):
    @jax.jit
    def chained(*xs):
        def body(i, c):
            if jnp.issubdtype(xs[0].dtype, jnp.floating):
                x0 = xs[0] + xs[0].dtype.type(1e-30) * c
            else:
                x0 = xs[0] + (c.astype(jnp.int32) & 0)
            out = fn(x0, *xs[1:])
            return 0.5 * c + 1e-20 * jnp.sum(out).astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    fetch(chained(*xs))
    t0 = time.time()
    fetch(chained(*xs))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:40s} {dt:8.3f} ms")
    return dt


def main():
    from contextgs_tpu.ops.rasterize.projection import project_gaussians
    from contextgs_tpu.ops.rasterize.sorting import expand_and_sort
    from contextgs_tpu.scene.cameras import Camera

    W, H, G = 1280, 720, 200_000
    BUDGET, CHUNK, TILE = 768 * 1024, 128, 16
    tiles_x, tiles_y = 80, 45
    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-3, 3, G), rng.uniform(-2, 2, G),
                      rng.uniform(2.0, 12.0, G)], 1).astype(np.float32)
    scales = rng.uniform(0.004, 0.02, (G, 3)).astype(np.float32)
    quats = rng.normal(size=(G, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    colors = rng.uniform(0, 1, (G, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, G).astype(np.float32)
    cam = Camera(uid=0, colmap_id=0, R=np.eye(3), T=np.zeros(3), fov_x=1.2,
                 fov_y=2 * math.atan(math.tan(0.6) * H / W),
                 image=None, width=W, height=H)
    wv, fp = jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj)

    proj = jax.jit(lambda m, s, q, o: project_gaussians(
        m, s, q, wv, fp, cam.tanfovx, cam.tanfovy, W, H, TILE,
        opacities=o))(*map(jnp.asarray, (means, scales, quats, opac)))
    inst = jax.jit(lambda p: expand_and_sort(p, tiles_x, tiles_y, BUDGET,
                                             align=CHUNK))(proj)
    fetch(inst)
    gauss_rows = jnp.concatenate(
        [proj.means2d, proj.conics, jnp.asarray(opac)[:, None],
         jnp.asarray(colors)], axis=1)
    rank = inst.rank_aligned
    order = inst.order
    b_pad = rank.shape[0]
    print("b_pad", b_pad)

    from contextgs_tpu.ops.rasterize import PACK

    def prep16(rows, order):
        Gn, w = rows.shape
        rows16 = jnp.concatenate(
            [rows[order], jnp.zeros((Gn, PACK - w), rows.dtype)], axis=1)
        return jnp.concatenate([rows16, jnp.zeros((1, PACK), rows.dtype)])

    rows_rank = jax.jit(prep16)(gauss_rows, order)
    fetch(rows_rank)

    timeit("prep16 (order gather + pads)", prep16, gauss_rows, order)
    timeit("gather16 [b_pad]", lambda r: r[rank], rows_rank)
    timeit("gather16+barrier+T", lambda r: jax.lax.optimization_barrier(
        r[rank]).T, rows_rank)
    timeit("gather16+T (no barrier)", lambda r: r[rank].T, rows_rank)

    # index distribution: how random is rank_aligned?
    ra = np.asarray(rank)
    print("monotone frac:", float(np.mean(np.diff(ra) > 0)))

    # regroup width comparison on the REAL perm/seg_bounds
    rng2 = np.random.default_rng(1)
    g16 = jnp.asarray(rng2.normal(size=(16, b_pad)).astype(np.float32))

    def regroup(gw, perm, segb, inv, w):
        gRM = jax.lax.optimization_barrier(gw[:w].T)
        gT = jnp.concatenate([gRM, jnp.zeros((1, w), gw.dtype)])
        g_depth = gT[perm]
        cs = jnp.concatenate([jnp.zeros((1, w), gw.dtype),
                              jnp.cumsum(g_depth, axis=0)])
        B = g_depth.shape[0]
        cs_b = cs[jnp.clip(segb, 0, B)]
        per_rank = cs_b[1:] - cs_b[:-1]
        return jax.lax.optimization_barrier(per_rank[inv])[:, :9]

    for w in (9, 16):
        timeit(f"regroup width {w}", lambda g, p, s, i: regroup(g, p, s, i, w),
               g16, inst.perm, inst.seg_bounds, inst.inv_order)


if __name__ == "__main__":
    main()
