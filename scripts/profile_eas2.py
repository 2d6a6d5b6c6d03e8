#!/usr/bin/env python
"""Compare real expand_and_sort vs. transcribed stages under ONE harness."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import math

import jax
import jax.numpy as jnp
import numpy as np

from contextgs_tpu.ops.rasterize.projection import project_gaussians
from contextgs_tpu.ops.rasterize.sorting import expand_and_sort
from contextgs_tpu.scene.cameras import Camera
from profile_eas import stages

WIDTH, HEIGHT, N_GAUSS, ITERS = 1280, 720, 200_000, 10
BUDGET, CHUNK, TILE = 1 << 20, 128, 16
tiles_x, tiles_y = WIDTH // TILE, HEIGHT // TILE


def timeit(name, fn, *xs):
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
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
    chained(*xs).block_until_ready()
    t0 = time.time()
    chained(*xs).block_until_ready()
    dt = (time.time() - t0) / ITERS * 1e3
    print(f"{name:28s} {dt:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-3, 3, N_GAUSS), rng.uniform(-2, 2, N_GAUSS),
                      rng.uniform(2.0, 12.0, N_GAUSS)], 1).astype(np.float32)
    scales = rng.uniform(0.004, 0.02, (N_GAUSS, 3)).astype(np.float32)
    quats = rng.normal(size=(N_GAUSS, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    cam = Camera(uid=0, colmap_id=0, R=np.eye(3), T=np.zeros(3), fov_x=1.2,
                 fov_y=2 * math.atan(math.tan(0.6) * HEIGHT / WIDTH),
                 image=None, width=WIDTH, height=HEIGHT)
    proj = jax.jit(lambda m, s, q: project_gaussians(
        m, s, q, jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj),
        cam.tanfovx, cam.tanfovy, WIDTH, HEIGHT, TILE))(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats))
    jax.block_until_ready(proj)

    def eas_used(p):
        i = expand_and_sort(p, tiles_x, tiles_y, BUDGET, align=CHUNK)
        return (i.src_slot, i.rank_slot, i.tile_bounds, i.perm, i.order,
                i.seg_bounds, i.total, i.overflowed)

    def eas_full(p):
        return expand_and_sort(p, tiles_x, tiles_y, BUDGET, align=CHUNK)

    timeit("stages prefix s5", lambda p: stages(p, 5), proj)
    timeit("real EAS (used fields)", eas_used, proj)
    timeit("real EAS (all fields)", eas_full, proj)


if __name__ == "__main__":
    main()
