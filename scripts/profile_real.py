#!/usr/bin/env python
"""Profile the REAL rasterize() pipeline stage-by-stage on bench shapes.

Unlike profile_raster.py (stale pre-_pack_blend pipeline) this times the
stages actually executed by rasterize(): projection fwd, expand_and_sort as
consumed (gauss_ids DCE'd), _pack row-gathers, blend fwd/bwd Pallas kernels,
and the segment-sum gradient reduction. Perturbation uses `1e-30 * c` (a real
data dependency; `0.0 * c` can be algebraically folded, letting XLA hoist the
whole stage out of the timing loop).
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import math

import jax
import jax.numpy as jnp
import numpy as np

from contextgs_tpu.ops.rasterize import _pack
from contextgs_tpu.ops.rasterize.projection import project_gaussians
from contextgs_tpu.ops.rasterize.sorting import expand_and_sort
from contextgs_tpu.ops.rasterize.tile_kernel import (PACK,
                                                     blend_backward_pallas,
                                                     blend_forward_pallas)
from contextgs_tpu.scene.cameras import Camera

WIDTH, HEIGHT, N_GAUSS, ITERS = 1280, 720, 200_000, 10
BUDGET, CHUNK, TILE = 1 << 20, 128, 16
tiles_x, tiles_y = WIDTH // TILE, HEIGHT // TILE
n_tiles = tiles_x * tiles_y


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
    colors = rng.uniform(0, 1, (N_GAUSS, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, N_GAUSS).astype(np.float32)
    cam = Camera(uid=0, colmap_id=0, R=np.eye(3), T=np.zeros(3), fov_x=1.2,
                 fov_y=2 * math.atan(math.tan(0.6) * HEIGHT / WIDTH),
                 image=None, width=WIDTH, height=HEIGHT)
    wv, fp = jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj)
    args = tuple(map(jnp.asarray, (means, scales, quats, colors, opac)))

    def proj_fn(m, s, q):
        return project_gaussians(m, s, q, wv, fp, cam.tanfovx, cam.tanfovy,
                                 WIDTH, HEIGHT, TILE)

    proj = jax.jit(proj_fn)(*args[:3])
    jax.block_until_ready(proj)

    def eas_used(p):
        """expand_and_sort, consuming only the fields the real path reads."""
        i = expand_and_sort(p, tiles_x, tiles_y, BUDGET, align=CHUNK)
        return (i.src_slot, i.rank_slot, i.tile_bounds, i.perm, i.order,
                i.seg_bounds, i.total, i.overflowed)

    inst = jax.jit(lambda p: expand_and_sort(p, tiles_x, tiles_y, BUDGET,
                                             align=CHUNK))(proj)
    jax.block_until_ready(inst)

    def pack_fn(gauss_rows, order, rank_slot, src_slot):
        return _pack(gauss_rows, order, rank_slot, src_slot)

    gauss_rows = jnp.concatenate(
        [proj.means2d, proj.conics, opac[:, None], colors], axis=1)
    packed = jax.jit(pack_fn)(gauss_rows, inst.order, inst.rank_slot,
                              inst.src_slot)
    jax.block_until_ready(packed)

    fwd_out = jax.jit(lambda p, b: blend_forward_pallas(
        p, b, n_tiles, tiles_x, TILE, CHUNK, False))(packed, inst.tile_bounds)
    jax.block_until_ready(fwd_out)
    cot = jnp.ones_like(fwd_out)

    def bwd_reduce(g9, perm, seg_bounds, order):
        gT = jnp.concatenate([g9.T, jnp.zeros((1, 9), g9.dtype)])
        g_depth = gT[perm]
        cs = jnp.concatenate([jnp.zeros((1, 9), g9.dtype),
                              jnp.cumsum(g_depth, axis=0)])
        B = g_depth.shape[0]
        lo = jnp.clip(seg_bounds[:-1], 0, B)
        hi = jnp.clip(seg_bounds[1:], 0, B)
        per_rank = cs[hi] - cs[lo]
        return jnp.zeros((N_GAUSS, 9), g9.dtype).at[order].set(per_rank)

    def proj_vjp(m, s, q):
        _, vjp = jax.vjp(lambda *a: proj_fn(*a).means2d, m, s, q)
        return vjp(jnp.ones((N_GAUSS, 2), jnp.float32))

    total = 0.0
    total += timeit("projection fwd", proj_fn, *args[:3])
    total += timeit("expand_and_sort (used)", eas_used, proj)
    total += timeit("pack row-gathers", pack_fn, gauss_rows, inst.order,
                    inst.rank_slot, inst.src_slot)
    total += timeit("blend fwd", lambda p, b: blend_forward_pallas(
        p, b, n_tiles, tiles_x, TILE, CHUNK, False), packed, inst.tile_bounds)
    total += timeit("blend bwd", lambda p, f, c, b: blend_backward_pallas(
        p, b, f, c, n_tiles, tiles_x, TILE, CHUNK, False),
        packed, fwd_out, cot, inst.tile_bounds)
    total += timeit("bwd segment reduce", bwd_reduce, packed[:9],
                    inst.perm, inst.seg_bounds, inst.order)
    total += timeit("projection vjp", proj_vjp, *args[:3])
    print(f"{'TOTAL (stages)':28s} {total:8.2f} ms")
    print(f"instances: {int(inst.total)}  b_pad: {packed.shape[1]}  "
          f"aligned sum: {int(inst.tile_bounds[-1])}")


if __name__ == "__main__":
    main()
