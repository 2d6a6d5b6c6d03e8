#!/usr/bin/env python
"""Micro-profile of the pieces inside expand_and_sort (real chip)."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import math

import jax
import jax.numpy as jnp
import numpy as np

from contextgs_tpu.ops.rasterize.projection import project_gaussians
from contextgs_tpu.scene.cameras import Camera

WIDTH, HEIGHT, N_GAUSS, ITERS = 1280, 720, 200_000, 10
BUDGET, ALIGN = 1 << 20, 128
TILE = 16


def timeit(name, fn, *xs):
    @jax.jit
    def chained(*xs):
        def body(i, c):
            # runtime-zero perturbation the compiler cannot fold away, for
            # float AND int leaves, so the stage cannot be hoisted out of
            # the loop
            x0 = jax.tree.map(
                lambda a: a + (c * 1e-30).astype(a.dtype)
                if a.dtype != jnp.bool_ else a, xs[0])
            out = fn(x0, *xs[1:])
            s = sum(jnp.sum(l).astype(jnp.float32)
                    for l in jax.tree_util.tree_leaves(out))
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
    tiles_x = WIDTH // TILE
    tiles_y = HEIGHT // TILE
    n_tiles = tiles_x * tiles_y

    proj = jax.jit(lambda m, s, q: project_gaussians(
        m, s, q, jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj),
        cam.tanfovx, cam.tanfovy, WIDTH, HEIGHT, TILE))(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats))
    jax.block_until_ready(proj)

    G = N_GAUSS
    budget = BUDGET
    align = ALIGN

    # phase 1
    def phase1(proj):
        dkey = jnp.where(proj.n_tiles > 0, proj.depths, jnp.inf)
        order = jnp.argsort(dkey, stable=True).astype(jnp.int32)
        counts = proj.n_tiles[order].astype(jnp.int32)
        rmin_x = proj.rect_min[order, 0]
        rmin_y = proj.rect_min[order, 1]
        rect_w = jnp.maximum(proj.rect_max[order, 0] - rmin_x, 1)
        return order, counts, rmin_x, rmin_y, rect_w

    p1 = jax.jit(phase1)(proj)
    jax.block_until_ready(p1)
    order, counts, rmin_x, rmin_y, rect_w = p1

    def expand(counts, rmin_x, rmin_y, rect_w, order):
        incl = jnp.cumsum(counts)
        offsets = incl - counts
        total = jnp.minimum(incl[-1], budget)
        slots = jnp.arange(budget, dtype=jnp.int32)
        heads = jnp.zeros((budget,), jnp.int32).at[offsets].add(1, mode="drop")
        gi = jnp.cumsum(heads) - 1
        gi = jnp.clip(gi, 0, G - 1)
        k = slots - offsets[gi]
        valid = slots < total
        ty = k // rect_w[gi]
        tx = k - ty * rect_w[gi]
        tile = (rmin_y[gi] + ty) * tiles_x + rmin_x[gi] + tx
        tile = jnp.where(valid, tile, n_tiles).astype(jnp.int32)
        return tile, gi, slots

    ex = jax.jit(expand)(counts, rmin_x, rmin_y, rect_w, order)
    jax.block_until_ready(ex)
    tile, gi, slots = ex

    bits_slot = max(1, (budget - 1).bit_length())
    def sort1(tile, slots):
        key = (tile.astype(jnp.uint32) << bits_slot) | slots.astype(jnp.uint32)
        key_s = jax.lax.sort(key)
        return key_s

    def sort3(tile, gi, slots, order):
        return jax.lax.sort((tile, order[gi], slots), num_keys=1)

    ks = jax.jit(sort1)(tile, slots)
    jax.block_until_ready(ks)
    s3 = jax.jit(sort3)(tile, gi, slots, order)
    jax.block_until_ready(s3)
    tile_s = s3[0]
    src_slot = s3[2]

    def align_phase(tile_s, src_slot, gi, order):
        gauss_s = order[gi[src_slot]]
        raw_bounds = jnp.searchsorted(
            tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        seg_len = raw_bounds[1:] - raw_bounds[:-1]
        pad_len = ((seg_len + align - 1) // align) * align
        bounds = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  jnp.cumsum(pad_len).astype(jnp.int32)])
        b_pad = budget + n_tiles * align
        delta = bounds[:-1] - raw_bounds[:-1]
        src_valid = tile_s < n_tiles
        new_pos = jnp.where(
            src_valid,
            jnp.arange(budget, dtype=jnp.int32) +
            delta[jnp.clip(tile_s, 0, n_tiles - 1)],
            b_pad)
        out_gauss = jnp.full((b_pad,), -1, jnp.int32).at[new_pos].set(
            gauss_s, mode="drop")
        out_valid = out_gauss >= 0
        out_gauss = jnp.maximum(out_gauss, 0)
        tile_heads = jnp.zeros((b_pad,), jnp.int32).at[bounds[1:]].add(
            1, mode="drop")
        out_tile = jnp.cumsum(tile_heads)
        out_tile = jnp.where(out_valid, out_tile, n_tiles).astype(jnp.int32)
        perm = jnp.full((budget,), b_pad, jnp.int32).at[src_slot].set(
            jnp.where(src_valid, new_pos, b_pad), mode="drop")
        return out_gauss, out_valid, out_tile, perm, bounds

    ap = jax.jit(align_phase)(tile_s, src_slot, gi, order)
    jax.block_until_ready(ap)

    timeit("phase1 argsort+gather", phase1, proj)
    timeit("expand (cumsum+gather)", expand, counts, rmin_x, rmin_y, rect_w,
           order)
    timeit("sort uint32 nopayload", sort1, tile, slots)
    timeit("sort 3-operand", sort3, tile, gi, slots, order)
    timeit("align+scatter", align_phase, tile_s, src_slot, gi, order)


if __name__ == "__main__":
    main()
