#!/usr/bin/env python
"""Decompose the CURRENT expand_and_sort by timing cumulative prefixes.

Each prefix recomputes stages 1..k from the projection and returns every
intermediate; stage cost = t(k) - t(k-1). Inputs are perturbed through the
loop carry on float leaves (proj.depths), so nothing folds or hoists.
"""

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
BUDGET, ALIGN, TILE = 1 << 20, 128, 16
tiles_x, tiles_y = WIDTH // TILE, HEIGHT // TILE
n_tiles = tiles_x * tiles_y
G = N_GAUSS


def stages(proj, upto):
    budget, align = BUDGET, ALIGN
    out = []
    # --- s0: phase 1 depth argsort + gathers
    dkey = jnp.where(proj.n_tiles > 0, proj.depths, jnp.inf)
    order = jnp.argsort(dkey, stable=True).astype(jnp.int32)
    counts = proj.n_tiles[order].astype(jnp.int32)
    rmin_x = proj.rect_min[order, 0]
    rmin_y = proj.rect_min[order, 1]
    rect_w = jnp.maximum(proj.rect_max[order, 0] - rmin_x, 1)
    out += [order, counts, rmin_x, rmin_y, rect_w]
    if upto == 0:
        return out
    # --- s1: ffills + tile id computation
    incl = jnp.cumsum(counts)
    offsets = (incl - counts).astype(jnp.int32)
    seg_bounds = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  incl.astype(jnp.int32)])
    total = jnp.minimum(incl[-1], budget)
    slots = jnp.arange(budget, dtype=jnp.int32)
    valid = slots < total

    def ffill(vals):
        d = vals - jnp.concatenate([jnp.zeros((1,), vals.dtype), vals[:-1]])
        heads = jnp.zeros((budget,), vals.dtype).at[offsets].add(
            d, mode="drop")
        return jnp.cumsum(heads)

    rank = ffill(jnp.arange(G, dtype=jnp.int32))
    rank = jnp.where(valid, jnp.clip(rank, 0, G - 1), G)
    wx = max(tiles_x - 1, 1).bit_length()
    wy = max(tiles_y - 1, 1).bit_length()
    geom = ffill(rmin_x | (rmin_y << wx) | (rect_w << (wx + wy)))
    rx = geom & ((1 << wx) - 1)
    ry = (geom >> wx) & ((1 << wy) - 1)
    rw = jnp.maximum(geom >> (wx + wy), 1)
    k = slots - ffill(offsets)
    ty = k // rw
    tx = k - ty * rw
    tile = (ry + ty) * tiles_x + rx + tx
    tile = jnp.where(valid, tile, n_tiles).astype(jnp.int32)
    out += [rank, tile, seg_bounds]
    if upto == 1:
        return out
    # --- s2: uint32 single-key sort
    bits_slot = max(1, (budget - 1).bit_length())
    key = (tile.astype(jnp.uint32) << bits_slot) | slots.astype(jnp.uint32)
    key_s = jax.lax.sort(key)
    tile_s = (key_s >> bits_slot).astype(jnp.int32)
    src_slot = (key_s & ((1 << bits_slot) - 1)).astype(jnp.int32)
    out += [tile_s, src_slot]
    if upto == 2:
        return out
    # --- s3: bounds + align scatter of src_slot
    raw_bounds = jnp.searchsorted(
        tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    seg_len = raw_bounds[1:] - raw_bounds[:-1]
    pad_len = ((seg_len + align - 1) // align) * align
    bounds = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(pad_len).astype(jnp.int32)])
    b_pad = budget + n_tiles * align
    delta = bounds[:-1] - raw_bounds[:-1]
    dd = delta - jnp.concatenate([jnp.zeros((1,), jnp.int32), delta[:-1]])
    shift = jnp.zeros((budget,), jnp.int32).at[raw_bounds[:-1]].add(
        dd, mode="drop")
    src_valid = tile_s < n_tiles
    new_pos = jnp.where(src_valid, slots + jnp.cumsum(shift), b_pad)
    out_src = jnp.full((b_pad,), budget, jnp.int32).at[new_pos].set(
        src_slot, mode="drop")
    out += [bounds, new_pos, out_src]
    if upto == 3:
        return out
    # --- s4: perm inverse sort
    _, perm = jax.lax.sort(
        (src_slot, jnp.where(src_valid, new_pos, b_pad)), num_keys=1)
    out += [perm]
    if upto == 4:
        return out
    # --- s5: out_tile cumsum over b_pad
    out_valid = out_src < budget
    tile_heads = jnp.zeros((b_pad,), jnp.int32).at[bounds[1:]].add(
        1, mode="drop")
    out_tile = jnp.cumsum(tile_heads)
    out_tile = jnp.where(out_valid, out_tile, n_tiles).astype(jnp.int32)
    out += [out_tile]
    return out


def timeit(name, fn, *xs):
    @jax.jit
    def chained(*xs):
        def body(i, c):
            x0 = jax.tree.map(
                lambda a: a + a.dtype.type(1e-30) * c.astype(a.dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, xs[0])
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
    proj = jax.jit(lambda m, s, q: project_gaussians(
        m, s, q, jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj),
        cam.tanfovx, cam.tanfovy, WIDTH, HEIGHT, TILE))(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats))
    jax.block_until_ready(proj)

    names = ["s0 argsort+gathers", "s1 ffills+tileid", "s2 uint32 sort",
             "s3 align scatter", "s4 perm sort", "s5 out_tile cumsum"]
    prev = 0.0
    for k, nm in enumerate(names):
        t = timeit(f"prefix..{nm}", lambda p, kk=k: stages(p, kk), proj)
        print(f"   -> {nm:24s} {t - prev:8.2f} ms (delta)")
        prev = t


if __name__ == "__main__":
    main()
