#!/usr/bin/env python
"""Incremental-output timing of expand_and_sort internals."""
import os, sys, time, math, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))
import numpy as np
import jax, jax.numpy as jnp
from contextgs_tpu.ops.rasterize import project_gaussians
from contextgs_tpu.ops.rasterize.sorting import padded_size
from contextgs_tpu.scene.cameras import Camera

width, height, n_gauss = 1280, 720, 200_000
budget, align = 1 << 20, 128
tile_size, tiles_x, tiles_y = 16, 80, 45
n_tiles = tiles_x * tiles_y

rng = np.random.default_rng(0)
means = np.stack([rng.uniform(-3, 3, n_gauss), rng.uniform(-2, 2, n_gauss),
                  rng.uniform(2.0, 12.0, n_gauss)], 1).astype(np.float32)
scales = rng.uniform(0.004, 0.02, (n_gauss, 3)).astype(np.float32)
quats = rng.normal(size=(n_gauss, 4)).astype(np.float32)
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
cam = Camera(uid=0, colmap_id=0, R=np.eye(3), T=np.zeros(3), fov_x=1.2,
             fov_y=2 * math.atan(math.tan(0.6) * height / width),
             image=None, width=width, height=height)
wv, fp = jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj)
proj = jax.block_until_ready(jax.jit(lambda m, s, q: project_gaussians(
    m, s, q, wv, fp, cam.tanfovx, cam.tanfovy, width, height, tile_size,
    1.0))(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats)))


def staged(p, upto):
    """Replicates expand_and_sort with a stage cut-off."""
    G = p.n_tiles.shape[0]
    wx = max(tiles_x - 1, 1).bit_length()
    wy = max(tiles_y - 1, 1).bit_length()
    ww = max(tiles_x, 1).bit_length()
    wc = max(n_tiles, 1).bit_length()
    dkey = jnp.where(p.n_tiles > 0, p.depths, jnp.inf)
    iota_g = jnp.arange(G, dtype=jnp.int32)
    b_rmx = p.rect_min[:, 0]
    b_rmy = p.rect_min[:, 1]
    b_rw = jnp.maximum(p.rect_max[:, 0] - b_rmx, 1)
    b_cnt = p.n_tiles.astype(jnp.int32)
    u = jnp.uint32
    gpack = (b_rmx.astype(u) | (b_rmy.astype(u) << wx)
             | (b_rw.astype(u) << (wx + wy))
             | (b_cnt.astype(u) << (wx + wy + ww)))
    _, gpack_s, order = jax.lax.sort((dkey, gpack, iota_g), num_keys=1,
                                     is_stable=True)
    rmin_x = (gpack_s & ((1 << wx) - 1)).astype(jnp.int32)
    rmin_y = ((gpack_s >> wx) & ((1 << wy) - 1)).astype(jnp.int32)
    rect_w = ((gpack_s >> (wx + wy)) & ((1 << ww) - 1)).astype(jnp.int32)
    counts = (gpack_s >> (wx + wy + ww)).astype(jnp.int32)
    incl = jnp.cumsum(counts)
    offsets = (incl - counts).astype(jnp.int32)
    seg_bounds = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  incl.astype(jnp.int32)])
    if upto == "depth_sort":
        return order, seg_bounds
    total = jnp.minimum(incl[-1], budget)
    slots = jnp.arange(budget, dtype=jnp.int32)
    valid = slots < total

    def ffill(vals):
        d = vals - jnp.concatenate([jnp.zeros((1,), vals.dtype), vals[:-1]])
        heads = jnp.zeros((budget,), vals.dtype).at[offsets].add(d, mode="drop")
        return jnp.cumsum(heads)

    w1 = ffill((iota_g << (ww + wy)) | (rect_w << wy) | rmin_y)
    w2 = ffill((offsets << wx) | rmin_x)
    rank = jax.lax.shift_right_logical(w1, ww + wy)
    rect_w_f = (w1 >> wy) & ((1 << ww) - 1)
    rmin_y_f = w1 & ((1 << wy) - 1)
    off_fill = jax.lax.shift_right_logical(w2, wx)
    rmin_x_f = w2 & ((1 << wx) - 1)
    rank = jnp.where(valid, jnp.clip(rank, 0, max(G - 1, 0)), G)
    rect_w_f = jnp.maximum(rect_w_f, 1)
    k = slots - off_fill
    ty = (k.astype(jnp.float32) / rect_w_f.astype(jnp.float32)).astype(jnp.int32)
    tx = k - ty * rect_w_f
    tile = (rmin_y_f + ty) * tiles_x + rmin_x_f + tx
    tile = jnp.where(valid, tile, n_tiles).astype(jnp.int32)
    if upto == "fills":
        return order, seg_bounds, rank, tile
    bits_slot = max(1, (budget - 1).bit_length())
    key = (tile.astype(jnp.uint32) << bits_slot) | slots.astype(jnp.uint32)
    key_s, rank_s = jax.lax.sort((key, rank), num_keys=1)
    tile_s = (key_s >> bits_slot).astype(jnp.int32)
    src_slot = (key_s & ((1 << bits_slot) - 1)).astype(jnp.int32)
    if upto == "tile_sort":
        return order, seg_bounds, rank_s, tile_s
    raw_bounds = jnp.searchsorted(
        tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left",
        method="sort"
    ).astype(jnp.int32)
    if upto == "bounds":
        return order, seg_bounds, rank_s, raw_bounds
    seg_len = raw_bounds[1:] - raw_bounds[:-1]
    pad_len = ((seg_len + align - 1) // align) * align
    bounds = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(pad_len).astype(jnp.int32)])
    b_pad = padded_size(budget, n_tiles, align)
    delta = bounds[:-1] - raw_bounds[:-1]
    dd = delta - jnp.concatenate([jnp.zeros((1,), jnp.int32), delta[:-1]])
    shift = jnp.zeros((budget,), jnp.int32).at[raw_bounds[:-1]].add(
        dd, mode="drop")
    src_valid = tile_s < n_tiles
    new_pos = jnp.where(src_valid, slots + jnp.cumsum(shift), b_pad)
    out_rank = jnp.full((b_pad,), G, jnp.int32).at[new_pos].set(
        rank_s, mode="drop")
    if upto == "scatter":
        return order, seg_bounds, out_rank, bounds
    _, perm = jax.lax.sort(
        (src_slot, jnp.where(src_valid, new_pos, b_pad)), num_keys=1)
    return order, seg_bounds, out_rank, bounds, perm


def timeit(name, fn, *a, iters=20):
    o = jax.block_until_ready(jax.jit(fn)(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = jax.jit(fn)(*a)
    jax.block_until_ready(o)
    print(f"{name:16s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms")


for stage in ("depth_sort", "fills", "tile_sort", "bounds", "scatter", "all"):
    timeit(stage, functools.partial(staged, upto=stage), proj)
