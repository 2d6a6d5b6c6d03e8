#!/usr/bin/env python
"""Sweep chunk_size / TILES_PER_STEP for the blend kernels."""
import os, sys, time, math, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))
import numpy as np
import jax, jax.numpy as jnp
import contextgs_tpu.ops.rasterize.tile_kernel as tk
from contextgs_tpu.ops.rasterize import project_gaussians, _pack
from contextgs_tpu.ops.rasterize.sorting import expand_and_sort
from contextgs_tpu.scene.cameras import Camera

width, height, n_gauss = 1280, 720, 200_000
budget = 1 << 20
tile_size = 16
tiles_x, tiles_y = 80, 45
n_tiles = tiles_x * tiles_y

rng = np.random.default_rng(0)
means = np.stack([rng.uniform(-3, 3, n_gauss), rng.uniform(-2, 2, n_gauss),
                  rng.uniform(2.0, 12.0, n_gauss)], 1).astype(np.float32)
scales = rng.uniform(0.004, 0.02, (n_gauss, 3)).astype(np.float32)
quats = rng.normal(size=(n_gauss, 4)).astype(np.float32)
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
colors = rng.uniform(0, 1, (n_gauss, 3)).astype(np.float32)
opac = rng.uniform(0.2, 0.9, n_gauss).astype(np.float32)
cam = Camera(uid=0, colmap_id=0, R=np.eye(3), T=np.zeros(3), fov_x=1.2,
             fov_y=2 * math.atan(math.tan(0.6) * height / width),
             image=None, width=width, height=height)
wv, fp = jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj)
proj = jax.block_until_ready(jax.jit(lambda m, s, q: project_gaussians(
    m, s, q, wv, fp, cam.tanfovx, cam.tanfovy, width, height, tile_size,
    1.0))(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats)))
gauss_rows = jnp.concatenate([proj.means2d, proj.conics,
                              jnp.asarray(opac)[:, None],
                              jnp.asarray(colors)], axis=1)

def timeit(fn, *a, iters=20):
    o = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1000, o

for chunk in (128, 256):
    inst = jax.block_until_ready(jax.jit(functools.partial(
        expand_and_sort, tiles_x=tiles_x, tiles_y=tiles_y, budget=budget,
        align=chunk))(proj))
    packed = jax.block_until_ready(jax.jit(_pack)(
        gauss_rows, inst.order, inst.rank_aligned))
    for tps in (4, 8, 16, 32):
        tk.TILES_PER_STEP = tps
        fwd = jax.jit(functools.partial(
            tk.blend_forward_pallas, n_tiles=n_tiles, tiles_x=tiles_x,
            tile_size=tile_size, chunk_size=chunk, interpret=False))
        tf, out = timeit(fwd, packed, inst.tile_bounds)
        cot = jnp.ones_like(out)
        bwd = jax.jit(functools.partial(
            tk.blend_backward_pallas, n_tiles=n_tiles, tiles_x=tiles_x,
            tile_size=tile_size, chunk_size=chunk, interpret=False))
        tb, _ = timeit(bwd, packed, inst.tile_bounds, out, cot)
        print(f"chunk={chunk:4d} tps={tps:3d}: fwd {tf:7.2f} ms  bwd {tb:7.2f} ms")
