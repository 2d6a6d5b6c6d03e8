#!/usr/bin/env python
"""Stage-level timing of the rasterization pipeline at the bench config."""
import os, sys, time, math, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))
import numpy as np
import jax, jax.numpy as jnp

from contextgs_tpu.ops.rasterize import rasterize, project_gaussians
from contextgs_tpu.ops.rasterize.sorting import expand_and_sort, padded_size
from contextgs_tpu.ops.rasterize.tile_kernel import (
    blend_forward_pallas, blend_backward_pallas, PACK)
from contextgs_tpu.scene.cameras import Camera

width, height, n_gauss = 1280, 720, 200_000
budget, chunk = 1 << 20, 128
tile_size = 16
tiles_x = (width + tile_size - 1) // tile_size
tiles_y = (height + tile_size - 1) // tile_size
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
wv = jnp.asarray(cam.world_view); fp = jnp.asarray(cam.full_proj)
tanx, tany = cam.tanfovx, cam.tanfovy

args = tuple(map(jnp.asarray, (means, scales, quats, colors, opac)))

def timeit(name, fn, *a, iters=20):
    o = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*a)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:32s} {dt:8.2f} ms")
    return o

proj_fn = jax.jit(lambda m, s, q: project_gaussians(
    m, s, q, wv, fp, tanx, tany, width, height, tile_size, 1.0))
proj = timeit("projection fwd", proj_fn, *args[:3])

sort_fn = jax.jit(lambda p: expand_and_sort(p, tiles_x, tiles_y, budget,
                                            align=chunk))
inst = timeit("expand_and_sort", sort_fn, proj)

# pack
from contextgs_tpu.ops.rasterize import _pack
def pack_fn(gr, order, ra):
    return _pack(gr, order, ra)
gauss_rows = jnp.concatenate([proj.means2d, proj.conics, args[4][:, None],
                              args[3]], axis=1)
pack_j = jax.jit(pack_fn)
packed = timeit("pack (row gathers)", pack_j, gauss_rows, inst.order,
                inst.rank_aligned)

fwd = jax.jit(functools.partial(blend_forward_pallas, n_tiles=n_tiles,
                                tiles_x=tiles_x, tile_size=tile_size,
                                chunk_size=chunk, interpret=False))
out = timeit("blend fwd", fwd, packed, inst.tile_bounds)

cot = jnp.ones_like(out)
bwd = jax.jit(functools.partial(blend_backward_pallas, n_tiles=n_tiles,
                                tiles_x=tiles_x, tile_size=tile_size,
                                chunk_size=chunk, interpret=False))
g = timeit("blend bwd", bwd, packed, inst.tile_bounds, out, cot)

# full fwd+bwd
kw = dict(world_view=wv, full_proj=fp, tanfovx=tanx, tanfovy=tany,
          width=width, height=height, bg=jnp.zeros(3), budget=budget,
          chunk_size=chunk, backend="pallas", interpret=False)
def loss(m, s, q, c, o):
    out = rasterize(m, s, q, c, o, **kw)
    return jnp.sum(out.image) + jnp.sum(out.final_t)
vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))
timeit("full fwd+bwd", vg, *args, iters=10)

# instance stats
tot = int(inst.total)
print(f"instances: {tot}, aligned table {padded_size(budget, n_tiles, chunk)}")
seg = np.asarray(inst.tile_bounds)
print(f"aligned total {seg[-1]}, pad frac {(seg[-1]-tot)/max(seg[-1],1):.2%}")
