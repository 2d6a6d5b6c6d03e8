#!/usr/bin/env python
"""Primitive-level timing for the expand_and_sort stage."""
import os, sys, time, math
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))
import numpy as np
import jax, jax.numpy as jnp
from contextgs_tpu.ops.rasterize import project_gaussians
from contextgs_tpu.ops.rasterize.sorting import expand_and_sort
from contextgs_tpu.scene.cameras import Camera

width, height, n_gauss = 1280, 720, 200_000
budget, chunk = 1 << 20, 128
tile_size = 16
tiles_x, tiles_y = 80, 45
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
proj = jax.jit(lambda m, s, q: project_gaussians(
    m, s, q, wv, fp, cam.tanfovx, cam.tanfovy, width, height, tile_size,
    1.0))(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats))
proj = jax.block_until_ready(proj)

def timeit(name, fn, *a, iters=20):
    o = jax.block_until_ready(jax.jit(fn)(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = jax.jit(fn)(*a)
    jax.block_until_ready(o)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms")
    return o

# full, all outputs
timeit("expand_and_sort ALL outputs",
       lambda p: expand_and_sort(p, tiles_x, tiles_y, budget, align=chunk),
       proj)
# only hot-path outputs
def hot(p):
    i = expand_and_sort(p, tiles_x, tiles_y, budget, align=chunk)
    return i.rank_aligned, i.tile_bounds, i.perm, i.order, i.seg_bounds
timeit("expand_and_sort HOT outputs", hot, proj)
def fwdonly(p):
    i = expand_and_sort(p, tiles_x, tiles_y, budget, align=chunk)
    return i.rank_aligned, i.tile_bounds
timeit("expand_and_sort fwd-only outputs", fwdonly, proj)

# primitive calibration at bench sizes
G, B = n_gauss, budget
k32 = jnp.asarray(rng.integers(0, 2**31, B, dtype=np.int64).astype(np.uint32))
p32 = jnp.asarray(rng.integers(0, 2**31, B, dtype=np.int64).astype(np.int32))
timeit("lax.sort 1M u32 key + 1 payload",
       lambda k, p: jax.lax.sort((k, p), num_keys=1), k32, p32)
timeit("lax.sort 1M u32 key only", lambda k: jax.lax.sort((k,), num_keys=1), k32)
gk = jnp.asarray(rng.uniform(0, 1, G).astype(np.float32))
gp = jnp.asarray(rng.integers(0, 2**31, G, dtype=np.int64).astype(np.uint32))
gi = jnp.arange(G, dtype=jnp.int32)
timeit("lax.sort 200k f32 key + 2 payloads",
       lambda k, p, i: jax.lax.sort((k, p, i), num_keys=1, is_stable=True),
       gk, gp, gi)
idx200k = jnp.asarray(rng.integers(0, B, G).astype(np.int32))
v200k = jnp.asarray(rng.integers(0, 100, G).astype(np.int32))
timeit("scatter-add 200k idx into 1M",
       lambda i, v: jnp.zeros((B,), jnp.int32).at[i].add(v, mode="drop"),
       idx200k, v200k)
idx1m = jnp.asarray(rng.permutation(B).astype(np.int32))
timeit("scatter-set 1M idx into 1.5M",
       lambda i, v: jnp.full((B + n_tiles * chunk,), 0, jnp.int32)
       .at[i].set(v, mode="drop"), idx1m, p32)
timeit("cumsum 1M i32", lambda x: jnp.cumsum(x), p32)
timeit("cumsum 1.5M i32",
       lambda x: jnp.cumsum(x),
       jnp.zeros((B + n_tiles * chunk,), jnp.int32))
srt = jnp.sort(jnp.asarray(rng.integers(0, n_tiles, B).astype(np.int32)))
timeit("searchsorted 3601 in 1M",
       lambda s: jnp.searchsorted(s, jnp.arange(n_tiles + 1, dtype=jnp.int32),
                                  side="left"), srt)
rows = jnp.asarray(rng.uniform(size=(G + 1, 9)).astype(np.float32))
ra = jnp.asarray(rng.integers(0, G, B + n_tiles * chunk).astype(np.int32))
timeit("row-gather 1.5M rows of 9 f32", lambda r, i: r[i], rows, ra)
timeit("row-gather 1M rows of 9 f32", lambda r, i: r[i], rows, ra[:B])
