#!/usr/bin/env python
"""Stage-wise rasterizer profile on the bench shapes (real chip).

Times projection / expand_and_sort / pack-gather / blend fwd / blend bwd /
gradient scatter separately, each chained inside one jit via fori_loop so the
numbers reflect device time, not tunnel dispatch (see memory: axon RTT ~0.4s).
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import math

import jax
import jax.numpy as jnp
import numpy as np

from contextgs_tpu.ops.rasterize import rasterize
from contextgs_tpu.ops.rasterize.projection import project_gaussians
from contextgs_tpu.ops.rasterize.sorting import expand_and_sort
from contextgs_tpu.ops.rasterize.tile_kernel import (PACK,
                                                     blend_backward_pallas,
                                                     blend_forward_pallas)
from contextgs_tpu.scene.cameras import Camera

WIDTH, HEIGHT, N_GAUSS, ITERS = 1280, 720, 200_000, 10
BUDGET, CHUNK = 1 << 20, 128
TILE = 16


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
    wv = jnp.asarray(cam.world_view)
    fp = jnp.asarray(cam.full_proj)
    tiles_x = WIDTH // TILE
    tiles_y = HEIGHT // TILE
    n_tiles = tiles_x * tiles_y

    args = tuple(map(jnp.asarray, (means, scales, quats, colors, opac)))

    def proj_fn(m, s, q):
        return project_gaussians(m, s, q, wv, fp, cam.tanfovx, cam.tanfovy,
                                 WIDTH, HEIGHT, TILE)

    proj = jax.jit(proj_fn)(*args[:3])
    jax.block_until_ready(proj)

    inst = jax.jit(lambda p: expand_and_sort(p, tiles_x, tiles_y, BUDGET,
                                             align=CHUNK))(proj)
    jax.block_until_ready(inst)

    def pack_fn(proj, inst, colors, opac):
        g = inst.gauss_ids
        gauss_rows = jnp.concatenate([
            proj.means2d, proj.conics, opac[:, None], colors], axis=1)
        packed = gauss_rows[g]
        packed = packed.at[:, 5].set(packed[:, 5] * inst.valid.astype(packed.dtype))
        packed = jnp.concatenate([
            packed, jnp.zeros((packed.shape[0], PACK - 9), packed.dtype)], axis=1)
        return packed.T

    packed = jax.jit(pack_fn)(proj, inst, args[3], args[4])
    jax.block_until_ready(packed)

    fwd_out = jax.jit(lambda p, b: blend_forward_pallas(
        p, b, n_tiles, tiles_x, TILE, CHUNK, False))(packed, inst.tile_bounds)
    jax.block_until_ready(fwd_out)
    cot = jnp.ones_like(fwd_out)

    def timeit(name, fn, *xs):
        # chain iterations by perturbing arg-0 float leaves with the carry;
        # consume EVERY output leaf into the carry so XLA cannot DCE or
        # slice-through any part of the stage
        @jax.jit
        def chained(*xs):
            def body(i, c):
                x0 = jax.tree.map(
                    lambda a: a + 0.0 * c
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
        print(f"{name:24s} {dt:8.2f} ms")
        return dt

    total = 0.0
    total += timeit("projection", lambda m, s, q: proj_fn(m, s, q),
                    *args[:3])
    total += timeit("expand_and_sort",
                    lambda p: expand_and_sort(p, tiles_x, tiles_y, BUDGET,
                                              align=CHUNK),
                    proj)
    total += timeit("pack_gather",
                    lambda pr, i, c, o: pack_fn(pr, i, c, o),
                    proj, inst, args[3], args[4])
    total += timeit("blend_fwd",
                    lambda p, b: blend_forward_pallas(
                        p, b, n_tiles, tiles_x, TILE, CHUNK, False),
                    packed, inst.tile_bounds)
    total += timeit("blend_bwd",
                    lambda p, f, c, b: blend_backward_pallas(
                        p, b, f, c, n_tiles, tiles_x, TILE, CHUNK, False),
                    packed, fwd_out, cot, inst.tile_bounds)

    def scatter_fn(gr, g):
        return jnp.zeros((N_GAUSS, 9), jnp.float32).at[g].add(gr.T[:, :9])

    total += timeit("grad_scatter", scatter_fn,
                    jnp.ones_like(packed), inst.gauss_ids)
    print(f"{'TOTAL (stages)':24s} {total:8.2f} ms")
    print(f"instances: {int(inst.total)}  aligned table: {packed.shape[1]}  "
          f"segments sum: {int(inst.tile_bounds[-1])}")


def main2():
    """End-to-end fwd and fwd+bwd timing of the public rasterize()."""
    import math
    import jax
    import jax.numpy as jnp
    from contextgs_tpu.ops.rasterize import rasterize
    from contextgs_tpu.scene.cameras import Camera
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
    kw = dict(world_view=jnp.asarray(cam.world_view),
              full_proj=jnp.asarray(cam.full_proj),
              tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
              width=WIDTH, height=HEIGHT, bg=jnp.zeros(3),
              budget=BUDGET, chunk_size=CHUNK, backend="pallas")
    args = tuple(map(jnp.asarray, (means, scales, quats, colors, opac)))

    def fwd_loss(*a):
        out = rasterize(*a, **kw)
        return jnp.sum(out.image * out.image)

    import time as _t
    for name, fn in [("e2e fwd", fwd_loss),
                     ("e2e fwd+bwd", lambda *a: sum(
                         jnp.sum(g) for g in jax.grad(fwd_loss, argnums=(0,1,2,3,4))(*a)))]:
        @jax.jit
        def chained(ms, rest):
            def body(i, m):
                v = fn(m, *rest)
                return m + 1e-20 * v
            return jax.lax.fori_loop(0, ITERS, body, ms)
        r = chained(args[0], args[1:])
        r.block_until_ready()
        t0 = _t.time(); chained(args[0], args[1:]).block_until_ready()
        print(f"{name:24s} {(_t.time()-t0)/ITERS*1e3:8.2f} ms")


if __name__ == "__main__":
    main2() if os.environ.get("PROFILE_E2E") else main()
