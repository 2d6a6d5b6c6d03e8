#!/usr/bin/env python
"""Decompose blend-forward kernel cost: variants with pieces removed."""
import os, sys, time, math, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import contextgs_tpu.ops.rasterize.tile_kernel as tk
from contextgs_tpu.ops.rasterize import project_gaussians, _pack
from contextgs_tpu.ops.rasterize.sorting import expand_and_sort
from contextgs_tpu.scene.cameras import Camera

PACK, PIX, OUTC = tk.PACK, tk.PIX, tk.OUTC
T_EPS = tk.T_EPS

width, height, n_gauss = 1280, 720, 200_000
budget, chunk_size = 1 << 20, 128
tile_size, tiles_x, tiles_y = 16, 80, 45
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
inst = jax.block_until_ready(jax.jit(functools.partial(
    expand_and_sort, tiles_x=tiles_x, tiles_y=tiles_y, budget=budget,
    align=chunk_size))(proj))
packed = jax.block_until_ready(jax.jit(_pack)(
    gauss_rows, inst.order, inst.rank_aligned))


def make_variant(mode, tps=8):
    C = chunk_size

    def one_tile(bounds_ref, packed_hbm, out_ref, chunk, pf, sem, sem_pf,
                 t, j):
        start = bounds_ref[t]
        end = bounds_ref[t + 1]
        P, cx, cy = tk._tile_basis(t, tiles_x, tile_size, 0)
        nchunks = (end - start) // C

        def dma(slot, ci):
            off = pl.multiple_of(start + ci * C, 128)
            return pltpu.make_async_copy(packed_hbm.at[:, pl.ds(off, C)],
                                         chunk.at[slot], sem.at[slot])

        @pl.when(nchunks > 0)
        def _():
            pltpu.make_async_copy(packed_hbm.at[:, pl.ds(0, C)], pf.at[j],
                                  sem_pf.at[j]).wait()
            chunk[0] = pf[j]

        def cond(state):
            ci, t_run, _ = state
            if mode in ("noet", "noetmin"):
                return ci < nchunks
            return (ci < nchunks) & (jnp.max(t_run) >= T_EPS)

        def body(state):
            ci, t_run, rgb = state
            slot = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < nchunks)
            def _():
                dma(1 - slot, ci + 1).start()

            @pl.when(ci > 0)
            def _():
                dma(slot, ci).wait()

            if mode == "empty":
                rgb = rgb + jnp.sum(chunk[slot, 0:3, :]).reshape(1, 1)
                return ci + 1, t_run, rgb
            coef, row = tk._chunk_coef(chunk[slot], cx, cy)
            if mode in ("mxuscan", "noet", "noetmin"):
                _, _, _, alpha = tk._power_alpha(P, coef, row["op"])
                one_m = 1.0 - alpha
                s = jnp.log1p(-alpha)
                lane_i = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
                lane_j = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
                U_strict = (lane_i < lane_j).astype(jnp.float32)
                S_excl = jax.lax.dot_general(
                    s, U_strict, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                Tb = t_run * jnp.exp(S_excl)
                tcum = Tb * one_m
                include = tcum >= T_EPS
                w = jnp.where(include, alpha, 0.0) * Tb
                col = chunk[slot, 6:9, :]
                rgb = rgb + jax.lax.dot_general(
                    w, col, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                if mode != "noetmin":
                    t_run = jnp.min(jnp.where(include, tcum, t_run), axis=1,
                                    keepdims=True)
                return ci + 1, t_run, rgb
            if mode == "noexp":
                power = jax.lax.dot_general(
                    P, coef, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                alpha = jnp.clip(-power * 0.01, 0.0, 0.5)
            else:
                _, _, _, alpha = tk._power_alpha(P, coef, row["op"])
            one_m = 1.0 - alpha
            if mode == "noscan":
                cum = one_m
            else:
                cum = tk._cumprod_lanes(one_m)
            tcum = t_run * cum
            include = tcum >= T_EPS
            alpha = jnp.where(include, alpha, 0.0)
            if mode == "nodiv":
                w = alpha * tcum
            else:
                w = alpha * (tcum / one_m)
            col = chunk[slot, 6:9, :]
            rgb = rgb + jax.lax.dot_general(
                w, col, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            t_run = jnp.min(jnp.where(include, tcum, t_run), axis=1,
                            keepdims=True)
            return ci + 1, t_run, rgb

        t0 = jnp.ones((PIX, 1), jnp.float32)
        rgb0 = jnp.zeros((PIX, 3), jnp.float32)
        ci_end, t_run, rgb = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t0, rgb0))

        @pl.when(ci_end < nchunks)
        def _():
            dma(jax.lax.rem(ci_end, 2), ci_end).wait()

        out_ref[j, :, 0:3] = rgb[0:PIX] if mode == "empty" else rgb
        out_ref[j, :, 3] = t_run[:, 0]
        out_ref[j, :, 4:OUTC] = jnp.zeros((PIX, OUTC - 4), jnp.float32)

    def kernel(bounds_ref, packed_hbm, out_ref, chunk, pf, sem, sem_pf):
        step = pl.program_id(0)
        tk._first_chunk_prefetch(bounds_ref, packed_hbm, pf, sem_pf, step,
                                 C, tps)
        for j in range(tps):
            one_tile(bounds_ref, packed_hbm, out_ref, chunk, pf, sem,
                     sem_pf, step * tps + j, j)

    n_steps = -(-n_tiles // tps)
    n_pad = n_steps * tps
    tb_in = jnp.concatenate(
        [inst.tile_bounds,
         jnp.broadcast_to(inst.tile_bounds[-1:], (n_pad - n_tiles,))])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tps, PIX, OUTC), lambda i, b: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, PACK, C), jnp.float32),
            pltpu.VMEM((tps, PACK, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((tps,)),
        ])
    fn = pl.pallas_call(kernel, grid_spec=grid_spec,
                        out_shape=jax.ShapeDtypeStruct((n_pad, PIX, OUTC),
                                                       jnp.float32))
    return jax.jit(lambda b, p: fn(b, p)), tb_in


# fix one_tile signature binding bug: j index
def run(mode):
    try:
        fn, tb_in = make_variant(mode)
        o = jax.block_until_ready(fn(tb_in, packed))
        t0 = time.perf_counter()
        for _ in range(20):
            o = fn(tb_in, packed)
        jax.block_until_ready(o)
        print(f"{mode:8s} {(time.perf_counter()-t0)/20*1000:7.2f} ms")
    except Exception as e:
        print(f"{mode:8s} FAILED: {str(e)[:200]}")


outs = {}
def run_keep(mode):
    fn, tb_in = make_variant(mode)
    o = jax.block_until_ready(fn(tb_in, packed))
    outs[mode] = np.asarray(o)
    t0 = time.perf_counter()
    for _ in range(20):
        o = fn(tb_in, packed)
    jax.block_until_ready(o)
    print(f"{mode:8s} {(time.perf_counter()-t0)/20*1000:7.2f} ms")

for m in ("mxuscan", "noet", "noetmin", "empty"):
    run(m)
