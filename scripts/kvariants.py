#!/usr/bin/env python
"""Variant forward kernels: decompose per-tile and per-chunk cost.

Variants (cumulative build-up toward the real fwd kernel):
  v0_empty      per-tile: read bounds, write epilogue zeros; no chunk loop
  v1_dmaonly    + chunk loop with DMA (double-buffered), no compute
  v2_power      + coef build + power matmul + alpha (no scan, no color)
  v3_scan       + log-domain transmittance scan
  v4_full       + color matmul + t_run update + epilogue (== real kernel)

Run at (1 chunk x 3600 tiles) and (8 chunks x 450 tiles) and (2x3600).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from contextgs_tpu.ops.rasterize.tile_kernel import (
    OUTC, PACK, PIX, _chunk_coef, _pixel_basis, _power_alpha, _scan_matmul,
    _tile_center, _tri)

TB = 8


def make_kernel(level: int, chunk_size: int, tiles_x: int, tile_size: int):
    C = chunk_size

    def kern(bounds_ref, packed_hbm, out_ref, chunk, sem):
        step = pl.program_id(0)
        tri = _tri(C, strict=True)
        P = _pixel_basis(tile_size)
        for j in range(TB):
            t = step * TB + j
            start = bounds_ref[t]
            end = bounds_ref[t + 1]
            nchunks = (end - start) // C
            cx, cy = _tile_center(t, tiles_x, tile_size, 0)

            def dma(slot, ci):
                off = pl.multiple_of(start + ci * C, 128)
                return pltpu.make_async_copy(
                    packed_hbm.at[:, pl.ds(off, C)], chunk.at[slot],
                    sem.at[slot])

            t0 = jnp.ones((PIX, 1), jnp.float32)
            rgb0 = jnp.zeros((PIX, 3), jnp.float32)

            if level == 0:
                t_run, rgb = t0, rgb0
            else:
                def body(ci, st):
                    t_run, rgb = st
                    slot = jax.lax.rem(ci, 2)
                    @pl.when(ci == 0)
                    def _():
                        dma(0, 0).start()
                    @pl.when(ci + 1 < nchunks)
                    def _():
                        dma(1 - slot, ci + 1).start()
                    dma(slot, ci).wait()
                    if level == 1:
                        rgb = rgb + chunk[slot, 0:3, 0:1].T * 1e-30
                        return t_run, rgb
                    coef, row = _chunk_coef(chunk[slot], cx, cy)
                    power, gauss, raw, alpha = _power_alpha(P, coef,
                                                            row["op"], True)
                    if level == 2:
                        rgb = rgb + jnp.sum(alpha, 1, keepdims=True) * 1e-30
                        return t_run, rgb
                    one_m = 1.0 - alpha
                    s_excl = _scan_matmul(jnp.log1p(-alpha), tri)
                    t_before = t_run * jnp.exp(s_excl)
                    tcum = t_before * one_m
                    include = tcum >= 1e-4
                    w = jnp.where(include, alpha, 0.0) * t_before
                    if level == 3:
                        rgb = rgb + jnp.sum(w, 1, keepdims=True) * 1e-30
                        return t_run, rgb
                    col = chunk[slot, 6:9, :]
                    rgb = rgb + jax.lax.dot_general(
                        w, col, (((1,), (1,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
                    t_run = jnp.min(jnp.where(include, tcum, t_run), axis=1,
                                    keepdims=True)
                    return t_run, rgb

                t_run, rgb = jax.lax.fori_loop(0, nchunks, body, (t0, rgb0))

            logt = jnp.log(jnp.maximum(t_run, 1e-30))
            wm = jnp.broadcast_to(jnp.float32(0), (PIX, 1))
            out_ref[j] = jnp.concatenate(
                [rgb, t_run, logt, wm, jnp.zeros((PIX, OUTC - 6), jnp.float32)],
                axis=1)

    return kern


def run_variant(level, packed, bounds, n_tiles, tiles_x, C, iters=20):
    n_steps = -(-n_tiles // TB)
    kern = make_kernel(level, C, tiles_x, 16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TB, PIX, OUTC), lambda i, b: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, PACK, C), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    f = pl.pallas_call(kern, grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct(
                           (n_steps * TB, PIX, OUTC), jnp.float32))

    @jax.jit
    def chained(p, b):
        def body(i, c):
            out = f(b, p + 1e-30 * c)
            return 0.5 * c + 1e-20 * out[0, 0, 0]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    np.asarray(chained(packed, bounds))
    t0 = time.time()
    np.asarray(chained(packed, bounds))
    return (time.time() - t0) / iters * 1e3


def main():
    C = 128
    tiles_x, tiles_y = 80, 45
    n_tiles = tiles_x * tiles_y
    budget = 768 * 1024
    b_pad = budget + n_tiles * C
    rng = np.random.default_rng(0)
    packed = np.zeros((PACK, b_pad), np.float32)
    packed[0] = rng.uniform(0, 1280, b_pad)
    packed[1] = rng.uniform(0, 720, b_pad)
    packed[2] = 0.1; packed[4] = 0.1
    packed[5] = rng.uniform(0.2, 0.9, b_pad)
    packed[6:9] = rng.uniform(0, 1, (3, b_pad))
    packed = jnp.asarray(packed)

    def bounds_for(cpt, act):
        per = np.zeros(n_tiles, np.int64)
        per[:act] = cpt * C
        return jnp.asarray(
            np.concatenate([[0], np.cumsum(per)]).astype(np.int32))

    cfgs = [("1x3600", bounds_for(1, 3600)), ("2x3600", bounds_for(2, 3600)),
            ("8x450", bounds_for(8, 450))]
    for level in range(5):
        row = [f"v{level}"]
        for name, b in cfgs:
            dt = run_variant(level, packed, b, n_tiles, tiles_x, C)
            row.append(f"{name}: {dt:6.2f}")
        print("   ".join(row))


if __name__ == "__main__":
    main()
