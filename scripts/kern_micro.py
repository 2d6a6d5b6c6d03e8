#!/usr/bin/env python
"""Micro-harness: separate per-TILE from per-CHUNK cost in the blend kernels.

Times blend_forward_pallas / blend_backward_pallas on a fixed packed table
while varying ONLY tile_bounds (same shapes -> jit cache shared):
  - spread: every tile gets ~equal chunks (bench-like, n_tiles tile-setups)
  - packed: all chunks in the first K tiles (few tile-setups, same chunk count)
Fit: time = a*n_tiles_active + b*n_chunks.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=768 * 1024)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from contextgs_tpu.ops.rasterize.tile_kernel import (
        OUTC, PACK, PIX, blend_backward_pallas, blend_forward_pallas)

    W, H, TILE = 1280, 720, 16
    tiles_x, tiles_y = 80, 45
    n_tiles = tiles_x * tiles_y
    C = args.chunk
    b_pad = args.budget + n_tiles * C

    rng = np.random.default_rng(0)
    packed = np.zeros((PACK, b_pad), np.float32)
    # plausible instance rows: mean near tile centers, small conic, mid opacity
    packed[0] = rng.uniform(0, W, b_pad)
    packed[1] = rng.uniform(0, H, b_pad)
    packed[2] = 0.1; packed[4] = 0.1; packed[3] = 0.0
    packed[5] = rng.uniform(0.2, 0.9, b_pad)
    packed[6:9] = rng.uniform(0, 1, (3, b_pad))
    packed = jnp.asarray(packed)

    def bounds_for(chunks_per_tile, active_tiles):
        per = np.zeros(n_tiles, np.int64)
        per[:active_tiles] = chunks_per_tile * C
        b = np.concatenate([[0], np.cumsum(per)]).astype(np.int32)
        assert b[-1] <= b_pad, (b[-1], b_pad)
        return jnp.asarray(b)

    cot = jnp.ones((OUTC, n_tiles * PIX), jnp.float32)
    ITERS = args.iters

    @jax.jit
    def fwd_n(p, b):
        def body(i, acc):
            pp = p + 1e-30 * acc
            out, _ = blend_forward_pallas(pp, b, n_tiles, tiles_x, TILE, C,
                                          False)
            return 0.5 * acc + 1e-20 * jnp.sum(out[0, ::PIX])
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    @jax.jit
    def bwd_n(p, b, f, w, c):
        def body(i, acc):
            pp = p + 1e-30 * acc
            g = blend_backward_pallas(pp, b, f, w, c, n_tiles, tiles_x, TILE,
                                      C, False)
            return 0.5 * acc + 1e-20 * jnp.sum(g[0, ::1024])
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    configs = [
        # (label, chunks/tile, active tiles)
        ("1 chunk x 3600 tiles  (3600ch)", 1, 3600),
        ("2 chunk x 1800 tiles  (3600ch)", 2, 1800),
        ("8 chunk x  450 tiles  (3600ch)", 8, 450),
        ("32 chunk x 112 tiles  (3584ch)", 32, 112),
        ("2 chunk x 3600 tiles  (7200ch)", 2, 3600),
        ("16 chunk x 450 tiles  (7200ch)", 16, 450),
    ]
    fwd1 = jax.jit(lambda p, b: blend_forward_pallas(
        p, b, n_tiles, tiles_x, TILE, C, False))
    for label, cpt, act in configs:
        b = bounds_for(cpt, act)
        fetch(fwd_n(packed, b))
        t0 = time.time()
        fetch(fwd_n(packed, b))
        dt_f = (time.time() - t0) / ITERS * 1e3
        out, wm = fwd1(packed, b)
        fetch(bwd_n(packed, b, out, wm, cot))
        t0 = time.time()
        fetch(bwd_n(packed, b, out, wm, cot))
        dt_b = (time.time() - t0) / ITERS * 1e3
        print(f"{label}: fwd {dt_f:7.2f} ms   bwd {dt_b:7.2f} ms")


if __name__ == "__main__":
    main()
