#!/usr/bin/env python
"""Round-3 micro: itemize the glue costs (reduce pieces, sort pieces, ffill)
at bench shapes to target the structural rework."""

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


def timeit(name, fn, *xs, iters=20):
    @jax.jit
    def chained(*xs):
        def body(i, c):
            if jnp.issubdtype(xs[0].dtype, jnp.floating):
                x0 = xs[0] + xs[0].dtype.type(1e-30) * c
            else:
                x0 = xs[0] + (c.astype(jnp.int32) & 0)
            out = fn(x0, *xs[1:])
            s = sum(jnp.sum(l).astype(jnp.float32)
                    for l in jax.tree_util.tree_leaves(out))
            return 0.5 * c + 1e-20 * s
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    fetch(chained(*xs))
    t0 = time.time()
    fetch(chained(*xs))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:46s} {dt:8.3f} ms")
    return dt


def main():
    B_PAD = 1_074_432
    B = 786_432
    G = 200_000
    PACK = 16
    rng = np.random.default_rng(0)

    g16 = jnp.asarray(rng.normal(size=(PACK, B_PAD)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(B_PAD)[:B].astype(np.int32))
    seg = np.sort(rng.integers(0, B, G + 1)).astype(np.int32)
    seg[0], seg[-1] = 0, B
    seg = jnp.asarray(seg)
    inv = jnp.asarray(rng.permutation(G).astype(np.int32))

    # --- reduce pieces ---
    timeit("xpose [16,Bp]->[Bp,16] (barrier)",
           lambda g: jax.lax.optimization_barrier(g.T) + 0.0, g16)
    gRM = jnp.asarray(rng.normal(size=(B_PAD + 1, PACK)).astype(np.float32))
    timeit("perm row-gather [B from Bp+1,16]", lambda g, p: g[p], gRM, perm)
    gD = jnp.asarray(rng.normal(size=(B, PACK)).astype(np.float32))
    timeit("cumsum [B,16] axis0", lambda g: jnp.cumsum(g, axis=0), gD)
    cs = jnp.asarray(rng.normal(size=(B + 1, PACK)).astype(np.float32))
    timeit("boundary gather [G+1 from B+1,16]", lambda c, s: c[s], cs, seg)
    pr = jnp.asarray(rng.normal(size=(G, PACK)).astype(np.float32))
    timeit("inv_order gather [G,16]",
           lambda p, i: jax.lax.optimization_barrier(p[i])[:, :9], pr, inv)

    # --- pack pieces ---
    rows = jnp.asarray(rng.normal(size=(G + 1, PACK)).astype(np.float32))
    ra = jnp.asarray(rng.integers(0, G + 1, B_PAD).astype(np.int32))
    timeit("pack row-gather [Bp from G+1,16]", lambda r, a: r[a], rows, ra)
    timeit("pack gather + .T barrier",
           lambda r, a: jax.lax.optimization_barrier(r[a]).T + 0.0, rows, ra)

    # --- sort pieces (phase-2 scale) ---
    B_FULL = B + 3600 * 128
    keys = jnp.asarray(rng.integers(0, 2**31, B_FULL, np.int64)
                       .astype(np.uint32))
    pay = jnp.asarray(rng.integers(0, G, B_FULL).astype(np.int32))
    timeit("sort u32 [1.25M] + 1 payload",
           lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=False),
           keys, pay)
    srt = jnp.sort(keys)
    timeit("sort PRESORTED u32 [1.25M] + 1 payload",
           lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=False),
           srt, pay)
    iot = jnp.arange(B_FULL, dtype=jnp.int32)
    timeit("inversion sort [1.25M] (i32 key + iota)",
           lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=False),
           pay, iot)

    # --- ffill pieces ---
    offs = jnp.asarray(np.sort(rng.integers(0, B, G)).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 2**30, G).astype(np.int32))

    def ffill(v, o):
        d = v - jnp.concatenate([jnp.zeros((1,), v.dtype), v[:-1]])
        heads = jnp.zeros((B,), v.dtype).at[o].add(
            d, mode="drop", indices_are_sorted=True)
        return jnp.cumsum(heads)

    timeit("ffill scatter+cumsum (1 word)", ffill, vals, offs)

    # scatter alone vs cumsum alone
    timeit("scatter 200k->786k", lambda v, o: jnp.zeros(
        (B,), v.dtype).at[o].add(v, mode="drop", indices_are_sorted=True),
        vals, offs)
    hv = jnp.asarray(rng.integers(0, 3, B).astype(np.int32))
    timeit("cumsum [786k] i32", lambda h: jnp.cumsum(h), hv)


if __name__ == "__main__":
    main()
