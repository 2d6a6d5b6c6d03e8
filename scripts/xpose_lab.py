#!/usr/bin/env python
"""Scratch experiments: transpose/layout options for the instance tables.

Q1: cost of XLA global transpose [16,B]<->[B,16] vs blocked [nc,16,C]<->[nc,C,16]
Q2: does Mosaic support in-kernel [16,C]<->[C,16] f32 transposes, and cost?
Q3: row gather [B,16] vs [B,9] rows
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
            return 0.5 * c + 1e-20 * jnp.sum(out).astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    fetch(chained(*xs))
    t0 = time.time()
    fetch(chained(*xs))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.3f} ms")
    return dt


def main():
    B = 1_074_432          # current b_pad at bench shapes
    C = 128
    nc = B // C
    G = 200_000
    rng = np.random.default_rng(0)
    x_cm = jnp.asarray(rng.normal(size=(16, B)).astype(np.float32))
    x_rm = jnp.asarray(rng.normal(size=(B, 16)).astype(np.float32))
    x_3a = jnp.asarray(rng.normal(size=(nc, 16, C)).astype(np.float32))
    x_3b = jnp.asarray(rng.normal(size=(nc, C, 16)).astype(np.float32))
    rows16 = jnp.asarray(rng.normal(size=(G + 1, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, G, B).astype(np.int32))

    timeit("T global [16,B]->[B,16]", lambda x: x.T, x_cm)
    timeit("T global [B,16]->[16,B]", lambda x: x.T, x_rm)
    timeit("T slice9 [16,B]->[B,9]", lambda x: x[:9].T, x_cm)
    timeit("T blocked [nc,16,C]->[nc,C,16]",
           lambda x: x.transpose(0, 2, 1), x_3a)
    timeit("T blocked [nc,C,16]->[nc,16,C]",
           lambda x: x.transpose(0, 2, 1), x_3b)
    timeit("gather rows16 [B]", lambda i: rows16[i], idx)
    timeit("gather rows16->9 [B]", lambda i: rows16[i, :9], idx)
    timeit("gather+reshape3d", lambda i: rows16[i].reshape(nc, C, 16), idx)

    BUD = 786_432
    perm = jnp.asarray(rng.permutation(B)[:BUD].astype(np.int32))
    segb = jnp.asarray(np.sort(rng.integers(0, BUD, G + 1)).astype(np.int32))
    inv = jnp.asarray(rng.permutation(G).astype(np.int32))
    xb16 = jnp.asarray(rng.normal(size=(B + 1, 16)).astype(np.float32))
    inuse = jnp.asarray(rng.random(B + 1) < 0.9)

    timeit("cumsum [768k,16] ax0", lambda x: jnp.cumsum(x[:BUD], 0), xb16)
    timeit("cumsum [768k,9] ax0", lambda x: jnp.cumsum(x[:BUD, :9], 0), xb16)

    def regroup16(xb16, perm, segb, inv):
        g_depth = xb16[perm]                                  # [BUD,16]
        cs = jnp.concatenate([jnp.zeros((1, 16), jnp.float32),
                              jnp.cumsum(g_depth, axis=0)])
        cs_b = cs[jnp.clip(segb, 0, BUD)]
        per_rank = cs_b[1:] - cs_b[:-1]
        return per_rank[inv][:, :9]

    timeit("regroup16 full (gather+cs+2xgather)", regroup16, xb16, perm,
           segb, inv)

    def perm_mask(xb16, perm, inuse):
        p2 = jnp.where(inuse[perm], perm, B)
        return xb16[p2]

    timeit("perm in_use-select + gather", perm_mask, xb16, perm, inuse)

    # Q2: in-kernel transpose micro-kernel: stream [C,16] blocks, write [16,C]
    def tkern(a_ref, o_ref):
        o_ref[0] = a_ref[0].T

    @jax.jit
    def inkernel_T(x3b):
        return pl.pallas_call(
            tkern,
            grid=(nc,),
            in_specs=[pl.BlockSpec((1, C, 16), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 16, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nc, 16, C), jnp.float32),
        )(x3b)

    def tkern2(a_ref, o_ref):
        o_ref[0] = jnp.swapaxes(a_ref[0], 0, 1)

    try:
        timeit("pallas stream+T [nc,C,16]->[nc,16,C]", inkernel_T, x_3b)
    except Exception as e:
        print("in-kernel transpose (2d block) failed:", str(e)[:300])

    @jax.jit
    def inkernel_T2(x3b):
        return pl.pallas_call(
            tkern2,
            grid=(nc,),
            in_specs=[pl.BlockSpec((1, C, 16), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 16, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nc, 16, C), jnp.float32),
        )(x3b)

    try:
        timeit("pallas stream+T keepdim variant", inkernel_T2, x_3b)
    except Exception as e:
        print("in-kernel transpose v2 failed:", str(e)[:300])


if __name__ == "__main__":
    main()
