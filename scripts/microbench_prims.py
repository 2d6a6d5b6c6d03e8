#!/usr/bin/env python
"""Device-lane timing of candidate primitives at bench scale."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_cc"))
import sys
sys.path.insert(0, os.path.dirname(__file__))
import jax, jax.numpy as jnp, numpy as np
from tpu_timing import device_ms

B, BP, G = 1 << 20, 1509376, 200_000
rng = np.random.default_rng(0)
perm = jnp.asarray(rng.permutation(BP).astype(np.int32)[:B])      # distinct dests
idx_small = jnp.asarray(rng.integers(0, G, B, dtype=np.int32))    # B -> G rows
idx_big = jnp.asarray(rng.integers(0, B, BP, dtype=np.int32))     # BP -> B rows
rows_g = jnp.asarray(rng.normal(size=(G, 16)).astype(np.float32))
rows_b = jnp.asarray(rng.normal(size=(B, 16)).astype(np.float32))
vals_i = jnp.asarray(rng.integers(0, 2**20, B, dtype=np.int32))
f9 = jnp.asarray(rng.normal(size=(B, 9)).astype(np.float32))
dk = jnp.asarray(rng.normal(size=G).astype(np.float32))
gpay = jnp.asarray(rng.integers(0, 2**32, G, dtype=np.uint32))
iota = jnp.arange(G, dtype=jnp.int32)
u32k = jnp.asarray(rng.integers(0, 2**32, B, dtype=np.uint32))
i32p = jnp.arange(B, dtype=jnp.int32)
offs = jnp.asarray(np.sort(rng.integers(0, B, G)).astype(np.int32))
d200k = jnp.asarray(rng.integers(-1000, 1000, G, dtype=np.int32))

def t(name, fn, *a):
    print(f"{name:44s} {device_ms(fn, *a, iters=3):8.3f} ms")

t("scalar scatter-set 1M->1.5M i32",
  lambda p, v: jnp.full((BP,), B, jnp.int32).at[p].set(v, mode="drop"), perm, vals_i)
t("row scatter-set [1M,16]->[1.5M,16]",
  lambda p, r: jnp.zeros((BP, 16), jnp.float32).at[p].set(r, mode="drop"), perm, rows_b)
t("row gather [1M,16] from [200k,16]", lambda i, r: r[i], idx_small, rows_g)
t("row gather [1.5M,16] from [1M,16]", lambda i, r: r[i], idx_big, rows_b)
t("row gather [1.5M,9] from [1M,9]", lambda i, r: r[i], idx_big, f9)
t("transpose [1.5M,16]->[16,1.5M]",
  lambda r: r.T + 1.0, jnp.zeros((BP, 16), jnp.float32))
t("sort u32 key only 1M", lambda k: jax.lax.sort(k), u32k)
t("sort u32+i32 payload 1M",
  lambda k, p: jax.lax.sort((k, p), num_keys=1), u32k, i32p)
t("sort u32+2xi32 payload 1M",
  lambda k, p: jax.lax.sort((k, p, p), num_keys=1), u32k, i32p)
t("sort f32+u32+i32 200k stable",
  lambda d, g, i: jax.lax.sort((d, g, i), num_keys=1, is_stable=True), dk, gpay, iota)
t("argsort f32 200k stable", lambda d: jnp.argsort(d, stable=True), dk)
t("4x scalar gather 200k (depth reorder)",
  lambda o, a, b: (a[o], b[o], a[o] + 1, b[o] + 1), iota[::-1], d200k, d200k)
t("scatter-add 200k deltas -> 1M i32",
  lambda o, d: jnp.zeros((B,), jnp.int32).at[o].add(d, mode="drop"), offs, d200k)
t("cumsum 1M i32", lambda x: jnp.cumsum(x), vals_i)
t("cumsum [1M,9] f32 axis0", lambda x: jnp.cumsum(x, axis=0), f9)
t("9x 1D cumsum f32 (sliced)",
  lambda x: jnp.stack([jnp.cumsum(x[:, i]) for i in range(9)], 1), f9)

C = 128
tri = jnp.asarray(np.tril(np.ones((C, C), np.float32)))
def mm_cumsum(x):
    xb = x.reshape(B // C, C, 9)
    loc = jnp.einsum("ck,bkf->bcf", tri, xb)                 # intra-block prefix
    carry = jnp.cumsum(loc[:, -1, :], axis=0)                # [B/C, 9]
    carry = jnp.concatenate([jnp.zeros((1, 9), x.dtype), carry[:-1]])
    return (loc + carry[:, None, :]).reshape(B, 9)
t("matmul-blocked cumsum [1M,9] f32", mm_cumsum, f9)
