#!/usr/bin/env python
"""Profile-trace the full rasterize fwd+bwd; print top device ops."""
import os, sys, math, glob, gzip, json, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))
import numpy as np, jax, jax.numpy as jnp
from contextgs_tpu.ops.rasterize import rasterize
from contextgs_tpu.scene.cameras import Camera

width, height, n_gauss = 1280, 720, 200_000
budget = int(os.environ.get("BUDGET", 1 << 20))
rng = np.random.default_rng(0)
means = np.stack([rng.uniform(-3, 3, n_gauss), rng.uniform(-2, 2, n_gauss),
                  rng.uniform(2, 12, n_gauss)], 1).astype(np.float32)
scales = rng.uniform(0.004, 0.02, (n_gauss, 3)).astype(np.float32)
quats = rng.normal(size=(n_gauss, 4)).astype(np.float32)
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
colors = rng.uniform(0, 1, (n_gauss, 3)).astype(np.float32)
opac = rng.uniform(0.2, 0.9, n_gauss).astype(np.float32)
cam = Camera(uid=0, colmap_id=0, R=np.eye(3), T=np.zeros(3), fov_x=1.2,
             fov_y=2 * math.atan(math.tan(0.6) * height / width),
             image=None, width=width, height=height)
kw = dict(world_view=jnp.asarray(cam.world_view),
          full_proj=jnp.asarray(cam.full_proj),
          tanfovx=cam.tanfovx, tanfovy=cam.tanfovy, width=width,
          height=height, bg=jnp.zeros(3), budget=budget, chunk_size=128,
          backend="pallas", interpret=False)
args = tuple(map(jnp.asarray, (means, scales, quats, colors, opac)))


def loss(*a):
    out = rasterize(*a, **kw)
    return jnp.sum(out.image) + jnp.sum(out.final_t)


vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))
jax.block_until_ready(vg(*args))
import time
t0 = time.perf_counter()
for _ in range(5):
    o = vg(*args)
jax.block_until_ready(o)
wall = (time.perf_counter() - t0) / 5 * 1000
N = 3
with jax.profiler.trace("/tmp/jtrace2"):
    for _ in range(N):
        o = vg(*args)
    jax.block_until_ready(o)

txt = vg.lower(*args).compile().as_text()
open("/tmp/vg_hlo2.txt", "w").write(txt)
import re
defs = {}
for line in txt.splitlines():
    ls = line.strip().lstrip("%")
    m = re.match(r"([\w.\-]+) = ", ls)
    if m:
        mm = re.search(r'op_name="jit\(loss\)/([^"]*)"', ls)
        src = re.search(r"source_line=(\d+)", ls)
        defs[m.group(1)] = (mm.group(1)[:60] if mm else "?",
                            src.group(1) if src else "?")

tr = json.load(gzip.open(sorted(glob.glob(
    "/tmp/jtrace2/plugins/profile/*/*.trace.json.gz"))[-1]))
agg, cnt = collections.Counter(), collections.Counter()
for e in tr["traceEvents"]:
    if e.get("ph") == "X" and "dur" in e and e.get("name"):
        agg[e["name"]] += e["dur"]
        cnt[e["name"]] += 1
print(f"wall per iter: {wall:.2f} ms")
tot = 0.0
for name, d in agg.most_common(60):
    if name.startswith("$") or "jit_" in name or name in "012" or \
       "Pjit" in name or name.isdigit():
        continue
    ms = d / N / 1000
    if ms < 0.08:
        continue
    tot += ms
    op, srcline = defs.get(name, ("?", "?"))
    print(f"{ms:8.3f} ms x{cnt[name]//N:4d}  {name[:28]:28s} {op}:{srcline}")
print(f"{tot:8.3f} ms  SUM of listed device ops")
