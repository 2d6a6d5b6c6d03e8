import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_cc"))
import math, sys
sys.path.insert(0, os.path.dirname(__file__))
import jax, jax.numpy as jnp, numpy as np
from contextgs_tpu.ops.rasterize.projection import project_gaussians
from contextgs_tpu.ops.rasterize.sorting import expand_and_sort
from contextgs_tpu.scene.cameras import Camera

WIDTH, HEIGHT, N_GAUSS = 1280, 720, 200_000
BUDGET, CHUNK, TILE = 1 << 20, 128, 16
tiles_x, tiles_y = WIDTH // TILE, HEIGHT // TILE
rng = np.random.default_rng(0)
means = np.stack([rng.uniform(-3, 3, N_GAUSS), rng.uniform(-2, 2, N_GAUSS),
                  rng.uniform(2.0, 12.0, N_GAUSS)], 1).astype(np.float32)
scales = rng.uniform(0.004, 0.02, (N_GAUSS, 3)).astype(np.float32)
quats = rng.normal(size=(N_GAUSS, 4)).astype(np.float32)
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
cam = Camera(uid=0, colmap_id=0, R=np.eye(3), T=np.zeros(3), fov_x=1.2,
             fov_y=2 * math.atan(math.tan(0.6) * HEIGHT / WIDTH),
             image=None, width=WIDTH, height=HEIGHT)
proj = jax.jit(lambda m, s, q: project_gaussians(
    m, s, q, jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj),
    cam.tanfovx, cam.tanfovy, WIDTH, HEIGHT, TILE))(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats))

def eas_used(p):
    i = expand_and_sort(p, tiles_x, tiles_y, BUDGET, align=CHUNK)
    return (i.src_slot, i.rank_slot, i.tile_bounds, i.perm, i.order,
            i.seg_bounds, i.total, i.overflowed)

inst = expand_and_sort(proj, tiles_x, tiles_y, BUDGET, align=CHUNK)
print("total instances:", int(inst.total), " aligned sum:", int(inst.tile_bounds[-1]),
      " budget:", BUDGET, " overflowed:", bool(inst.overflowed))

hlo = jax.jit(eas_used).lower(proj).compile().as_text()
import re
# print each fusion's root + a couple of ops inside
for m in re.finditer(r'^\s*%?(fusion[.\d]*) = .*', hlo, re.M):
    pass
open("/tmp/eas_hlo.txt","w").write(hlo)
print("HLO dumped, bytes:", len(hlo))
