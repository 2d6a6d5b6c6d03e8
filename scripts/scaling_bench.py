#!/usr/bin/env python
"""Sharded train-step scaling harness (BASELINE.json: "rays/s scaling 1→N").

Runs the FULL multi-chip training step (anchor-sharded params, context+rate
stage, ICI all-gather of splat state, banded Pallas/reference rasterization,
psum'd gradients, Adam update) on an n-device mesh and reports pixels/s
(rays/s: one camera ray per pixel) per step, chained-iteration and
fetch-synced like bench.py.

On this machine real multi-chip hardware does not exist, so:
- ``--cpu N1,N2,...`` VALIDATES the sharded step end-to-end on a virtual
  N-device CPU mesh (reference blend backend) and prints raw rates; virtual
  devices share the host's cores, so speedup/efficiency ratios are NOT
  meaningful there — real scaling must be measured on a real pod slice;
- run without flags on a TPU host it measures the absolute sharded-step
  throughput with the Pallas backend across all real chips.

Usage:
    python scripts/scaling_bench.py --cpu 1,2,4,8 [--size 64] [--points 1200]
    python scripts/scaling_bench.py            # real-device mesh (all chips)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import numpy as np


def measure(n_devices: int, size: int, n_pts: int, iters: int,
            budget: int) -> float:
    """Returns pixels/s for the full sharded context-phase train step."""
    import jax
    import jax.numpy as jnp
    from contextgs_tpu.config import (ModelConfig, OptimizationConfig,
                                      PipelineConfig, TrainConfig)
    from contextgs_tpu.models import state as st
    from contextgs_tpu.parallel.sharded import (make_mesh,
                                                make_sharded_train_step,
                                                shard_model)
    from contextgs_tpu.scene.cameras import Camera
    from contextgs_tpu.train.optim import init_adam

    mcfg = ModelConfig(feat_dim=8, n_offsets=4, voxel_size=0.05, level_num=3)
    cfg = TrainConfig(model=mcfg,
                      opt=OptimizationConfig(rate_sample_frac=1.0),
                      pipe=PipelineConfig(chunk_size=128))
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (n_pts, 3))
    model, voxel = st.init_scene_model(jax.random.PRNGKey(0), pts, mcfg)
    n_cap = model.buffers.alive.shape[0]
    assert n_cap % n_devices == 0, (n_cap, n_devices)

    mesh = make_mesh(n_devices)
    adam = init_adam(model.params)
    params, buffers, adam, _ = shard_model(mesh, model.params, model.buffers,
                                           adam)

    width = height = size
    c = Camera(uid=0, colmap_id=0, R=np.eye(3), T=np.array([0, 0, 2.5]),
               fov_x=1.0, fov_y=1.0, image=None, width=width, height=height)
    cam = {k: jnp.asarray(v) for k, v in c.as_device_dict().items()}
    gt = jnp.zeros((3, height, width), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    backend = "pallas" if jax.default_backend() == "tpu" else "reference"

    step = make_sharded_train_step(cfg, mesh, width, height, budget=budget,
                                   phase="context", level_scales=(4.0, 16.0),
                                   spatial_lr_scale=1.0, voxel_size=voxel,
                                   backend=backend)

    def chain(params, adam):
        bufs = buffers
        for _ in range(iters):   # unrolled: params/adam feed back (data dep)
            params, bufs, adam, _ = step(
                params, bufs, adam, cam, gt, bg, jnp.float32(11000.0),
                jnp.asarray(True), jax.random.PRNGKey(0))
        return params

    chained = jax.jit(chain)
    out = chained(params, adam)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]  # fetch-sync
    t0 = time.perf_counter()
    out = chained(params, adam)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = time.perf_counter() - t0
    return iters * width * height / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", default=None,
                   help="comma list of virtual CPU device counts")
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--points", type=int, default=1200)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--budget", type=int, default=8192)
    args = p.parse_args()

    if args.cpu:
        counts = [int(x) for x in args.cpu.split(",")]
        # virtual CPU mesh must be pinned before the first backend touch
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(counts))
        for n in counts:
            pix_s = measure(n, args.size, args.points, args.iters,
                            args.budget)
            print(f"devices={n}: {pix_s / 1e3:8.1f} kpix/s (virtual CPU "
                  "mesh: execution validated; ratios not meaningful)",
                  flush=True)
    else:
        import jax
        n = len(jax.devices())
        pix_s = measure(n, args.size, args.points, args.iters, args.budget)
        print(f"devices={n} ({jax.default_backend()}): "
              f"{pix_s / 1e6:.3f} Mpix/s full-train-step", flush=True)


if __name__ == "__main__":
    main()
