"""Matched-state densify growth parity: single-chip vs N-device mesh.

VERDICT r4 weak #5 attributes the full-pipeline mesh parity gap to the mesh
growing ~12% fewer anchors, but the r4 trajectories diverge from step 1 (the
banded SSIM seam approximation), so cumulative anchor counts confound growth
mechanics with trajectory drift. This experiment removes the confound: ONE
adjust_anchors call on the IDENTICAL state and densify statistics, single
vs sharded (+ the host reshard dedup the sharded path always runs), repeated
over several RNG keys — any systematic growth deficit shows up here.

Usage: python scripts/growth_parity.py [--devices 8] [--points 20000] [--keys 5]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--points", type=int, default=20000)
    ap.add_argument("--keys", type=int, default=5)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices)
    import jax.numpy as jnp
    from contextgs_tpu.config import (ModelConfig, OptimizationConfig,
                                      TrainConfig, PipelineConfig)
    from contextgs_tpu.models import densify as dn, state as st
    from contextgs_tpu.parallel.sharded import (make_mesh, make_sharded_densify,
                                                reshard_anchors, shard_model)
    from contextgs_tpu.train.optim import init_adam

    mcfg = ModelConfig(feat_dim=8, n_offsets=4, voxel_size=0.01,
                       capacity_headroom=4.0)
    ocfg = OptimizationConfig(update_interval=100, success_threshold=0.8,
                              densify_grad_threshold=0.0002)
    cfg = TrainConfig(model=mcfg, opt=ocfg, pipe=PipelineConfig(),
                      source_path="", model_path="")

    rng = np.random.default_rng(11)
    pts = rng.uniform(-1, 1, (args.points, 3)).astype(np.float32)
    model, voxel = st.init_scene_model(jax.random.PRNGKey(0), pts, mcfg)
    p, b = model.params, model.buffers
    n, k = b.offset_grad_accum.shape
    # seeded stats: a random ~20% of offsets exceed the growth threshold with
    # heavy-tailed gradient magnitudes (mimicking a mid-training state)
    g = (rng.random((n, k)) < 0.2) * rng.lognormal(-7.5, 1.0, (n, k))
    p = p._replace(offsets=jnp.asarray(
        rng.normal(0, 2.0, (n, k, 3)).astype(np.float32)))
    alive = np.asarray(b.alive)
    b = b._replace(
        offset_grad_accum=jnp.asarray(
            np.where(alive[:, None], g * 100.0, 0.0).astype(np.float32)),
        offset_denom=jnp.asarray(
            np.where(alive[:, None], np.full((n, k), 100.0), 0.0)
            .astype(np.float32)),
        opacity_accum=jnp.asarray(np.where(alive, 100.0, 0.0)
                                  .astype(np.float32)),
        anchor_denom=jnp.asarray(np.where(alive, 100.0, 0.0)
                                 .astype(np.float32)))
    adam = init_adam(p)
    n0 = int(alive.sum())
    mesh = make_mesh(args.devices)
    dens = make_sharded_densify(cfg, mesh, voxel)

    print(f"{'key':>4} {'single':>8} {'mesh_raw':>9} {'mesh_dedup':>10} "
          f"{'delta%':>7}")
    deltas = []
    for ki in range(args.keys):
        key = jax.random.PRNGKey(1000 + ki)
        r1 = jax.jit(lambda p_, b_, a_, k_: dn.adjust_anchors(
            p_, b_, a_, mcfg, ocfg, voxel, k_))(p, b, adam, key)
        single = int(np.asarray(r1.buffers.alive).sum()) - n0

        hp, hb, ha, _ = reshard_anchors(
            jax.device_get(p), jax.device_get(b), jax.device_get(adam),
            args.devices, voxel)
        sp, sb, sa, _ = shard_model(mesh, hp, hb, ha)
        sp, sb, sa, grown, pruned, ovf = dens(sp, sb, sa, key)
        assert not bool(ovf), "sharded pool overflow — raise capacity_headroom"
        mesh_raw = int(np.asarray(sb.alive).sum()) - n0
        _, hb2, _, info = reshard_anchors(
            jax.device_get(sp), jax.device_get(sb), jax.device_get(sa),
            args.devices, voxel)
        mesh_net = int(np.asarray(hb2.alive).sum()) - n0
        d = 100.0 * (mesh_net - single) / max(single, 1)
        deltas.append(d)
        print(f"{ki:>4} {single:>8} {mesh_raw:>9} {mesh_net:>10} {d:>6.1f}%")
    print(f"mean delta {np.mean(deltas):+.1f}%  (n0={n0}, "
          f"{args.devices} devices)")


if __name__ == "__main__":
    main()
