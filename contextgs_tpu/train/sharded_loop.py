"""Multi-chip training orchestration: the drivable `train.py --mesh N` loop.

The reference is strictly single-GPU (SURVEY.md §2.13); this composes the
sharded primitives of `parallel/sharded.py` into a full training RUN with the
same schedule semantics as the single-chip loop (train/loop.py, behavioral
spec /root/reference/train.py:90-265):

- phase transitions (plain → noise → context) with the anchor-bound refresh
  and host-side level-scale search at the context transition;
- sharded densification at the reference cadence, followed by the host-side
  tree-colocating reshard (global voxel dedup + whole-tree shard assignment);
- reaction paths mirroring the single-chip loop: rasterizer instance-budget
  overflow doubles the budget and re-jits; per-shard anchor-pool exhaustion
  grows capacity 2x through a reshard;
- checkpoint save/resume in the SAME host-side pytree format as the
  single-chip loop (chkpnt{it}.pkl + .meta.pkl), so `test.py`, `decompress.py`
  and `encode_scene` consume a sharded run's outputs unchanged;
- returns a TrainerState whose model is gathered to host at the end — the
  final encode runs from the gathered model exactly like a single-chip run.

On this machine the mesh is virtual (CPU devices, reference blend backend);
on a real slice the same code runs the Pallas path — the step factory picks
the backend from `jax.default_backend()`.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from contextgs_tpu.config import TrainConfig
from contextgs_tpu.models import state as st
from contextgs_tpu.models.levels import find_divide_scale
from contextgs_tpu.models.state import SceneModel
from contextgs_tpu.parallel.sharded import (make_mesh, make_sharded_densify,
                                            make_sharded_train_step,
                                            reshard_anchors, shard_model)
from contextgs_tpu.scene.dataset_readers import SceneInfo
from contextgs_tpu.train.loop import TrainerState, phase_of
from contextgs_tpu.train.optim import init_adam
from contextgs_tpu.utils.checkpoint import save_pytree

log = logging.getLogger("contextgs_tpu")


def train_sharded(cfg: TrainConfig, scene: SceneInfo, n_devices: int, *,
                  budget: int = 1 << 18, callback=None) -> TrainerState:
    """Run the full optimization on an n-device mesh; returns the final
    trainer state with the model GATHERED to host."""
    assert len(jax.devices()) >= n_devices, \
        f"need {n_devices} devices, have {len(jax.devices())}"
    mesh = make_mesh(n_devices)
    backend = "pallas" if jax.default_backend() == "tpu" else "reference"

    key = jax.random.PRNGKey(cfg.seed)
    key, k_init = jax.random.split(key)
    model, voxel_size = st.init_scene_model(k_init, scene.points, cfg.model)
    adam = init_adam(model.params)
    ts = TrainerState(model=model, adam=adam, voxel_size=voxel_size,
                      spatial_lr_scale=scene.radius,
                      rng=np.random.default_rng(cfg.seed))

    hp, hb, ha = model.params, model.buffers, adam
    resume_meta = None
    if cfg.start_checkpoint:
        import pickle
        from contextgs_tpu.utils.checkpoint import load_pytree
        with open(cfg.start_checkpoint, "rb") as f:
            raw = pickle.load(f)
        cap = raw["leaves"][0].shape[0]
        if cap != model.buffers.alive.shape[0]:
            from contextgs_tpu.train.loop import grow_capacity
            model, adam = grow_capacity(model, adam, cap)
        ckpt = load_pytree(cfg.start_checkpoint,
                           dict(params=model.params, buffers=model.buffers,
                                adam=adam))
        with open(cfg.start_checkpoint.replace(".pkl", ".meta.pkl"),
                  "rb") as f:
            meta = pickle.load(f)
        hp, hb, ha = ckpt["params"], ckpt["buffers"], ckpt["adam"]
        ts.voxel_size = meta["voxel_size"]
        ts.level_scales = meta["level_scales"]
        ts.spatial_lr_scale = meta["spatial_lr_scale"]
        ts.iteration = meta["iteration"]
        resume_meta = meta
        if meta.get("rng_state") is not None:
            # camera-permutation RNG continuity on resume (ADVICE r3)
            ts.rng.bit_generator.state = meta["rng_state"]
        log.info("resumed (sharded) from %s at iteration %d",
                 cfg.start_checkpoint, ts.iteration)

    # initial placement: spatial-hash shard assignment (no level scales yet),
    # which also balances free slots across shards (init packs alive anchors
    # into the low rows — raw row slabs would leave shard 0 no growth room)
    hp, hb, ha, info = reshard_anchors(
        jax.device_get(hp), jax.device_get(hb), jax.device_get(ha),
        n_devices, ts.voxel_size, level_scales=tuple(ts.level_scales or ()),
        level_num=cfg.model.level_num)
    sp, sb, sa, _ = shard_model(mesh, hp, hb, ha)
    log.info("sharded init: %d anchors over %d devices (capacity %d), "
             "voxel_size=%.6f", info["n_alive"], n_devices, info["capacity"],
             ts.voxel_size)

    cams = scene.train_cameras
    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.model.white_background
                     else [0.0, 0.0, 0.0], jnp.float32)
    cam_devs = [{k: jnp.asarray(v) for k, v in c.as_device_dict().items()}
                for c in cams]
    gts = [jnp.asarray(np.transpose(c.image, (2, 0, 1))) for c in cams]

    budget_now = budget
    order: list = []
    if resume_meta is not None:
        # restore doubled budget / step key / pending camera order so a
        # resumed run tracks the continuous one (ADVICE r3)
        budget_now = int(resume_meta.get("budget", budget))
        if resume_meta.get("key") is not None:
            key = jnp.asarray(resume_meta["key"])
        if resume_meta.get("cam_order") is not None:
            order = list(resume_meta["cam_order"])
    step_fns: dict = {}
    densify_fns: dict = {}

    def capacity():
        return sb.alive.shape[0]

    def get_step(phase: str, width: int, height: int):
        lk = (phase, capacity(), budget_now, width, height)
        if lk not in step_fns:
            step_fns[lk] = make_sharded_train_step(
                cfg, mesh, width, height, budget_now, phase,
                tuple(ts.level_scales or ()), ts.spatial_lr_scale,
                ts.voxel_size, backend=backend)
        return step_fns[lk]

    def get_densify():
        lk = capacity()
        if lk not in densify_fns:
            densify_fns[lk] = make_sharded_densify(cfg, mesh, ts.voxel_size)
        return densify_fns[lk]

    def reshard_and_place(min_capacity: int = 0):
        nonlocal sp, sb, sa
        hp_, hb_, ha_, info_ = reshard_anchors(
            jax.device_get(sp), jax.device_get(sb), jax.device_get(sa),
            n_devices, ts.voxel_size,
            level_scales=tuple(ts.level_scales or ()),
            level_num=cfg.model.level_num, min_capacity=min_capacity)
        old_cap = capacity()
        sp, sb, sa, _ = shard_model(mesh, hp_, hb_, ha_)
        if capacity() != old_cap:
            step_fns.clear()
            densify_fns.clear()
        return info_

    pending_overflow = None
    t_start = time.time()
    opt = cfg.opt
    for it in range(ts.iteration + 1, opt.iterations + 1):
        ts.iteration = it
        phase = phase_of(it, cfg)

        if it == opt.context_from + 1:
            # context transition: bound refresh + one-time level-scale search
            # (host side, on the gathered alive anchors), then reshard by
            # context-tree root so every parent gather is shard-local
            hp_ = jax.device_get(sp)
            hb_ = jax.device_get(jax.jit(st.update_anchor_bound)(
                sb, sp.anchor, sb.alive))
            if ts.level_scales is None:
                alive = np.asarray(hb_.alive)
                anchors = np.asarray(hp_.anchor)[alive]
                mask_anchor = np.asarray(
                    st.get_mask_anchor(hp_, jnp.asarray(hb_.alive)))[alive]
                ts.level_scales = find_divide_scale(
                    anchors[mask_anchor], ts.voxel_size,
                    np.asarray(hb_.bound_min), np.asarray(hb_.bound_max),
                    cfg.model.target_ratio, cfg.model.level_num)
                log.info("level scales: %s", ts.level_scales)
            sp, sb, sa = hp_, hb_, jax.device_get(sa)
            step_fns.clear()
            densify_fns.clear()
            reshard_and_place()   # re-key shards by tree root + re-place

        if not order:
            order = list(ts.rng.permutation(len(cams)))
        ci = order.pop()

        with_stats = jnp.asarray(opt.start_stat < it < opt.update_until)
        key, k_step = jax.random.split(key)
        step = get_step(phase, cams[ci].width, cams[ci].height)
        ran_budget = budget_now
        sp, sb, sa, metrics = step(sp, sb, sa, cam_devs[ci], gts[ci], bg,
                                   jnp.asarray(it, jnp.float32), with_stats,
                                   k_step)

        # instance-budget overflow: same delayed reaction as the single-chip
        # loop (train/loop.py) — double the budget and re-jit; the pending
        # flag is tagged with the budget its step ran under so a stale
        # overflow (measured before the double landed) can't double twice
        if (pending_overflow is not None and bool(pending_overflow[1])
                and pending_overflow[2] == budget_now):
            budget_now *= 2
            log.warning("raster budget overflow at iter %d -> doubling "
                        "instance budget to %d (re-jit)",
                        pending_overflow[0], budget_now)
            step_fns.clear()
        pending_overflow = (it, metrics["overflowed"], ran_budget)

        do_densify = (opt.update_from < it < opt.update_until
                      and it % opt.update_interval == 0
                      and not (3000 <= it < 4000))
        if do_densify:
            key, k_d = jax.random.split(key)
            sp, sb, sa, n_grown, n_pruned, ovf = get_densify()(
                sp, sb, sa, k_d)
            min_cap = 0
            if bool(ovf):
                min_cap = capacity() * 2
                log.warning("sharded anchor pool full at iter %d -> growing "
                            "to %d", it, min_cap)
            # host-side reshard at densify cadence: global voxel dedup +
            # tree-colocating redistribution (+ capacity growth on overflow)
            reshard_and_place(min_capacity=min_cap)

        if callback is not None:
            callback(it, ts, metrics)
        if it % cfg.log_every == 0:
            n_alive = int(np.sum(np.asarray(jax.device_get(sb.alive))))
            log.info("iter %d [%s] (mesh %d): loss=%.5f psnr=%.2f bpp=%.4f "
                     "anchors=%d", it, phase, n_devices,
                     float(metrics["loss"]), float(metrics["psnr"]),
                     float(metrics["bpp"]), n_alive)

        if it in cfg.checkpoint_iterations or it in cfg.save_iterations:
            if cfg.model_path:
                import pickle
                os.makedirs(cfg.model_path, exist_ok=True)
                save_pytree(os.path.join(cfg.model_path, f"chkpnt{it}.pkl"),
                            dict(params=jax.device_get(sp),
                                 buffers=jax.device_get(sb),
                                 adam=jax.device_get(sa)))
                with open(os.path.join(cfg.model_path,
                                       f"chkpnt{it}.meta.pkl"), "wb") as f:
                    pickle.dump(dict(iteration=it, voxel_size=ts.voxel_size,
                                     level_scales=ts.level_scales,
                                     spatial_lr_scale=ts.spatial_lr_scale,
                                     n_devices=n_devices,
                                     budget=budget_now,
                                     key=np.asarray(key),
                                     rng_state=ts.rng.bit_generator.state,
                                     cam_order=list(order)), f)
            if cfg.model_path and it in cfg.save_iterations:
                # model-snapshot channel at save_iterations, matching the
                # single-chip cadence (ADVICE r3: --warmup and PLY consumers
                # expect point_cloud/iteration_N/ from either loop); gather
                # the sharded model to host first
                from contextgs_tpu.scene.snapshot import (save_model_ply,
                                                          save_networks)
                hp_, hb_ = jax.device_get(sp), jax.device_get(sb)
                pc_dir = os.path.join(cfg.model_path, "point_cloud",
                                      f"iteration_{it}")
                os.makedirs(pc_dir, exist_ok=True)
                save_model_ply(os.path.join(pc_dir, "point_cloud.ply"),
                               hp_, hb_)
                save_networks(
                    os.path.join(pc_dir, "checkpoint.pth"), hp_,
                    extra=dict(bound_min=np.asarray(hb_.bound_min),
                               bound_max=np.asarray(hb_.bound_max),
                               level_scales=ts.level_scales,
                               voxel_size=ts.voxel_size, iteration=it))

    if pending_overflow is not None and bool(pending_overflow[1]):
        log.warning("raster budget overflow on the final iteration %d — "
                    "rerun with --budget >= %d", pending_overflow[0],
                    budget_now * 2)
    # gather the final model to host: downstream encode/eval are single-chip
    ts.model = SceneModel(jax.device_get(sp), jax.device_get(sb))
    ts.adam = jax.device_get(sa)
    log.info("sharded training done in %.1fs", time.time() - t_start)
    return ts
