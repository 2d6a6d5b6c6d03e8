"""Host-side training orchestration.

Behavioral spec: /root/reference/train.py:90-265 (training()): random camera
order, per-phase schedule, densification every `update_interval` steps within
(update_from, update_until) excluding [3000,4000), anchor-bound refresh at the
context transition (step 10000), level-scale search on first context step.

TPU specifics: three jitted step functions (one per phase); densification is a
jitted pool update; when the padded pool runs out of free slots the host
enlarges capacity (2×) and re-jits.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from contextgs_tpu.config import TrainConfig
from contextgs_tpu.models import densify, state as st
from contextgs_tpu.models.levels import find_divide_scale
from contextgs_tpu.models.state import Buffers, Params, SceneModel
from contextgs_tpu.scene.dataset_readers import SceneInfo
from contextgs_tpu.train.optim import AdamState, init_adam
from contextgs_tpu.train.step import make_eval_render, make_train_step
from contextgs_tpu.utils.checkpoint import save_pytree

log = logging.getLogger("contextgs_tpu")


@dataclass
class TrainerState:
    model: SceneModel
    adam: AdamState
    voxel_size: float
    spatial_lr_scale: float
    level_scales: Optional[list] = None
    iteration: int = 0
    rng: np.random.Generator = field(
        default_factory=lambda: np.random.default_rng(0))


_BITS_FNS: dict = {}


def _pow2ceil(n: int) -> int:
    return 1 << max(int(n) - 1, 1).bit_length()


def _estimate_bits(model: SceneModel, cfg: TrainConfig, ts: "TrainerState",
                   key) -> dict:
    """Model-estimated bitstream size in MB per stream (+ MLP fp32 bits)."""
    from contextgs_tpu.models.context import estimate_total_bits
    from contextgs_tpu.models.levels import build_level_maps
    from contextgs_tpu.models.mlps import count_mlp_params

    p, b = model.params, model.buffers
    cache_key = (b.alive.shape[0], ts.voxel_size,
                 tuple(ts.level_scales or ()), id(cfg))
    if cache_key not in _BITS_FNS:
        scales = tuple(ts.level_scales or ())
        vox = ts.voxel_size

        @jax.jit
        def fn(p, b, key):
            anchor_q = st.get_anchor(p, b)
            # kept-set membership, matching the encoder (see train/step.py)
            kept = st.get_mask_anchor(p, b.alive)
            maps = build_level_maps(anchor_q, kept, vox, scales,
                                    cfg.model.level_num)
            return estimate_total_bits(p, b, cfg.model, maps, anchor_q, key,
                                       disable_hyper=cfg.opt.disable_hyper)
        _BITS_FNS[cache_key] = fn
    bits = _BITS_FNS[cache_key](p, b, key)
    mb = {k: round(float(v) / 8 / 1024 / 1024, 4) for k, v in bits.items()}
    mlp_bits = (count_mlp_params(p.mlps)
                + sum(x.size for x in jax.tree.leaves(p.prior))) * 32
    mb["mlp"] = round(mlp_bits / 8 / 1024 / 1024, 4)
    mb["total"] = round(sum(mb.values()), 4)
    return mb


def phase_of(it: int, cfg: TrainConfig) -> str:
    if it <= cfg.opt.noise_from:
        return "plain"
    if it <= cfg.opt.context_from:
        return "noise"
    return "context"


def grow_capacity(model: SceneModel, adam: AdamState,
                  new_capacity: int) -> tuple[SceneModel, AdamState]:
    """Host-side pool enlargement (pads anchor-indexed leaves with zeros)."""
    n = model.buffers.alive.shape[0]
    extra = new_capacity - n
    if extra <= 0:
        return model, adam

    def pad_leaf(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == n:
            return np.concatenate(
                [x, np.zeros((extra,) + x.shape[1:], x.dtype)], axis=0)
        return x

    def pad_params(p: Params) -> Params:
        fields = {}
        for name in p._fields:
            v = getattr(p, name)
            if name in ("mlps", "prior"):
                fields[name] = v
            else:
                fields[name] = jnp.asarray(pad_leaf(v))
        return Params(**fields)

    params = pad_params(model.params)
    buffers = Buffers(*[jnp.asarray(pad_leaf(v)) for v in model.buffers])
    adam = AdamState(mu=pad_params(adam.mu), nu=pad_params(adam.nu),
                     count=adam.count)
    return SceneModel(params, buffers), adam


def train(cfg: TrainConfig, scene: SceneInfo, *, budget: int = 1 << 18,
          vis_cap: int = 0, adapt_every: int = 512,
          callback=None) -> TrainerState:
    """Run the full optimization; returns the final trainer state."""
    key = jax.random.PRNGKey(cfg.seed)
    key, k_init = jax.random.split(key)
    model, voxel_size = st.init_scene_model(k_init, scene.points, cfg.model)
    adam = init_adam(model.params)
    ts = TrainerState(model=model, adam=adam, voxel_size=voxel_size,
                      spatial_lr_scale=scene.radius,
                      rng=np.random.default_rng(cfg.seed))
    resume_meta = None
    if cfg.start_checkpoint:
        # resume (ref train.py:112-114 --start_checkpoint)
        import pickle
        from contextgs_tpu.utils.checkpoint import load_pytree
        with open(cfg.start_checkpoint, "rb") as f:
            raw = pickle.load(f)
        cap = raw["leaves"][0].shape[0]
        if cap != model.buffers.alive.shape[0]:
            model, adam = grow_capacity(model, adam, cap)
        ckpt = load_pytree(cfg.start_checkpoint,
                           dict(params=model.params, buffers=model.buffers,
                                adam=adam))
        with open(cfg.start_checkpoint.replace(".pkl", ".meta.pkl"), "rb") as f:
            meta = pickle.load(f)
        ts.model = SceneModel(ckpt["params"], ckpt["buffers"])
        ts.adam = ckpt["adam"]
        ts.voxel_size = meta["voxel_size"]
        ts.level_scales = meta["level_scales"]
        ts.spatial_lr_scale = meta["spatial_lr_scale"]
        ts.iteration = meta["iteration"]
        model = ts.model
        resume_meta = meta
        if meta.get("rng_state") is not None:
            # restore the camera-permutation RNG so a resumed run draws the
            # same camera sequence as the continuous one (ADVICE r3)
            ts.rng.bit_generator.state = meta["rng_state"]
        log.info("resumed from %s at iteration %d", cfg.start_checkpoint,
                 ts.iteration)
    log.info("init: %d anchors (capacity %d), voxel_size=%.6f",
             st.n_alive(model), model.buffers.alive.shape[0], ts.voxel_size)

    cams = scene.train_cameras
    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.model.white_background
                     else [0.0, 0.0, 0.0], jnp.float32)
    cam_devs = [c.as_device_dict() for c in cams]
    gts = [jnp.asarray(np.transpose(c.image, (2, 0, 1))) for c in cams]

    step_fns: dict = {}
    eval_fns: dict = {}
    budget_now = budget   # instance budget; doubles on rasterizer overflow
    order: list = []
    if resume_meta is not None:
        # a previously doubled budget / step key / pending camera order are
        # part of the training state: restarting the budget from the CLI
        # default re-pays overflow re-jits and diverges from the continuous
        # run (ADVICE r3)
        budget_now = int(resume_meta.get("budget", budget))
        if resume_meta.get("key") is not None:
            key = jnp.asarray(resume_meta["key"])
        if resume_meta.get("cam_order") is not None:
            order = list(resume_meta["cam_order"])

    vis_cap_now = int(vis_cap) or None   # 0 = off; doubles on vis overflow
    vis_cap_enabled = bool(vis_cap)
    wm_inst = 0         # instance-count watermark since the last adapt point
    wm_vis = 0          # visible-gaussian watermark since the last adapt point
    if resume_meta is not None and "vis_cap" in resume_meta:
        # the continuous run may have doubled (overflow) or watermark-shrunk
        # its cap; restarting from the CLI value makes a resumed run truncate
        # different splats until it re-overflows, breaking branch
        # bit-exactness (ADVICE r4). Watermarks restore the in-flight adapt
        # window too.
        vis_cap_now = resume_meta["vis_cap"]
        wm_inst, wm_vis = resume_meta.get("watermarks", (0, 0))
    ts_start_it = ts.iteration

    def get_step(phase: str, width: int, height: int):
        # jitted per (phase, pool capacity, budget, resolution): mixed-
        # resolution scenes (ref scene/__init__.py:80-84 keeps camera lists
        # per resolution scale) each compile once and then share the cache
        lk = (phase, model.buffers.alive.shape[0], budget_now, width, height,
              vis_cap_now)
        if lk not in step_fns:
            step_fns[lk] = make_train_step(
                cfg, width, height, budget_now, phase,
                tuple(ts.level_scales or ()), ts.spatial_lr_scale,
                ts.voxel_size, vis_cap=vis_cap_now)
        return step_fns[lk]

    densify_jit: dict = {}

    def get_densify():
        lk = model.buffers.alive.shape[0]
        if lk not in densify_jit:
            densify_jit[lk] = jax.jit(lambda p, b, a, k: densify.adjust_anchors(
                p, b, a, cfg.model, cfg.opt, ts.voxel_size, k))
        return densify_jit[lk]

    pending_overflow = None
    t_start = time.time()
    opt = cfg.opt
    for it in range(ts.iteration + 1, opt.iterations + 1):
        ts.iteration = it
        phase = phase_of(it, cfg)

        if it == opt.context_from + 1:
            # context transition: refresh bounds (ref renderer :60-61 at step
            # 10000) and search level scales once (ref :1559)
            model = SceneModel(model.params, st.update_anchor_bound(
                model.buffers, model.params.anchor, model.buffers.alive))
            if ts.level_scales is None:
                alive = np.asarray(model.buffers.alive)
                anchors = np.asarray(model.params.anchor)[alive]
                mask_anchor = np.asarray(
                    st.get_mask_anchor(model.params, model.buffers.alive))[alive]
                ts.level_scales = find_divide_scale(
                    anchors[mask_anchor], ts.voxel_size,
                    np.asarray(model.buffers.bound_min),
                    np.asarray(model.buffers.bound_max),
                    cfg.model.target_ratio, cfg.model.level_num)
                log.info("level scales: %s", ts.level_scales)
            step_fns.clear()

        if not order:
            order = list(ts.rng.permutation(len(cams)))
        ci = order.pop()

        with_stats = jnp.asarray(opt.start_stat < it < opt.update_until)
        key, k_step = jax.random.split(key)
        step = get_step(phase, cams[ci].width, cams[ci].height)
        ran_budget, ran_cap = budget_now, vis_cap_now
        params, buffers, adam, metrics = step(
            model.params, model.buffers, ts.adam, cam_devs[ci], gts[ci], bg,
            jnp.asarray(it, jnp.float32), with_stats, k_step)
        model = SceneModel(params, buffers)
        ts.model, ts.adam = model, adam

        # rasterizer instance-budget overflow: a too-small budget silently
        # drops the deepest instances and corrupts training, so react like the
        # anchor pool does — double and re-jit. Checked one step DELAYED so the
        # read doesn't force a host↔device sync on the critical dispatch path.
        # Each pending flag is tagged with the limit its step ran under: the
        # delayed read means iteration N already ran with the OLD limit when
        # the reaction lands, and reacting to that stale overflow would double
        # a second time for the same underlying excess.
        if pending_overflow is not None:
            p_it, p_ovf, p_vovf, p_ninst, p_nvis, p_budget, p_cap = \
                pending_overflow
            # one consolidated fetch: each device_get pays a full dispatch
            # roundtrip (tunnel backends: ~25 ms fixed)
            p_ovf, p_vovf, p_ninst, p_nvis = (
                np.asarray(x) for x in jax.device_get(
                    (p_ovf, p_vovf, p_ninst, p_nvis)))
            wm_inst = max(wm_inst, int(p_ninst))
            wm_vis = max(wm_vis, int(p_nvis))
            if bool(p_ovf) and p_budget == budget_now:
                budget_now *= 2
                log.warning("raster budget overflow at iter %d → doubling "
                            "instance budget to %d (re-jit)", p_it, budget_now)
                step_fns.clear()
                eval_fns.clear()
            if (vis_cap_now is not None and bool(p_vovf)
                    and p_cap == vis_cap_now):
                vis_cap_now *= 2
                if (vis_cap_now
                        >= model.buffers.alive.shape[0] * cfg.model.n_offsets):
                    vis_cap_now = None   # cap ≥ pool: slicing buys nothing
                log.warning("vis-cap overflow at iter %d → raising train "
                            "vis_cap to %s (re-jit)", p_it, vis_cap_now)
                step_fns.clear()
        pending_overflow = (it, metrics.overflowed, metrics.vis_overflowed,
                            metrics.n_instances, metrics.n_vis,
                            ran_budget, ran_cap)

        # downward adaptation at a fixed cadence: transients (the giant-splat
        # first iterations, pre-densify states) can double the budget or cap
        # far past steady state, and instance-proportional glue (sorts,
        # gathers, ffills) then pays for the headroom every step. Shrink back
        # to the observed watermark + margin, with 2x hysteresis so a shrink
        # is always worth the re-jit.
        if it % adapt_every == 0 and it > ts_start_it + 1:
            # align-granular target (any multiple of the 128-lane chunk is a
            # valid static shape), not pow2: pow2ceil(548k·1.3) would pick a
            # 1M budget where 712k suffices, and every instance-proportional
            # glue op (sorts, gathers, ffills) pays for the rounding. The 2x
            # hysteresis below still bounds re-jit frequency.
            tgt = max(4096, -(-int(wm_inst * 1.3) // 256) * 256)
            if tgt <= budget_now // 2:
                log.info("iter %d: instance watermark %d → shrinking budget "
                         "%d → %d (re-jit)", it, wm_inst, budget_now, tgt)
                budget_now = tgt
                step_fns.clear()
                eval_fns.clear()
            if vis_cap_enabled and wm_vis > 0:
                tgtc = -(-int(wm_vis * 1.3) // 256) * 256   # align-granular
                pool_g = model.buffers.alive.shape[0] * cfg.model.n_offsets
                if tgtc < pool_g and (vis_cap_now is None
                                      or tgtc <= vis_cap_now // 2):
                    log.info("iter %d: visible watermark %d → shrinking "
                             "vis_cap %s → %d (re-jit)", it, wm_vis,
                             vis_cap_now, tgtc)
                    vis_cap_now = tgtc
                    step_fns.clear()
            wm_inst = wm_vis = 0

        do_densify = (opt.update_from < it < opt.update_until
                      and it % opt.update_interval == 0
                      and not (3000 <= it < 4000))
        if do_densify:
            key, k_d = jax.random.split(key)
            res = get_densify()(model.params, model.buffers, ts.adam, k_d)
            model = SceneModel(res.params, res.buffers)
            ts.model, ts.adam = model, res.adam
            if bool(res.overflowed):
                cap = model.buffers.alive.shape[0] * 2
                log.warning("anchor pool full at iter %d → growing to %d", it, cap)
                model, adam2 = grow_capacity(model, ts.adam, cap)
                ts.model, ts.adam = model, adam2
                step_fns.clear()
                densify_jit.clear()

        if callback is not None:
            callback(it, ts, metrics)
        if it in cfg.test_iterations and scene.test_cameras:
            # mid-training held-out evaluation (ref train.py:281-344
            # training_report renders the test split at test_iterations);
            # STE-quantized eval render, jitted per camera resolution
            # eval key derived OUTSIDE the training stream: enabling
            # --test_iterations must not perturb training randomness vs an
            # identical run without it (A/B reproducibility)
            k_e = jax.random.fold_in(jax.random.PRNGKey(0xE7A1), it)
            psnrs = []
            from contextgs_tpu.ops.ssim import psnr as psnr_fn
            for c in scene.test_cameras:
                ek = (phase, tuple(ts.level_scales or ()), budget_now,
                      c.width, c.height)
                if ek not in eval_fns:
                    eval_fns[ek] = make_eval_render(
                        cfg, c.width, c.height, budget_now, phase,
                        tuple(ts.level_scales or ()), ts.voxel_size)
                img = eval_fns[ek](model.params, model.buffers,
                                   c.as_device_dict(), bg, k_e)
                gt = jnp.asarray(np.transpose(c.image, (2, 0, 1)))
                psnrs.append(float(psnr_fn(img, gt)))
            if psnrs:
                log.info("iter %d test [%s]: PSNR %.3f over %d views",
                         it, phase, float(np.mean(psnrs)), len(psnrs))
        if it % cfg.log_every == 0:
            log.info("iter %d [%s]: loss=%.5f psnr=%.2f bpp=%.4f anchors=%d",
                     it, phase, float(metrics.loss), float(metrics.psnr),
                     float(metrics.bit_per_param), st.n_alive(model))
        if phase == "context" and it % 2000 == 0:
            # model-estimated bitstream size (ref train.py:178-197 logs the
            # per-stream estimate every 2000 iters)
            est = _estimate_bits(model, cfg, ts,
                                 jax.random.fold_in(jax.random.PRNGKey(0xB175),
                                                    it))
            log.info("iter %d size estimate: %s", it, est)

        if it in cfg.checkpoint_iterations or it in cfg.save_iterations:
            if cfg.model_path:
                import pickle
                os.makedirs(cfg.model_path, exist_ok=True)
                save_pytree(os.path.join(cfg.model_path, f"chkpnt{it}.pkl"),
                            dict(params=ts.model.params,
                                 buffers=ts.model.buffers, adam=ts.adam))
                with open(os.path.join(cfg.model_path,
                                       f"chkpnt{it}.meta.pkl"), "wb") as f:
                    pickle.dump(dict(iteration=it, voxel_size=ts.voxel_size,
                                     level_scales=ts.level_scales,
                                     spatial_lr_scale=ts.spatial_lr_scale,
                                     budget=budget_now,
                                     vis_cap=vis_cap_now,
                                     watermarks=(wm_inst, wm_vis),
                                     key=np.asarray(key),
                                     rng_state=ts.rng.bit_generator.state,
                                     cam_order=list(order)), f)
            if cfg.model_path and it in cfg.save_iterations:
                # model-snapshot channel (ref scene/__init__.py:98-101
                # scene.save → point_cloud/iteration_N/{point_cloud.ply,
                # checkpoint.pth}), distinct from the training checkpoint
                from contextgs_tpu.scene.snapshot import (save_model_ply,
                                                          save_networks)
                pc_dir = os.path.join(cfg.model_path, "point_cloud",
                                      f"iteration_{it}")
                os.makedirs(pc_dir, exist_ok=True)
                save_model_ply(os.path.join(pc_dir, "point_cloud.ply"),
                               ts.model.params, ts.model.buffers)
                save_networks(
                    os.path.join(pc_dir, "checkpoint.pth"), ts.model.params,
                    extra=dict(
                        bound_min=np.asarray(ts.model.buffers.bound_min),
                        bound_max=np.asarray(ts.model.buffers.bound_max),
                        level_scales=ts.level_scales,
                        voxel_size=ts.voxel_size, iteration=it))

    if pending_overflow is not None and bool(pending_overflow[1]):
        log.warning("raster budget overflow on the final iteration %d — "
                    "rerun with --budget ≥ %d", pending_overflow[0],
                    budget_now * 2)
    log.info("training done in %.1fs", time.time() - t_start)
    return ts
