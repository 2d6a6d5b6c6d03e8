#!/usr/bin/env python
"""ContextGS-TPU training driver.

Equivalent of /root/reference/train.py: train → estimate bits → encode →
decode → render test split from DECODED parameters → metrics → results.json.

Usage (mirrors the reference CLI):
    python train.py -s <scene_dir> -m outputs/scene --lmbda 0.001 [--preset mipnerf360]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")

import jax
import jax.numpy as jnp
import numpy as np

from contextgs_tpu.config import (ModelConfig, OptimizationConfig,
                                  PipelineConfig, TrainConfig, preset)
from contextgs_tpu.compression.codec import decode_scene, encode_scene
from contextgs_tpu import evaluation as ev
from contextgs_tpu.models import state as st
from contextgs_tpu.scene.dataset_readers import load_scene
from contextgs_tpu.train.loop import train


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-s", "--source_path", required=True)
    p.add_argument("-m", "--model_path", default="")
    p.add_argument("--images", default="images")
    p.add_argument("-r", "--resolution", type=int, default=-1)
    p.add_argument("--preset", default=None,
                   choices=["mipnerf360", "tandt", "deep_blending",
                            "nerf_synthetic", "bungeenerf"])
    p.add_argument("--white_background", action="store_true")
    p.add_argument("--eval", action="store_true", default=True)
    p.add_argument("--lod", type=int, default=0)
    p.add_argument("--voxel_size", type=float, default=None)
    p.add_argument("--update_init_factor", type=int, default=None)
    p.add_argument("--iterations", type=int, default=30_000)
    # schedule boundaries (defaults = reference values; override to scale
    # down for smoke runs)
    p.add_argument("--noise_from", type=int, default=3000)
    p.add_argument("--context_from", type=int, default=10_000)
    p.add_argument("--start_stat", type=int, default=500)
    p.add_argument("--update_from", type=int, default=1500)
    p.add_argument("--update_interval", type=int, default=100)
    p.add_argument("--update_until", type=int, default=15_000)
    p.add_argument("--lmbda", type=float, default=0.001)
    p.add_argument("--lmbda_rec", type=float, default=1.0)
    p.add_argument("--level_num", type=int, default=3)
    p.add_argument("--disable_hyper", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--start_checkpoint", default=None)
    p.add_argument("--train_vis_cap", type=int, default=0,
                   help="bound rendered gaussians per training view (0=off): "
                        "slices the splat gather table to the visible prefix "
                        "of the depth sort like the decoded path; doubles on "
                        "overflow")
    p.add_argument("--budget", type=int, default=1 << 20,
                   help="tile-instance budget for the rasterizer")
    p.add_argument("--n_offsets", type=int, default=None,
                   help="gaussians decoded per anchor (ref n_offsets=10)")
    p.add_argument("--anchor_capacity", type=int, default=0,
                   help="initial padded anchor-pool capacity (0 = "
                        "capacity_headroom x initial anchors); the pool "
                        "auto-doubles when densification fills it")
    p.add_argument("--backend", default="auto")
    p.add_argument("--skip_codec", action="store_true")
    p.add_argument("--skip_render", action="store_true")
    p.add_argument("--save_images", action="store_true")
    p.add_argument("--no_tensorboard", action="store_true",
                   help="disable TensorBoard event files under <model_path>/tb")
    # live SIBR remote-viewer server (ref train.py:592-593 --ip/--port; the
    # reference leaves network_gui.init commented out, here --gui enables it)
    p.add_argument("--ip", default="127.0.0.1")
    p.add_argument("--port", type=int, default=6009)
    p.add_argument("--gui", action="store_true",
                   help="serve live renders to a SIBR remote viewer")
    p.add_argument("--test_iterations", nargs="+", type=int, default=None,
                   help="iterations at which to evaluate the test split "
                        "mid-training (default: final iteration)")
    p.add_argument("--checkpoint_iterations", nargs="+", type=int,
                   default=None,
                   help="iterations at which to write a resumable training "
                        "checkpoint (ref train.py:257-259 --checkpoint_"
                        "iterations); chkpnt{it}.pkl under model_path")
    p.add_argument("--warmup", action="store_true",
                   help="after training, reboot a second run initialized from "
                        "the saved PLY snapshot (ref train.py:669-672)")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler device trace for N steps "
                        "(written to <model_path>/profile; view in "
                        "TensorBoard or Perfetto)")
    p.add_argument("--detect_anomaly", action="store_true",
                   help="trace NaNs in jitted computations (jax_debug_nans; "
                        "ref train.py:600,665 autograd anomaly mode)")
    p.add_argument("--mesh", type=int, default=0,
                   help="train on an N-device jax.sharding.Mesh (anchors "
                        "sharded, image tiles banded; parallel/sharded.py). "
                        "The final encode runs from the gathered model.")
    p.add_argument("--mesh_force_cpu", action="store_true",
                   help="force an N-device virtual CPU mesh for --mesh "
                        "(single-chip machines; must run before any other "
                        "jax use in the process)")
    p.add_argument("--force_cpu", action="store_true",
                   help="run on the CPU backend (sitecustomize pins the TPU "
                        "plugin, so JAX_PLATFORMS env vars are baked before "
                        "this process starts; the runtime config API is the "
                        "only way to switch)")
    return p


def config_from_args(args) -> TrainConfig:
    if args.preset:
        model = preset(args.preset, level_num=args.level_num,
                       lod=args.lod or preset(args.preset).lod)
    else:
        model = ModelConfig(level_num=args.level_num, lod=args.lod,
                            white_background=args.white_background)
    overrides = {}
    if args.voxel_size is not None:
        overrides["voxel_size"] = args.voxel_size
    if args.update_init_factor is not None:
        overrides["update_init_factor"] = args.update_init_factor
    if args.white_background:
        overrides["white_background"] = True
    if args.anchor_capacity:
        overrides["anchor_capacity"] = args.anchor_capacity
    if args.n_offsets is not None:
        overrides["n_offsets"] = args.n_offsets
    overrides["resolution"] = args.resolution
    model = dataclasses.replace(model, **overrides)
    opt = OptimizationConfig(iterations=args.iterations, lmbda=args.lmbda,
                             lmbda_rec=args.lmbda_rec,
                             disable_hyper=args.disable_hyper,
                             noise_from=args.noise_from,
                             context_from=args.context_from,
                             start_stat=args.start_stat,
                             update_from=args.update_from,
                             update_interval=args.update_interval,
                             update_until=args.update_until)
    pipe = PipelineConfig(backend=args.backend)
    return TrainConfig(model=model, opt=opt, pipe=pipe,
                       source_path=os.path.abspath(args.source_path),
                       model_path=args.model_path, images=args.images,
                       seed=args.seed, start_checkpoint=args.start_checkpoint,
                       save_iterations=(args.iterations,),
                       checkpoint_iterations=tuple(
                           args.checkpoint_iterations or ()),
                       test_iterations=tuple(args.test_iterations
                                             or (args.iterations,)))


def setup_logging(model_path: str):
    handlers = [logging.StreamHandler(sys.stdout)]
    if model_path:
        os.makedirs(model_path, exist_ok=True)
        handlers.append(logging.FileHandler(
            os.path.join(model_path, "outputs.log")))
    logging.basicConfig(level=logging.INFO, handlers=handlers,
                        format="%(asctime)s %(levelname)s %(message)s")


def main(argv=None):
    args = build_parser().parse_args(argv)
    if (args.mesh and args.mesh_force_cpu) or args.force_cpu:
        # must precede any backend initialization (same mechanism as
        # __graft_entry__.dryrun_multichip)
        try:
            jax.config.update("jax_platforms", "cpu")
            if args.mesh:
                jax.config.update("jax_num_cpu_devices", args.mesh)
        except RuntimeError:
            pass  # backend already up (e.g. a real slice)
    cfg = config_from_args(args)
    setup_logging(cfg.model_path)
    log = logging.getLogger("contextgs_tpu")
    if cfg.model_path:
        with open(os.path.join(cfg.model_path, "cfg_args"), "w") as f:
            f.write(cfg.to_json())

    log.info("loading scene %s", cfg.source_path)
    scene = load_scene(cfg.source_path, images=cfg.images,
                       eval_split=cfg.model.eval, lod=cfg.model.lod,
                       white_background=cfg.model.white_background,
                       resolution=cfg.model.resolution)
    log.info("scene: %d train / %d test cameras, %d points",
             len(scene.train_cameras), len(scene.test_cameras),
             len(scene.points))

    # TensorBoard scalars every log_every iters (ref train.py:281-293 logs
    # loss/psnr/points to tb_writer when tensorboard is importable; ours is
    # dependency-free, utils/tboard.py)
    tb = None
    if cfg.model_path and not args.no_tensorboard:
        from contextgs_tpu.utils.tboard import SummaryWriter
        tb = SummaryWriter(os.path.join(cfg.model_path, "tb"))

    # live viewer: one frame per poll whenever a SIBR client is connected
    # (ref train.py:127-140; protocol in contextgs_tpu/utils/viewer.py)
    viewer = None
    if args.gui:
        from contextgs_tpu.utils.viewer import ViewerServer
        viewer = ViewerServer(args.ip, args.port)
        log.info("viewer listening on %s:%d", viewer.host, viewer.port)
    bg_host = jnp.asarray([1.0, 1.0, 1.0] if cfg.model.white_background
                          else [0.0, 0.0, 0.0], jnp.float32)
    viewer_fns: dict = {}

    train_pixels = (scene.train_cameras[0].width
                    * scene.train_cameras[0].height
                    if scene.train_cameras else 0)

    def viewer_render(ts_, it):
        from contextgs_tpu.models.levels import build_level_maps
        from contextgs_tpu.models.renderer import render as model_render
        from contextgs_tpu.train.loop import phase_of

        # key the jitted viewer fn on the CURRENT training phase so the live
        # preview shows STE-quantized context renders once the context phase
        # starts (not the plain bypass), plus pool capacity / level scales
        phase = phase_of(it, cfg)
        scales = tuple(ts_.level_scales or ())
        if phase == "context" and not scales:
            phase = "noise"   # scales not searched yet this step
        voxel = ts_.voxel_size

        def render_rgb(mc, scaling_mod):
            key = (mc.width, mc.height, phase, scales,
                   ts_.model.buffers.alive.shape[0])
            if key not in viewer_fns:
                w, h = mc.width, mc.height
                # the instance budget was sized for the training resolution;
                # larger viewer frames need proportionally more slots
                bud = max(args.budget, int(args.budget * (w * h)
                                           / max(train_pixels or w * h, 1)))

                def fn(params, buffers, cam, bg, k, smod):
                    maps = None
                    if phase == "context":
                        anchor_q = st.get_anchor(params, buffers)
                        maps = build_level_maps(anchor_q, buffers.alive,
                                                voxel, scales,
                                                cfg.model.level_num)
                    out = model_render(params, buffers, cfg.model, cfg.opt,
                                       cfg.pipe, cam, w, h, bg, k,
                                       phase=phase, training=False, maps=maps,
                                       budget=bud, scale_modifier=smod)
                    return jnp.clip(out.image, 0.0, 1.0).transpose(1, 2, 0)
                viewer_fns[key] = jax.jit(fn)
            cam = {k: jnp.asarray(v) for k, v in mc.as_device_dict().items()}
            return viewer_fns[key](ts_.model.params, ts_.model.buffers, cam,
                                   bg_host, jax.random.PRNGKey(0),
                                   jnp.float32(scaling_mod))
        return render_rgb

    # device-trace capture over a window of warm steps (§5.1: the reference
    # only has manual cuda.synchronize wall-clocks; this is the TPU-native
    # profiler integration)
    prof_start = 20 if cfg.opt.iterations > 25 else 1
    prof = {"active": False, "done": False}
    if (args.profile_steps and cfg.model_path
            and prof_start + args.profile_steps > cfg.opt.iterations):
        log.warning("--profile_steps window [%d, %d) extends past the %d "
                    "iterations; the trace will be closed at training end",
                    prof_start, prof_start + args.profile_steps,
                    cfg.opt.iterations)

    def stop_profiler():
        if prof["active"]:
            jax.profiler.stop_trace()
            prof["active"] = False
            prof["done"] = True
            log.info("profiler trace written to %s",
                     os.path.join(cfg.model_path, "profile"))

    def write_progress(it, get_lpb):
        # heartbeat for external monitors and post-mortems: a killed run
        # leaves its last known state on disk (VERDICT r3 #7 — failure
        # evidence must survive the process). get_lpb is a thunk so the
        # float() device fetches only happen past the cadence gate — an
        # unconditional float(metrics.*) would block on the just-dispatched
        # step every iteration and defeat the loop's one-step-delayed
        # overflow read (ADVICE r4).
        if not cfg.model_path or it % 100:
            return
        loss, psnr, bpp = get_lpb()
        tmp = os.path.join(cfg.model_path, ".progress.json.tmp")
        with open(tmp, "w") as f:
            json.dump(dict(iteration=it, loss=loss, psnr=psnr, bpp=bpp,
                           total=cfg.opt.iterations, ts=time.time()), f)
        os.replace(tmp, os.path.join(cfg.model_path, "progress.json"))

    def tb_callback(it, ts_, metrics):
        write_progress(it, lambda: (float(metrics.loss), float(metrics.psnr),
                                    float(metrics.bit_per_param)))
        if args.profile_steps and cfg.model_path and not prof["done"]:
            if it == prof_start and not prof["active"]:
                jax.profiler.start_trace(
                    os.path.join(cfg.model_path, "profile"))
                prof["active"] = True
            elif prof["active"] and it >= prof_start + args.profile_steps:
                jax.block_until_ready(metrics.loss)
                stop_profiler()
        if viewer is not None:
            viewer.poll(viewer_render(ts_, it), cfg.source_path, it,
                        cfg.opt.iterations)
        if tb is not None and it % 100 == 0:
            tb.add_scalar("train_loss_patches/total_loss",
                          float(metrics.loss), it)
            tb.add_scalar("train/psnr", float(metrics.psnr), it)
            tb.add_scalar("train/bit_per_param",
                          float(metrics.bit_per_param), it)
            tb.add_scalar("total_points", st.n_alive(ts_.model), it)

    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    if args.mesh:
        from contextgs_tpu.train.sharded_loop import train_sharded

        def mesh_callback(it, ts_, metrics):
            write_progress(it, lambda: (float(metrics["loss"]),
                                        float(metrics["psnr"]),
                                        float(metrics["bpp"])))
            if tb is not None and it % 100 == 0:
                tb.add_scalar("train_loss_patches/total_loss",
                              float(metrics["loss"]), it)
                tb.add_scalar("train/psnr", float(metrics["psnr"]), it)
                tb.add_scalar("train/bit_per_param",
                              float(metrics["bpp"]), it)
        ts = train_sharded(cfg, scene, args.mesh, budget=args.budget,
                           callback=mesh_callback)
    else:
        ts = train(cfg, scene, budget=args.budget,
                   vis_cap=args.train_vis_cap, callback=tb_callback)
    stop_profiler()   # close a trace whose window extended past training
    if args.warmup:
        # reboot from the just-saved PLY snapshot: its anchors become the
        # init point cloud of a fresh run (ref train.py:669-672)
        log.info("warmup finished — rebooting from last PLY snapshot")
        from contextgs_tpu.scene.ply_io import read_ply
        ply_path = os.path.join(cfg.model_path, "point_cloud",
                                f"iteration_{cfg.opt.iterations}",
                                "point_cloud.ply")
        v = read_ply(ply_path)
        scene = dataclasses.replace(
            scene, points=np.stack([v["x"], v["y"], v["z"]], axis=1))
        ts = train(cfg, scene, budget=args.budget,
                   vis_cap=args.train_vis_cap, callback=tb_callback)
        stop_profiler()
    if viewer is not None:
        viewer.close()

    if args.skip_codec:
        return 0

    # encode → decode → evaluate from decoded parameters (ref train.py:298-314)
    out_dir = os.path.join(cfg.model_path or ".", "bitstreams")
    bits = encode_scene(ts.model.params, ts.model.buffers, cfg.model,
                        ts.level_scales or [], ts.voxel_size, out_dir,
                        disable_hyper=cfg.opt.disable_hyper)
    log.info("encoded: %.3f MB total (feat %.3f, scaling %.3f, offsets %.3f, "
             "hyper %.3f, anchor %.3f, masks %.3f, mlp %.3f) in %.1fs",
             bits["total"] / 8 / 1024 / 1024, bits["feat"] / 8 / 1024 / 1024,
             bits["scaling"] / 8 / 1024 / 1024,
             bits["offsets"] / 8 / 1024 / 1024, bits["hyper"] / 8 / 1024 / 1024,
             bits["anchor"] / 8 / 1024 / 1024, bits["masks"] / 8 / 1024 / 1024,
             bits["mlp"] / 8 / 1024 / 1024, bits["time_s"])

    dec = decode_scene(out_dir, cfg.model)
    if args.skip_render or not scene.test_cameras:
        return 0
    cam0 = scene.test_cameras[0]
    renderer = ev.make_decoded_renderer(dec, cfg, cam0.width, cam0.height,
                                        budget=args.budget)
    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.model.white_background
                     else [0.0, 0.0, 0.0])
    renders, gts, fps = ev.render_set(
        renderer, scene.test_cameras, bg,
        out_dir=os.path.join(cfg.model_path or ".", "test"),
        save_images=args.save_images)
    metrics = ev.evaluate_images(renders, gts)
    log.info("test: PSNR %.3f SSIM %.4f FPS %.1f", metrics["PSNR"],
             metrics["SSIM"], fps)
    if tb is not None:
        tb.add_scalar("test/PSNR", metrics["PSNR"], cfg.opt.iterations)
        tb.add_scalar("test/SSIM", metrics["SSIM"], cfg.opt.iterations)
        # first decoded test render + GT, [3,H,W] → [H,W,3]
        tb.add_image("test/render", np.transpose(renders[0], (1, 2, 0)),
                     cfg.opt.iterations)
        tb.add_image("test/ground_truth", np.transpose(gts[0], (1, 2, 0)),
                     cfg.opt.iterations)
        tb.close()
    ev.write_results(cfg.model_path or ".", "ours", metrics, bits, fps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
