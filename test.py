#!/usr/bin/env python
"""Evaluation driver: load a training checkpoint, re-run encode → decode →
render → metrics.

Equivalent of /root/reference/test.py:147-200: unlike decompress.py this
starts from the trained checkpoint (chkpnt*.pkl) rather than the bitstream.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import jax
import jax.numpy as jnp
import numpy as np

from contextgs_tpu.config import TrainConfig
from contextgs_tpu.compression.codec import decode_scene, encode_scene
from contextgs_tpu import evaluation as ev
from contextgs_tpu.models import state as st
from contextgs_tpu.scene.dataset_readers import load_scene
from contextgs_tpu.utils.checkpoint import load_pytree
from contextgs_tpu.train.optim import init_adam


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-s", "--source_path", required=True)
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--budget", type=int, default=1 << 20)
    p.add_argument("--save_images", action="store_true")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("contextgs_tpu")

    with open(os.path.join(args.model_path, "cfg_args")) as f:
        cfg = TrainConfig.from_json(f.read())

    ckpt_path = args.checkpoint
    if ckpt_path is None:
        cands = sorted((q for q in glob.glob(os.path.join(args.model_path,
                                                          "chkpnt*.pkl"))
                        if not q.endswith(".meta.pkl")),
                       key=lambda p: int("".join(filter(str.isdigit,
                                                        os.path.basename(p)))))
        if not cands:
            log.error("no checkpoint in %s", args.model_path)
            return 1
        ckpt_path = cands[-1]
    log.info("loading %s", ckpt_path)

    scene = load_scene(args.source_path, images=cfg.images,
                       eval_split=cfg.model.eval, lod=cfg.model.lod,
                       white_background=cfg.model.white_background,
                       resolution=cfg.model.resolution)
    # build a like-structured model to load into (capacity from the checkpoint)
    import pickle
    with open(ckpt_path, "rb") as f:
        raw = pickle.load(f)
    model0, _ = st.init_scene_model(jax.random.PRNGKey(0),
                                    scene.points[:10], cfg.model,
                                    capacity=raw["leaves"][0].shape[0])
    like = dict(params=model0.params, buffers=model0.buffers,
                adam=init_adam(model0.params))
    ckpt = load_pytree(ckpt_path, like)
    params, buffers = ckpt["params"], ckpt["buffers"]
    with open(ckpt_path.replace(".pkl", ".meta.pkl"), "rb") as f:
        meta = pickle.load(f)

    out_dir = os.path.join(args.model_path, "bitstreams")
    bits = encode_scene(params, buffers, cfg.model, meta["level_scales"],
                        meta["voxel_size"], out_dir,
                        disable_hyper=cfg.opt.disable_hyper)
    log.info("encoded %.3f MB", bits["total"] / 8 / 1024 / 1024)
    dec = decode_scene(out_dir, cfg.model)

    cam0 = scene.test_cameras[0]
    renderer = ev.make_decoded_renderer(dec, cfg, cam0.width, cam0.height,
                                        budget=args.budget)
    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.model.white_background
                     else [0.0, 0.0, 0.0])
    renders, gts, fps = ev.render_set(
        renderer, scene.test_cameras, bg,
        out_dir=os.path.join(args.model_path, "test"),
        save_images=args.save_images)
    metrics = ev.evaluate_images(renders, gts)
    log.info("test: PSNR %.3f SSIM %.4f FPS %.1f", metrics["PSNR"],
             metrics["SSIM"], fps)
    ev.write_results(args.model_path, "ours_from_ckpt", metrics, bits, fps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
