#!/usr/bin/env python
"""Decode-only driver: bitstreams → render → metrics.

Equivalent of /root/reference/decompress.py (invocation README.md:102-111):
loads the compressed bitstream directory produced by train.py, decodes the
scene, renders the test split and evaluates.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import jax.numpy as jnp

from contextgs_tpu.config import TrainConfig
from contextgs_tpu.compression.codec import decode_scene
from contextgs_tpu import evaluation as ev
from contextgs_tpu.scene.dataset_readers import load_scene


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-s", "--source_path", required=True)
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("--budget", type=int, default=1 << 20)
    p.add_argument("--save_images", action="store_true")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("contextgs_tpu")

    with open(os.path.join(args.model_path, "cfg_args")) as f:
        cfg = TrainConfig.from_json(f.read())

    scene = load_scene(args.source_path, images=cfg.images,
                       eval_split=cfg.model.eval, lod=cfg.model.lod,
                       white_background=cfg.model.white_background,
                       resolution=cfg.model.resolution)
    dec = decode_scene(os.path.join(args.model_path, "bitstreams"), cfg.model)
    log.info("decoded %d anchors", dec.anchor.shape[0])

    cam0 = scene.test_cameras[0]
    renderer = ev.make_decoded_renderer(dec, cfg, cam0.width, cam0.height,
                                        budget=args.budget)
    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.model.white_background
                     else [0.0, 0.0, 0.0])
    renders, gts, fps = ev.render_set(
        renderer, scene.test_cameras, bg,
        out_dir=os.path.join(args.model_path, "decoded_test"),
        save_images=args.save_images)
    metrics = ev.evaluate_images(renders, gts)
    log.info("decoded test: PSNR %.3f SSIM %.4f FPS %.1f", metrics["PSNR"],
             metrics["SSIM"], fps)
    ev.write_results(args.model_path, "decoded", metrics, None, fps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
