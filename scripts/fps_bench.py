#!/usr/bin/env python
"""Decoded-scene rendering FPS at 720p-class resolution (VERDICT r1 #4).

The reference claims faster-than-Scaffold-GS rendering (ref README.md:13-16)
and measures per-view FPS with a 5-frame warmup discard (ref train.py:409-414).
Round-1 measured 19 FPS at 128x128 INCLUDING per-view dispatch through the
axon tunnel — dispatch-bound, not render-bound. This harness measures, on a
synthetic decoded scene at 1280x720:

  a) the naive per-view dispatch loop (render_set-style, one jit call/view)
  b) the amortized path: V views chained inside ONE jit via lax.fori_loop over
     stacked camera matrices — per-view cost with dispatch amortized away,
     which is how a production viewer/batch evaluator would drive the chip.

Usage: python scripts/fps_bench.py [--anchors 100000] [--views 32]
       [--width 1280] [--height 720]
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--anchors", type=int, default=100_000)
    ap.add_argument("--views", type=int, default=32)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--budget", type=int, default=1 << 20)
    ap.add_argument("--feat-dim", type=int, default=50)
    ap.add_argument("--n-offsets", type=int, default=10)
    args = ap.parse_args()

    from contextgs_tpu.compression.codec import DecodedScene
    from contextgs_tpu.config import (ModelConfig, PipelineConfig, TrainConfig)
    from contextgs_tpu.evaluation import make_decoded_renderer
    from contextgs_tpu.models.mlps import init_decoder_mlps
    from contextgs_tpu.scene.cameras import Camera

    W, H, N, V = args.width, args.height, args.anchors, args.views
    rng = np.random.default_rng(0)
    mcfg = ModelConfig(feat_dim=args.feat_dim, n_offsets=args.n_offsets)
    cfg = TrainConfig(model=mcfg, pipe=PipelineConfig(chunk_size=128))
    mlps = init_decoder_mlps(jax.random.PRNGKey(0), mcfg)

    dec = DecodedScene(
        anchor=rng.uniform(-2, 2, (N, 3)).astype(np.float32),
        feat=rng.normal(size=(N, mcfg.feat_dim)).astype(np.float32) * 0.3,
        scaling=rng.uniform(0.01, 0.05, (N, 6)).astype(np.float32),
        offsets=rng.normal(size=(N, mcfg.n_offsets, 3)).astype(np.float32) * 0.3,
        masks=(rng.random((N, mcfg.n_offsets)) < 0.7).astype(np.float32),
        hyper=np.zeros((N, mcfg.feat_dim // mcfg.hyper_divisor), np.float32),
        mlps=mlps, prior=None, level_scales=[], voxel_size=0.001)
    render = make_decoded_renderer(dec, cfg, W, H, budget=args.budget)

    cams = []
    for i in range(V):
        ang = 2 * np.pi * i / V
        Rm = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                       [-np.sin(ang), 0, np.cos(ang)]])
        c = Camera(uid=i, colmap_id=i, R=Rm, T=np.array([0.0, 0.0, 4.0]),
                   fov_x=1.2, fov_y=2 * math.atan(math.tan(0.6) * H / W),
                   image=None, width=W, height=H)
        cams.append({k: jnp.asarray(v) for k, v in c.as_device_dict().items()})
    bg = jnp.zeros(3, jnp.float32)

    # --- (a) naive per-view dispatch (render_set-style) ---
    img = render(cams[0], bg)
    np.asarray(img)   # compile + fetch-path warm
    t0 = time.time()
    for c in cams:
        img = render(c, bg)
        img.block_until_ready()
    np.asarray(img)
    per_view_naive = (time.time() - t0) / V
    print(f"naive per-view dispatch: {per_view_naive*1e3:8.2f} ms/view "
          f"= {1.0/per_view_naive:6.1f} FPS @ {W}x{H}, {N} anchors")

    # --- (b) amortized: V views chained inside one jit ---
    stk = {k: jnp.stack([c[k] for c in cams]) for k in cams[0]}

    inner = render.inner()

    @jax.jit
    def render_all(stk, bg):
        # accumulate the overflow flags across the chained views: a mid-run
        # budget / vis-cap overflow silently truncates the deepest splats, so
        # the amortized numbers are only valid if no view overflowed
        # (ADVICE r3: evaluation.py:118 consumers must not discard the flags)
        def body(i, carry):
            acc, any_ovf = carry
            cam_i = {k: v[i] for k, v in stk.items()}
            img, ovf, vovf, n_vis_anchor = inner(cam_i, bg)
            return acc + jnp.mean(img), any_ovf | ovf | vovf | (n_vis_anchor > 0)
        return jax.lax.fori_loop(0, V, body, (jnp.float32(0),
                                              jnp.asarray(False)))

    out, any_ovf = render_all(stk, bg)
    np.asarray(out)
    t0 = time.time()
    out, any_ovf = render_all(stk, bg)
    np.asarray(out)
    per_view_amort = (time.time() - t0) / V
    if bool(any_ovf):
        print("WARNING: instance-budget or vis-cap overflow during the "
              "amortized run — deepest splats truncated; rerun with a larger "
              "--budget for valid numbers")
    print(f"amortized (fori in jit):  {per_view_amort*1e3:8.2f} ms/view "
          f"= {1.0/per_view_amort:6.1f} FPS @ {W}x{H}, {N} anchors")
    print(f"dispatch overhead amortization: "
          f"{per_view_naive/per_view_amort:.2f}x")


if __name__ == "__main__":
    main()
