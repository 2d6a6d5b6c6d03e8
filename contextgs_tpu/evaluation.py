"""Evaluation: render camera sets, compute metrics, write results.json.

Behavioral spec: /root/reference/train.py:409-569 (render_set / render_sets /
evaluate — duplicated nearly verbatim in test.py and decompress.py there):
per-view renders + error maps as PNGs, PSNR/SSIM(/LPIPS when weights exist),
results.json and per_view.json, FPS with warmup discard.
"""

from __future__ import annotations

import json
import os
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from contextgs_tpu.config import TrainConfig
from contextgs_tpu.compression.codec import DecodedScene
from contextgs_tpu.models.decode import decode_neural_gaussians
from contextgs_tpu.ops import rasterize as rz
from contextgs_tpu.ops.ssim import psnr as psnr_fn, ssim as ssim_fn


class _DecodedParams(NamedTuple):
    """Minimal params view for decoded-scene rendering (mlps only)."""

    mlps: object


def make_decoded_renderer(dec: DecodedScene, cfg: TrainConfig, width: int,
                          height: int, budget: int = 1 << 18,
                          vis_cap: int | None = None,
                          anchor_cap: int | None = None):
    """Jitted renderer over a decoded (compacted) scene — the reference's
    decoded_version path (gaussian_renderer/__init__.py:103-104).

    `vis_cap` bounds rendered gaussians per view (rasterize's visible-prefix
    table slice — keeps the splat gather scoped-VMEM-resident at large
    scenes). Defaults to half the decoded pool (but at least 2^19) when the
    pool is big enough for the cap to matter; overflow doubles it, exactly
    like the instance-budget reaction below.

    `anchor_cap` compacts the frustum-visible anchors into a bounded [A]
    working set BEFORE the MLP decode and rasterization (one packed row
    gather), so every G-proportional stage — projection, depth/tile sorts,
    splat gathers, ffills — runs at the view's visible size instead of the
    full scene size. The CUDA reference gets this for free from its ragged
    `opacity>0` compaction (ref gaussian_renderer/__init__.py:112-119); a
    bounded gather is the static-shape equivalent. Defaults to half the
    anchor pool (4096-bucketed) for scenes past 64k anchors; a view with
    more visible anchors than the cap overflows and doubles it, same
    reaction as the budget."""
    mcfg, pipe = cfg.model, cfg.pipe
    params = _DecodedParams(mlps=dec.mlps)
    # pad the anchor count to a 4096 bucket so renderer compiles are reused
    # across runs/scenes with similar sizes (each compile is minutes here)
    n_raw = dec.anchor.shape[0]
    n = max(((n_raw + 4095) // 4096) * 4096, 4096)

    def pad(x):
        out = np.zeros((n,) + x.shape[1:], np.float32)
        out[:n_raw] = x
        return jnp.asarray(out)

    anchor = pad(dec.anchor)
    feat = pad(dec.feat)
    scaling = pad(dec.scaling)
    offsets = pad(dec.offsets)
    masks = pad(dec.masks)   # padded slots: mask 0 → no gaussians
    backend = pipe.backend if pipe.backend != "auto" else "pallas"
    K = mcfg.n_offsets

    # one packed per-anchor row table for the compaction gather: full rows
    # padded to a 128-column multiple are the row-gather fast path (see
    # ops/rasterize/__init__._pack)
    cols = [anchor, feat, scaling, offsets.reshape(n, -1), masks]
    widths = [c.shape[1] for c in cols]
    d_raw = sum(widths)
    d = ((d_raw + 127) // 128) * 128
    packed_rows = jnp.concatenate(
        cols + [jnp.zeros((n, d - d_raw), jnp.float32)], axis=1)   # [n, d]

    g_dec = n * K
    if vis_cap is None and g_dec > (1 << 20):
        vis_cap = max(1 << 19, g_dec // 2)
    if anchor_cap is None and n > (1 << 16):
        anchor_cap = max(1 << 15, ((n // 2 + 4095) // 4096) * 4096)
    if anchor_cap is not None and anchor_cap >= n:
        anchor_cap = None

    def make_run(bdg: int, vcap, acap):
        @jax.jit
        def run(cam: dict, bg: jnp.ndarray):
            vis = rz.visible_filter(anchor, scaling[:, :3], cam["world_view"],
                                    cam["full_proj"], cam["tanfovx"],
                                    cam["tanfovy"], width, height)
            # visible-anchor count: 0 signals "fits" so the reaction can
            # right-size the cap from the actual count instead of doubling
            n_vis_anchor = jnp.asarray(0, jnp.int32)
            if acap is not None:
                # stable partition: visible anchors first, then one bounded
                # row gather of the packed table
                idx = jnp.argsort(~vis, stable=True)[:acap]
                sub = packed_rows[idx]                       # [acap, d]
                o = np.cumsum([0] + widths)
                a_s, f_s, s_s, off_s, m_s = (
                    sub[:, o[i]:o[i + 1]] for i in range(5))
                vis_sub = vis[idx]       # False rows = padding past the count
                nv = jnp.sum(vis).astype(jnp.int32)
                n_vis_anchor = jnp.where(nv > acap, nv, 0)
                ng = decode_neural_gaussians(
                    params, None, mcfg, cam["camera_center"], vis_sub,
                    feat=f_s, grid_scaling=s_s,
                    grid_offsets=off_s.reshape(acap, K, 3), anchor=a_s,
                    binary_mask=m_s)
            else:
                ng = decode_neural_gaussians(
                    params, None, mcfg, cam["camera_center"], vis, feat=feat,
                    grid_scaling=scaling, grid_offsets=offsets, anchor=anchor,
                    binary_mask=masks)
            out = rz.rasterize(ng.xyz, ng.scaling, ng.rot, ng.color,
                               ng.opacity,
                               world_view=cam["world_view"],
                               full_proj=cam["full_proj"],
                               tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
                               width=width, height=height, bg=bg,
                               tile_size=pipe.tile_size, budget=bdg,
                               chunk_size=pipe.chunk_size, backend=backend,
                               valid=ng.gauss_valid, vis_cap=vcap)
            return out.image, out.overflowed, out.vis_overflowed, n_vis_anchor
        return run

    # instance-budget (or visible-cap / anchor-cap) overflow silently
    # truncates splats (or whole anchors) of exactly the renders used for
    # reported PSNR — react like the train loop (train/loop.py budget
    # doubling): double the overflowed limit and re-jit, then re-render.
    state = {"budget": budget, "vis_cap": vis_cap, "anchor_cap": anchor_cap,
             "run": make_run(budget, vis_cap, anchor_cap)}

    def render(cam: dict, bg: jnp.ndarray):
        import logging
        while True:
            img, overflowed, vis_ovf, anchor_ovf = state["run"](cam, bg)
            if not (bool(overflowed) or bool(vis_ovf) or bool(anchor_ovf)):
                return img
            if bool(overflowed):
                state["budget"] *= 2
                logging.getLogger("contextgs").warning(
                    "decoded-render instance budget overflow → doubling to "
                    "%d (re-jit)", state["budget"])
            if bool(vis_ovf):
                state["vis_cap"] = (None if state["vis_cap"] * 2 >= g_dec
                                    else state["vis_cap"] * 2)
                logging.getLogger("contextgs").warning(
                    "decoded-render visible-cap overflow → raising to %s "
                    "(re-jit)", state["vis_cap"])
            if bool(anchor_ovf):
                # right-size from the actual visible count (+20% margin,
                # 4096-bucketed); disable only when no bucket below n helps
                want = ((int(anchor_ovf) * 6 // 5 + 4095) // 4096) * 4096
                state["anchor_cap"] = want if want < n else None
                logging.getLogger("contextgs").warning(
                    "decoded-render anchor-cap overflow (%d visible) → "
                    "raising to %s (re-jit)", int(anchor_ovf),
                    state["anchor_cap"])
            state["run"] = make_run(state["budget"], state["vis_cap"],
                                    state["anchor_cap"])

    # amortized-dispatch consumers (scripts/fps_bench.py) chain many views
    # inside one jit; expose the current inner jitted fn (tracks budget /
    # vis-cap doubling) — it returns (image, overflowed, vis_overflowed,
    # anchor_overflowed)
    render.inner = lambda: state["run"]
    return render


def evaluate_images(renders: list, gts: list) -> dict:
    """PSNR/SSIM(/LPIPS) over [3,H,W] float arrays (ref train.py:502-569).

    LPIPS requires exported VGG weights (CONTEXTGS_LPIPS_WEIGHTS, see
    ops/lpips.py) — unavailable in zero-egress environments → None."""
    from contextgs_tpu.ops.lpips import load_weights, lpips as lpips_fn

    psnrs, ssims, lpipss = [], [], []
    jssim = jax.jit(ssim_fn)
    jpsnr = jax.jit(psnr_fn)
    lw = load_weights()
    jlpips = jax.jit(lambda a, b: lpips_fn(lw, a, b)) if lw else None
    for r, g in zip(renders, gts):
        r = jnp.clip(jnp.asarray(r), 0, 1)
        g = jnp.asarray(g)
        psnrs.append(float(jpsnr(r, g)))
        ssims.append(float(jssim(r, g)))
        if jlpips is not None:
            lpipss.append(float(jlpips(r, g)))
    out = dict(PSNR=float(np.mean(psnrs)), SSIM=float(np.mean(ssims)),
               per_view=dict(PSNR=psnrs, SSIM=ssims, LPIPS=lpipss),
               LPIPS=float(np.mean(lpipss)) if lpipss else None)
    if jlpips is None:
        # make the omission explicit in results.json rather than silent
        # (ref train.py:50-51 always computes LPIPS; here it is gated on an
        # exported VGG weight file in zero-egress environments)
        out["LPIPS_skipped"] = ("no VGG weights: set CONTEXTGS_LPIPS_WEIGHTS "
                                "to an exported .npz (see ops/lpips.py)")
    return out


def render_set(render_fn, cameras, bg, out_dir: Optional[str] = None,
               save_images: bool = True) -> tuple[list, list, float]:
    """Render all cameras; returns (renders, gts, fps). First 5 frames are
    warmup-discarded for FPS like the reference (train.py:409-414)."""
    renders, gts = [], []
    times = []
    for i, cam in enumerate(cameras):
        cd = {k: jnp.asarray(v) for k, v in cam.as_device_dict().items()}
        t0 = time.time()
        img = render_fn(cd, bg)
        img.block_until_ready()
        times.append(time.time() - t0)
        renders.append(np.asarray(img))
        gts.append(np.transpose(cam.image, (2, 0, 1)))
    fps = len(times[5:]) / max(sum(times[5:]), 1e-9) if len(times) > 5 else \
        len(times) / max(sum(times), 1e-9)
    if out_dir and save_images:
        os.makedirs(os.path.join(out_dir, "renders"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "gt"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "errors"), exist_ok=True)
        try:
            from PIL import Image
            for i, (r, g) in enumerate(zip(renders, gts)):
                def to_img(x):
                    return Image.fromarray(
                        (np.clip(x, 0, 1).transpose(1, 2, 0) * 255)
                        .astype(np.uint8))
                to_img(r).save(os.path.join(out_dir, "renders", f"{i:05d}.png"))
                to_img(g).save(os.path.join(out_dir, "gt", f"{i:05d}.png"))
                to_img(np.abs(r - g)).save(
                    os.path.join(out_dir, "errors", f"{i:05d}.png"))
        except ImportError:
            pass
    return renders, gts, fps


def write_results(model_path: str, name: str, metrics: dict, size_bits=None,
                  fps: float = 0.0) -> None:
    os.makedirs(model_path, exist_ok=True)
    results_file = os.path.join(model_path, "results.json")
    existing = {}
    if os.path.exists(results_file):
        with open(results_file) as f:
            existing = json.load(f)
    entry = {"PSNR": metrics["PSNR"], "SSIM": metrics["SSIM"],
             "LPIPS": metrics.get("LPIPS"), "FPS": fps}
    if metrics.get("LPIPS_skipped"):
        entry["LPIPS_skipped"] = metrics["LPIPS_skipped"]
    if size_bits is not None:
        entry["size_MB"] = size_bits.get("total", 0) / 8 / 1024 / 1024
        entry["size_breakdown_bits"] = {
            k: v for k, v in size_bits.items() if isinstance(v, (int, float))}
    existing[name] = entry
    with open(results_file, "w") as f:
        json.dump(existing, f, indent=2)
    with open(os.path.join(model_path, "per_view.json"), "w") as f:
        json.dump({name: metrics.get("per_view", {})}, f, indent=2)
