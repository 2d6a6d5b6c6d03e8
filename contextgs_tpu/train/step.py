"""Jitted training step: render → loss → grads → Adam → densify stats.

Behavioral spec: the reference's inner loop (/root/reference/train.py:125-262):
loss = lmbda_rec·((1−λ_ssim)·L1 + λ_ssim·(1−SSIM)) + 0.01·Πscaling
       [+ λ·bit_per_param + 5e-4·mean(sigmoid(mask))  once the context phase starts]

The training-schedule phases (plain ≤3000 < noise ≤10000 < context) become
three jitted step functions selected host-side; densification statistics are
gathered from the cotangent of the zero-valued screenspace dummy, gated by a
traced flag (ref train.py:243-247).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from contextgs_tpu.config import TrainConfig
from contextgs_tpu.models import densify, state as st
from contextgs_tpu.models.levels import build_level_maps
from contextgs_tpu.models.renderer import render
from contextgs_tpu.models.state import Buffers, Params
from contextgs_tpu.ops.ssim import l1_loss, psnr, ssim
from contextgs_tpu.train.optim import AdamState, adam_update


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    psnr: jnp.ndarray
    bit_per_param: jnp.ndarray
    n_visible_gauss: jnp.ndarray
    overflowed: jnp.ndarray
    vis_overflowed: jnp.ndarray
    n_instances: jnp.ndarray     # true tile-instance count (budget watermark)
    n_vis: jnp.ndarray           # gaussians touching >=1 tile (cap watermark)


def make_train_step(cfg: TrainConfig, width: int, height: int, budget: int,
                    phase: str, level_scales: tuple,
                    spatial_lr_scale: float, voxel_size: float,
                    vis_cap: int | None = None):
    """Build the jitted step for one (phase, resolution) configuration.

    `vis_cap` (static) bounds rendered gaussians per view like the decoded
    path (VERDICT r3 #4c): the splat gather table is sliced to the visible
    prefix, keeping it scoped-VMEM-resident when the padded pool is much
    larger than any view's visible set. Overflow surfaces in the metrics and
    the host loop doubles the cap + re-jits (same reaction as the budget)."""
    mcfg, opt, pipe = cfg.model, cfg.opt, cfg.pipe

    @jax.jit
    def step(params: Params, buffers: Buffers, adam: AdamState, cam: dict,
             gt_image: jnp.ndarray, bg: jnp.ndarray, it: jnp.ndarray,
             with_stats: jnp.ndarray, key: jax.Array):
        maps = None
        if phase == "context":
            anchor_q = st.get_anchor(params, buffers)
            # level membership over the KEPT set (alive ∧ mask_anchor), not
            # all alive anchors: the encoder compacts to kept anchors before
            # building levels (codec.py, ref gaussian_model.py:1031-1038), so
            # training with full-alive membership teaches the context MLPs
            # parents they never see at coding time — measured +50% feat
            # bits at 77k anchors (r5 codec audit). Masked anchors render
            # nothing and carry no rate, so excluding them is free.
            kept = st.get_mask_anchor(params, buffers.alive)
            maps = build_level_maps(jax.lax.stop_gradient(anchor_q),
                                    kept, voxel_size,
                                    level_scales, mcfg.level_num)
        nk = params.offsets.shape[0] * mcfg.n_offsets
        screen_dummy0 = jnp.zeros((nk, 2), jnp.float32)

        def loss_fn(p, screen_dummy):
            out = render(p, buffers, mcfg, opt, pipe, cam, width, height, bg,
                         key, phase=phase, training=True, maps=maps,
                         screen_dummy=screen_dummy, budget=budget,
                         vis_cap=vis_cap)
            l1 = l1_loss(out.image, gt_image)
            ssim_v = ssim(out.image, gt_image)
            gv = out.gaussians.gauss_valid
            prod3 = jnp.prod(out.gaussians.scaling, axis=1)
            scaling_reg = (jnp.sum(jnp.where(gv, prod3, 0.0))
                           / jnp.maximum(jnp.sum(gv), 1))
            loss = (opt.lmbda_rec * ((1.0 - opt.lambda_dssim) * l1
                                     + opt.lambda_dssim * (1.0 - ssim_v))
                    + opt.scaling_reg_weight * scaling_reg)
            bpp = jnp.zeros(())
            if phase == "context":
                rate = out.aux.rate
                bpp = rate.bit_per_param
                alive = buffers.alive
                mask_mean = (jnp.sum(jax.nn.sigmoid(p.mask_logit)
                                     * alive[:, None])
                             / jnp.maximum(jnp.sum(alive) * mcfg.n_offsets, 1))
                loss = loss + opt.lmbda * bpp + opt.mask_reg_weight * mask_mean
            return loss, (out, l1, bpp)

        (loss, (out, l1, bpp)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, screen_dummy0)
        pgrads, screen_grad = grads

        # densification statistics from the screenspace cotangent
        sf = with_stats.astype(jnp.float32)
        new_buffers = densify.accumulate_stats(
            buffers, out.gaussians.neural_opacity * sf + 0.0,
            out.gaussians.gauss_valid & with_stats,
            out.visibility, out.gaussians.anchor_visible & with_stats,
            screen_grad, mcfg.n_offsets)

        new_params, new_adam = adam_update(params, pgrads, adam, opt, it,
                                           spatial_lr_scale)
        metrics = StepMetrics(
            loss=loss, l1=l1, psnr=psnr(out.image, gt_image),
            bit_per_param=bpp,
            n_visible_gauss=jnp.sum(out.gaussians.gauss_valid),
            overflowed=out.overflowed, vis_overflowed=out.vis_overflowed,
            n_instances=out.n_instances, n_vis=out.n_vis)
        return new_params, new_buffers, new_adam, metrics

    return step


def make_eval_render(cfg: TrainConfig, width: int, height: int, budget: int,
                     phase: str, level_scales: tuple, voxel_size: float = 0.0):
    """Jitted eval-time render (STE quantization instead of noise)."""
    mcfg, opt, pipe = cfg.model, cfg.opt, cfg.pipe

    @jax.jit
    def run(params: Params, buffers: Buffers, cam: dict, bg: jnp.ndarray,
            key: jax.Array):
        maps = None
        if phase == "context":
            anchor_q = st.get_anchor(params, buffers)
            # kept-set membership, matching the encoder (see make_train_step)
            kept = st.get_mask_anchor(params, buffers.alive)
            maps = build_level_maps(anchor_q, kept, voxel_size,
                                    level_scales, mcfg.level_num)
        out = render(params, buffers, mcfg, opt, pipe, cam, width, height, bg,
                     key, phase=phase, training=False, maps=maps,
                     budget=budget)
        return out.image

    return run
