"""Neural gaussian decode: anchors + MLPs → per-gaussian attributes.

Behavioral spec: /root/reference/gaussian_renderer/__init__.py:25-150
(generate_neural_gaussians): the training-schedule switchyard (plain
Scaffold-GS ≤3000; uniform-noise quantization 3000–10000; full context model
after 10000), then view-conditioned MLP decode into K gaussians per anchor.

TPU redesign: the reference compacts gaussians with a boolean mask before
rasterizing (dynamic shapes); here all N·K gaussian slots keep static shape and
culled gaussians carry opacity 0 — the rasterizer skips alpha≤1/255 exactly as
the CUDA one does, so results are identical.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from contextgs_tpu.config import ModelConfig, OptimizationConfig
from contextgs_tpu.models import state as st
from contextgs_tpu.models.context import (ContextOutput, RateSummary,
                                          estimate_rate, multi_scale_generate)
from contextgs_tpu.models.levels import LevelMaps
from contextgs_tpu.models.mlps import (apply_color, apply_cov,
                                       apply_feature_bank, apply_opacity)
from contextgs_tpu.models.quant import uniform_noise_quant


class NeuralGaussians(NamedTuple):
    """[N·K] gaussian attributes (static shape; dead slots have opacity 0)."""

    xyz: jnp.ndarray           # [NK,3]
    color: jnp.ndarray         # [NK,3]
    opacity: jnp.ndarray       # [NK]
    scaling: jnp.ndarray       # [NK,3]
    rot: jnp.ndarray           # [NK,4]
    neural_opacity: jnp.ndarray  # [NK] pre-mask opacity (densification stats)
    gauss_valid: jnp.ndarray   # [NK] bool — opacity>0, mask on, anchor visible
    anchor_visible: jnp.ndarray  # [N] bool


class DecodeAux(NamedTuple):
    rate: RateSummary | None
    context: ContextOutput | None


def decode_neural_gaussians(
    params: st.Params,
    buffers: st.Buffers,
    cfg: ModelConfig,
    camera_center: jnp.ndarray,       # [3]
    visible_mask: jnp.ndarray,        # [N] bool (prefilter result ∧ alive)
    *,
    feat: jnp.ndarray,                # [N,F]   (possibly quantized)
    grid_scaling: jnp.ndarray,        # [N,6]
    grid_offsets: jnp.ndarray,        # [N,K,3]
    anchor: jnp.ndarray,              # [N,3]   quantized anchors
    binary_mask: jnp.ndarray | None = None,  # [N,K] override (decoded scenes)
) -> NeuralGaussians:
    """The Scaffold-GS decode (ref gaussian_renderer/__init__.py:106-150)."""
    n, k = grid_offsets.shape[0], cfg.n_offsets

    ob_view = anchor - camera_center[None]
    ob_dist = jnp.linalg.norm(ob_view, axis=1, keepdims=True)
    ob_view = ob_view / jnp.maximum(ob_dist, 1e-12)

    if cfg.use_feat_bank and params.mlps.feature_bank is not None:
        # view-weighted multi-resolution feature blend. The reference only
        # *initializes* this MLP and never calls it in its renderer (ref
        # scene/gaussian_model.py:143-149, flag at arguments/__init__.py:57);
        # the applied semantics here are the upstream Scaffold-GS blend it was
        # built for: softmax weights over [coarse ::4, mid ::2, full] channel
        # subsamplings, each tiled back to full width.
        bank_w = apply_feature_bank(
            params.mlps, jnp.concatenate([ob_view, ob_dist], axis=1))  # [N,3]
        c = feat.shape[1]
        f4 = jnp.tile(feat[:, ::4], (1, 4))[:, :c]
        f2 = jnp.tile(feat[:, ::2], (1, 2))[:, :c]
        feat = (f4 * bank_w[:, 0:1] + f2 * bank_w[:, 1:2]
                + feat * bank_w[:, 2:3])

    cat_view = jnp.concatenate([feat, ob_view, ob_dist], axis=1)  # [N,F+4]

    neural_opacity = apply_opacity(params.mlps, cat_view).reshape(n * k)
    if binary_mask is None:
        binary_mask = st.get_mask(params)
    binary_mask = binary_mask.reshape(n * k)
    neural_opacity = neural_opacity * binary_mask
    pos_mask = neural_opacity > 0.0

    color = apply_color(params.mlps, cat_view).reshape(n * k, 3)
    scale_rot = apply_cov(params.mlps, cat_view).reshape(n * k, 7)

    scaling_rep = jnp.repeat(grid_scaling, k, axis=0)             # [NK,6]
    anchor_rep = jnp.repeat(anchor, k, axis=0)                    # [NK,3]
    offsets = grid_offsets.reshape(n * k, 3)

    scaling = scaling_rep[:, 3:] * jax.nn.sigmoid(scale_rot[:, :3])
    rot_raw = scale_rot[:, 3:7]
    rot = rot_raw / jnp.maximum(
        jnp.linalg.norm(rot_raw, axis=1, keepdims=True), 1e-12)
    xyz = anchor_rep + offsets * scaling_rep[:, :3]

    vis = jnp.repeat(visible_mask, k, axis=0)
    valid = pos_mask & vis
    opacity = jnp.where(valid, neural_opacity, 0.0)

    return NeuralGaussians(xyz=xyz, color=color, opacity=opacity,
                           scaling=scaling, rot=rot,
                           neural_opacity=neural_opacity,
                           gauss_valid=valid, anchor_visible=visible_mask)


def generate_neural_gaussians(
    params: st.Params,
    buffers: st.Buffers,
    cfg: ModelConfig,
    opt: OptimizationConfig,
    camera_center: jnp.ndarray,
    visible_mask: jnp.ndarray,        # [N] bool from prefilter (∧ alive)
    key: jax.Array,
    *,
    phase: str,                       # "plain" | "noise" | "context"
    training: bool,
    maps: LevelMaps | None = None,    # required for phase="context"
) -> tuple[NeuralGaussians, DecodeAux]:
    """Training-schedule switchyard (ref gaussian_renderer/__init__.py:41-104).

    phase="plain":   raw parameters (step ≤ 3000, or decoded_version eval)
    phase="noise":   uniform noise at base Q on feat/scaling/offsets (3000,10000]
    phase="context": full multi-level context quantization (+rate if training)
    """
    anchor_q = st.get_anchor(params, buffers)
    feat = params.anchor_feat
    grid_scaling = st.get_scaling(params)
    grid_offsets = params.offsets
    aux = DecodeAux(rate=None, context=None)

    if phase == "noise":
        kf, ks, ko = jax.random.split(key, 3)
        feat = uniform_noise_quant(feat, cfg.q_feat, kf)
        grid_scaling = uniform_noise_quant(grid_scaling, cfg.q_scaling, ks)
        grid_offsets = uniform_noise_quant(grid_offsets, cfg.q_offsets, ko)
    elif phase == "context":
        assert maps is not None
        kc, kr = jax.random.split(key)
        ctx = multi_scale_generate(params, buffers, cfg, maps, anchor_q, kc,
                                   training=training,
                                   disable_hyper=opt.disable_hyper)
        feat, grid_scaling, grid_offsets = (ctx.feat_q, ctx.scaling_q,
                                            ctx.offsets_q)
        rate = None
        if training:
            binary_masks = st.get_mask(params)
            mask_anchor = st.get_mask_anchor(params, buffers.alive)
            rate = estimate_rate(params, buffers, cfg, ctx, binary_masks,
                                 mask_anchor, kr,
                                 sample_frac=opt.rate_sample_frac)
        aux = DecodeAux(rate=rate, context=ctx)

    ng = decode_neural_gaussians(params, buffers, cfg, camera_center,
                                 visible_mask, feat=feat,
                                 grid_scaling=grid_scaling,
                                 grid_offsets=grid_offsets, anchor=anchor_q)
    return ng, aux
