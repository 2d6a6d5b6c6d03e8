"""Optimizer: one Adam with per-group log-lerp learning-rate schedules.

Behavioral spec: /root/reference/scene/gaussian_model.py:426-559 (named Adam
param groups, eps=1e-15) and /root/reference/utils/general_utils.py:49-82
(exponential log-lerp schedules). The reference performs in-place "optimizer
surgery" on Adam state during densification; here the state is a plain pytree
aligned with the padded parameter pool, so densification just zeroes the slots
it activates/prunes (train/densify.py) — no surgery.

Groups with schedules: offset, mask, mlp_opacity, mlp_cov, mlp_color,
latent_codec (prior), mlp_grid (+anchor, which is 0 → frozen). Constant lr:
anchor_feat, hyper_latent, opacity, scaling, rotation.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from contextgs_tpu.config import OptimizationConfig
from contextgs_tpu.models.state import Params


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 30_000,
             step_sub: int = 0):
    """Log-lerp schedule (ref utils/general_utils.py:49-82). jnp-traceable."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay = 1.0
    t = jnp.clip((step - step_sub) / (max_steps - step_sub), 0.0, 1.0)
    log_lerp = jnp.exp(math.log(max(lr_init, 1e-30)) * (1 - t)
                       + math.log(max(lr_final, 1e-30)) * t)
    return delay * log_lerp


def group_lrs(opt: OptimizationConfig, step, spatial_lr_scale: float) -> dict:
    """Learning rate of every Params field at `step` (jnp scalars)."""
    s = spatial_lr_scale
    return dict(
        anchor=expon_lr(step, opt.anchor_lr * s, 0.0),
        offset=expon_lr(step, opt.offset_lr_init * s, opt.offset_lr_final * s,
                        lr_delay_mult=opt.offset_lr_delay_mult,
                        max_steps=opt.offset_lr_max_steps),
        mask_logit=expon_lr(step, opt.mask_lr_init * s, opt.mask_lr_final * s,
                            lr_delay_mult=opt.mask_lr_delay_mult,
                            max_steps=opt.mask_lr_max_steps),
        anchor_feat=jnp.asarray(opt.feature_lr, jnp.float32),
        hyper_latent=jnp.asarray(opt.hyper_latent_lr, jnp.float32),
        opacity_raw=jnp.asarray(opt.opacity_lr, jnp.float32),
        scaling_log=jnp.asarray(opt.scaling_lr, jnp.float32),
        rotation=jnp.asarray(opt.rotation_lr, jnp.float32),
        mlp_opacity=expon_lr(step, opt.mlp_opacity_lr_init,
                             opt.mlp_opacity_lr_final,
                             lr_delay_mult=opt.mlp_opacity_lr_delay_mult,
                             max_steps=opt.mlp_opacity_lr_max_steps),
        mlp_cov=expon_lr(step, opt.mlp_cov_lr_init, opt.mlp_cov_lr_final,
                         lr_delay_mult=opt.mlp_cov_lr_delay_mult,
                         max_steps=opt.mlp_cov_lr_max_steps),
        mlp_color=expon_lr(step, opt.mlp_color_lr_init, opt.mlp_color_lr_final,
                           lr_delay_mult=opt.mlp_color_lr_delay_mult,
                           max_steps=opt.mlp_color_lr_max_steps),
        mlp_featurebank=expon_lr(step, opt.mlp_featurebank_lr_init,
                                 opt.mlp_featurebank_lr_final,
                                 lr_delay_mult=opt.mlp_featurebank_lr_delay_mult,
                                 max_steps=opt.mlp_featurebank_lr_max_steps),
        latent_codec=expon_lr(step, opt.latent_codec_lr_init,
                              opt.latent_codec_lr_final,
                              lr_delay_mult=opt.latent_codec_lr_delay_mult,
                              max_steps=opt.latent_codec_lr_max_steps),
        mlp_grid=expon_lr(step, opt.mlp_grid_lr_init, opt.mlp_grid_lr_final,
                          lr_delay_mult=opt.mlp_grid_lr_delay_mult,
                          max_steps=opt.mlp_grid_lr_max_steps),
    )


def _lr_tree(params: Params, lrs: dict):
    """Map the per-field lrs onto the Params pytree structure."""
    mlps = params.mlps
    mlp_lrs = type(mlps)(
        opacity=jax.tree.map(lambda _: lrs["mlp_opacity"], mlps.opacity),
        cov=jax.tree.map(lambda _: lrs["mlp_cov"], mlps.cov),
        color=jax.tree.map(lambda _: lrs["mlp_color"], mlps.color),
        grid=jax.tree.map(lambda _: lrs["mlp_grid"], mlps.grid),
        feature_bank=jax.tree.map(lambda _: lrs["mlp_featurebank"],
                                  mlps.feature_bank),
    )
    return Params(
        anchor=lrs["anchor"],
        anchor_feat=lrs["anchor_feat"],
        hyper_latent=lrs["hyper_latent"],
        offsets=lrs["offset"],
        mask_logit=lrs["mask_logit"],
        scaling_log=lrs["scaling_log"],
        rotation=jnp.zeros(()),       # frozen (requires_grad_(False) in ref)
        opacity_raw=jnp.zeros(()),    # frozen
        mlps=mlp_lrs,
        prior=jax.tree.map(lambda _: lrs["latent_codec"], params.prior),
    )


class AdamState(NamedTuple):
    mu: Params
    nu: Params
    count: jnp.ndarray


def init_adam(params: Params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=zeros, count=jnp.zeros((), jnp.int32))


def adam_update(params: Params, grads: Params, state: AdamState,
                opt: OptimizationConfig, step, spatial_lr_scale: float,
                b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15
                ) -> tuple[Params, AdamState]:
    """Adam(eps=1e-15) with per-leaf lr from the schedule tree.

    Matches torch.optim.Adam semantics (bias-corrected step size)."""
    lrs = _lr_tree(params, group_lrs(opt, step, spatial_lr_scale))
    count = state.count + 1
    cf = count.astype(jnp.float32)
    bc1 = 1 - b1 ** cf
    bc2 = 1 - b2 ** cf

    def upd(p, g, m, v, lr):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * (g * g)
        step_ = lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        return p - step_, m, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = jax.tree.leaves(grads)
    flat_m = jax.tree.leaves(state.mu)
    flat_v = jax.tree.leaves(state.nu)
    flat_lr = jax.tree.leaves(_broadcast_lrs(lrs, params))
    new_p, new_m, new_v = [], [], []
    for p, g, m, v, lr in zip(flat_p, flat_g, flat_m, flat_v, flat_lr):
        pp, mm, vv = upd(p, g, m, v, lr)
        new_p.append(pp)
        new_m.append(mm)
        new_v.append(vv)
    return (jax.tree.unflatten(treedef, new_p),
            AdamState(mu=jax.tree.unflatten(treedef, new_m),
                      nu=jax.tree.unflatten(treedef, new_v), count=count))


def _broadcast_lrs(lrs, params: Params):
    """The lr tree holds scalars at group roots; align leaf-for-leaf."""
    return jax.tree.map(lambda lr, p: lr, lrs, params)
