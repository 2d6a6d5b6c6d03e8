"""Autoregressive multi-level context generation (ContextGS core).

Behavioral spec: /root/reference/scene/gaussian_model.py:1541-1724
(multi_scale_generating + extract_context_feat). Levels are processed
coarsest→finest; each anchor is quantization-simulated exactly once, at its own
level, with entropy parameters (μ, σ, Q) predicted by that level's context MLP
from the *already-coded* parent at the next-coarser level (the coarsest level
is conditioned on anchor xyz + hyperprior latent only).

TPU redesign: the reference gathers ragged per-level index lists; here every
level step runs over the full padded anchor pool and results are merged with
`where(level == i)` masks — static shapes, no host sync, identical math. The
level/parent arrays come from models/levels.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from contextgs_tpu.config import ModelConfig
from contextgs_tpu.models import state as st
from contextgs_tpu.models.entropy import factorized_forward, gaussian_bits
from contextgs_tpu.models.levels import LevelMaps
from contextgs_tpu.models.mlps import apply_grid
from contextgs_tpu.models.quant import ste_multistep, uniform_noise_quant


class EntropyParams(NamedTuple):
    """Per-anchor predicted entropy parameters (full padded arrays)."""

    mean_feat: jnp.ndarray     # [N,F]
    scale_feat: jnp.ndarray    # [N,F]
    q_feat: jnp.ndarray        # [N,1]
    mean_scaling: jnp.ndarray  # [N,6]
    scale_scaling: jnp.ndarray  # [N,6]
    q_scaling: jnp.ndarray     # [N,1]
    mean_offsets: jnp.ndarray  # [N,3K]
    scale_offsets: jnp.ndarray  # [N,3K]
    q_offsets: jnp.ndarray     # [N,1]


class ContextOutput(NamedTuple):
    feat_q: jnp.ndarray        # [N,F] dequantized features
    scaling_q: jnp.ndarray     # [N,6]
    offsets_q: jnp.ndarray     # [N,K,3]
    hyper_q: jnp.ndarray       # [N,Fh] (noisy/rounded hyper latent)
    eparams: EntropyParams
    likelihood_hyper: jnp.ndarray  # [N,Fh]


class RateSummary(NamedTuple):
    bit_per_param: jnp.ndarray
    bit_per_feat_param: jnp.ndarray
    bit_per_scaling_param: jnp.ndarray
    bit_per_offsets_param: jnp.ndarray
    bit_per_hyper_param: jnp.ndarray
    bit_per_anchor_param: jnp.ndarray


def predict_entropy_params(mlps, level: int, feat_in: jnp.ndarray,
                           cfg: ModelConfig):
    """Run context MLP `level` and split μ/σ/Q (ref :1600-1611)."""
    f, k = cfg.feat_dim, cfg.n_offsets
    pred = apply_grid(mlps, level, feat_in)
    sizes = [f, f, 6, 6, 3 * k, 3 * k, 1, 1, 1]
    bounds = [0]
    for s in sizes:
        bounds.append(bounds[-1] + s)
    parts = [pred[:, bounds[i]:bounds[i + 1]] for i in range(len(sizes))]
    (mean_feat, scale_feat, mean_scaling, scale_scaling,
     mean_offsets, scale_offsets, qf, qs, qo) = parts
    q_feat = jnp.maximum(cfg.q_feat * (1 + jnp.tanh(qf)), 1e-9)
    q_scaling = jnp.maximum(cfg.q_scaling * (1 + jnp.tanh(qs)), 1e-9)
    q_offsets = jnp.maximum(cfg.q_offsets * (1 + jnp.tanh(qo)), 1e-9)
    return EntropyParams(mean_feat, scale_feat, q_feat,
                         mean_scaling, scale_scaling, q_scaling,
                         mean_offsets, scale_offsets, q_offsets)


def make_level_predictor(cfg: ModelConfig):
    """Shared jitted per-level entropy-parameter predictor.

    The encoder and decoder (compression/codec.py) must produce bit-identical
    μ/σ/Q — both call this one jitted function with identically-shaped inputs
    (the reference relies on cudnn.deterministic for the same contract,
    ref gaussian_model.py:1009,1301). Takes the MLP pytree directly (not the
    whole Params) so both sides produce the same HLO → one compile-cache
    entry."""

    @functools.partial(jax.jit, static_argnums=(1,))
    def predict(mlps, level: int, anchor_q, feat_state,
                scaling_state, parent, hyper_ctx) -> EntropyParams:
        if level == cfg.level_num - 1:
            feat_in = jnp.concatenate([anchor_q, hyper_ctx], axis=1)
        else:
            p = parent
            feat_in = jnp.concatenate(
                [anchor_q[p], feat_state[p], scaling_state[p], hyper_ctx],
                axis=1)
        return predict_entropy_params(mlps, level, feat_in, cfg)

    return predict


def multi_scale_generate(params: st.Params, buffers: st.Buffers,
                         cfg: ModelConfig, maps: LevelMaps,
                         anchor_q: jnp.ndarray, key: jax.Array,
                         training: bool, disable_hyper: bool = False
                         ) -> ContextOutput:
    """Quantization-simulate feat/scaling/offsets for every anchor through the
    level-wise autoregressive context (ref :1541-1686)."""
    n = anchor_q.shape[0]
    f, k_off = cfg.feat_dim, cfg.n_offsets
    keys = jax.random.split(key, cfg.level_num + 1)

    hyper_q, lik_hyper = factorized_forward(params.prior, params.hyper_latent,
                                            keys[-1], training)
    hyper_ctx = hyper_q * 0.0 if disable_hyper else hyper_q

    feat_q = jnp.zeros_like(params.anchor_feat)
    scaling_q = jnp.zeros_like(params.scaling_log)
    offsets_flat = params.offsets.reshape(n, 3 * k_off)
    offsets_q = jnp.zeros_like(offsets_flat)
    ep = EntropyParams(
        mean_feat=jnp.zeros((n, f)), scale_feat=jnp.zeros((n, f)),
        q_feat=jnp.ones((n, 1)),
        mean_scaling=jnp.zeros((n, 6)), scale_scaling=jnp.zeros((n, 6)),
        q_scaling=jnp.ones((n, 1)),
        mean_offsets=jnp.zeros((n, 3 * k_off)),
        scale_offsets=jnp.zeros((n, 3 * k_off)),
        q_offsets=jnp.ones((n, 1)))

    grid_scaling = st.get_scaling(params)

    for i in reversed(range(cfg.level_num)):
        sel = (maps.level == i) & buffers.alive                  # [N]
        if i == cfg.level_num - 1:
            feat_in = jnp.concatenate([anchor_q, hyper_ctx], axis=1)
        else:
            p = maps.parent
            ctx = jnp.concatenate([anchor_q[p], feat_q[p], scaling_q[p]], axis=1)
            feat_in = jnp.concatenate([ctx, hyper_ctx], axis=1)
        lep = predict_entropy_params(params.mlps, i, feat_in, cfg)

        if training:
            kf, ks, ko = jax.random.split(keys[i], 3)
            new_feat = uniform_noise_quant(params.anchor_feat, lep.q_feat, kf)
            new_scaling = uniform_noise_quant(grid_scaling, lep.q_scaling, ks)
            new_offsets = uniform_noise_quant(offsets_flat, lep.q_offsets, ko)
        else:
            new_feat = jax.lax.stop_gradient(
                ste_multistep(params.anchor_feat, lep.q_feat))
            new_scaling = jax.lax.stop_gradient(
                ste_multistep(grid_scaling, lep.q_scaling))
            new_offsets = jax.lax.stop_gradient(
                ste_multistep(offsets_flat, lep.q_offsets))

        m = sel[:, None]
        feat_q = jnp.where(m, new_feat, feat_q)
        scaling_q = jnp.where(m, new_scaling, scaling_q)
        offsets_q = jnp.where(m, new_offsets, offsets_q)
        ep = EntropyParams(*[jnp.where(m, a, b) for a, b in zip(lep, ep)])

    return ContextOutput(feat_q=feat_q, scaling_q=scaling_q,
                         offsets_q=offsets_q.reshape(n, k_off, 3),
                         hyper_q=hyper_q, eparams=ep,
                         likelihood_hyper=lik_hyper)


def estimate_total_bits(params: st.Params, buffers: st.Buffers,
                        cfg: ModelConfig, maps: LevelMaps, anchor_q,
                        key: jax.Array, disable_hyper: bool = False) -> dict:
    """Differentiable-model estimate of the final bitstream size
    (ref estimate_final_bits, gaussian_model.py:980-1004: the eval-mode rate
    summed over ALL alive anchors, anchors at 16 bit/coord, masks at their
    ideal Bernoulli count)."""
    from contextgs_tpu.models.entropy import binary_grid_size_bits

    out = multi_scale_generate(params, buffers, cfg, maps, anchor_q, key,
                               training=False, disable_hyper=disable_hyper)
    mask_anchor = st.get_mask_anchor(params, buffers.alive)
    cm = mask_anchor[:, None].astype(jnp.float32)
    ep = out.eparams
    n = anchor_q.shape[0]
    bit_hyper = jnp.sum(-jnp.log2(out.likelihood_hyper) * cm)
    bit_feat = jnp.sum(gaussian_bits(out.feat_q, ep.mean_feat, ep.scale_feat,
                                     ep.q_feat) * cm)
    bit_scaling = jnp.sum(gaussian_bits(out.scaling_q, ep.mean_scaling,
                                        ep.scale_scaling, ep.q_scaling) * cm)
    off = out.offsets_q.reshape(n, -1)
    masks = st.get_mask(params)
    m3 = jnp.repeat(masks, 3, axis=-1).reshape(n, -1)
    bit_offsets = jnp.sum(gaussian_bits(off, ep.mean_offsets,
                                        ep.scale_offsets, ep.q_offsets)
                          * m3 * cm)
    n_keep = jnp.sum(mask_anchor)
    _, bit_masks = binary_grid_size_bits(
        masks, valid=jnp.broadcast_to(mask_anchor[:, None], masks.shape))
    return dict(anchor=n_keep * 3 * 16, hyper=bit_hyper, feat=bit_feat,
                scaling=bit_scaling, offsets=bit_offsets, masks=bit_masks)


def estimate_rate(params: st.Params, buffers: st.Buffers, cfg: ModelConfig,
                  out: ContextOutput, binary_masks: jnp.ndarray,
                  mask_anchor: jnp.ndarray, key: jax.Array,
                  sample_frac: float = 0.15) -> RateSummary:
    """Monte-Carlo rate estimate over a random anchor subsample
    (ref :1658-1686, chosse_random_thresh=0.15)."""
    n = out.feat_q.shape[0]
    f, k_off = cfg.feat_dim, cfg.n_offsets
    choose = (jax.random.uniform(key, (n,)) <= sample_frac) & mask_anchor
    cm = choose[:, None].astype(jnp.float32)
    n_chosen = jnp.maximum(jnp.sum(choose), 1).astype(jnp.float32)
    alive_f = buffers.alive.astype(jnp.float32)
    n_aliv = jnp.maximum(jnp.sum(alive_f), 1)
    mask_anchor_rate = jnp.sum(mask_anchor) / n_aliv

    def masked_mean(x, m):
        return jnp.sum(x * m[:, None]) / jnp.maximum(jnp.sum(m) * x.shape[1], 1)

    ep = out.eparams
    x_mean_feat = masked_mean(params.anchor_feat, alive_f)
    x_mean_scaling = masked_mean(st.get_scaling(params), alive_f)
    x_mean_off = masked_mean(params.offsets.reshape(n, -1), alive_f)

    bit_hyper = -jnp.log2(out.likelihood_hyper) * cm
    bit_feat = gaussian_bits(out.feat_q, ep.mean_feat, ep.scale_feat,
                             ep.q_feat, x_mean_feat) * cm
    bit_scaling = gaussian_bits(out.scaling_q, ep.mean_scaling,
                                ep.scale_scaling, ep.q_scaling,
                                x_mean_scaling) * cm
    off_flat = out.offsets_q.reshape(n, 3 * k_off)
    mask3 = jnp.repeat(binary_masks, 3, axis=-1).reshape(n, 3 * k_off)
    bit_offsets = gaussian_bits(off_flat, ep.mean_offsets, ep.scale_offsets,
                                ep.q_offsets, x_mean_off) * mask3 * cm

    n_feat = n_chosen * f
    n_scaling = n_chosen * 6
    n_off = n_chosen * 3 * k_off
    n_hyper = n_chosen * cfg.hyper_dim
    s_hyper, s_feat = jnp.sum(bit_hyper), jnp.sum(bit_feat)
    s_scaling, s_off = jnp.sum(bit_scaling), jnp.sum(bit_offsets)
    return RateSummary(
        bit_per_param=(s_feat + s_scaling + s_off + s_hyper)
        / (n_feat + n_scaling + n_off) * mask_anchor_rate,
        bit_per_feat_param=s_feat / n_feat * mask_anchor_rate,
        bit_per_scaling_param=s_scaling / n_scaling * mask_anchor_rate,
        bit_per_offsets_param=s_off / n_off * mask_anchor_rate,
        bit_per_hyper_param=s_hyper / n_hyper * mask_anchor_rate,
        bit_per_anchor_param=16.0 * mask_anchor_rate,
    )
