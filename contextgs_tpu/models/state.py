"""Gaussian scene state: fixed-capacity padded parameter/buffer pytrees.

Behavioral spec: the tensor inventory of the reference's GaussianModel
(/root/reference/scene/gaussian_model.py:46-423, SURVEY.md §2.1). TPU-first
redesign: instead of dynamically reallocating [N, ...] tensors during
densification, all arrays live in a padded pool of static capacity with an
`alive` mask; growing activates free slots, pruning clears them, and the pool
is enlarged host-side (with one re-jit) only when full. Anchors are FROZEN in
the reference (position lr = 0, arguments/__init__.py:86) — they change only
through densification.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from contextgs_tpu.config import ModelConfig
from contextgs_tpu.models.entropy import FactorizedPrior, init_factorized_prior
from contextgs_tpu.models.mlps import DecoderMLPs, init_decoder_mlps
from contextgs_tpu.models.quant import mask_ste, quantize_anchor
from contextgs_tpu.ops.knn import mean_knn_sq_dist


class Params(NamedTuple):
    """Optimized leaves (each top-level field is an lr group, mirroring the
    reference's named Adam param groups, gaussian_model.py:426-525)."""

    anchor: jnp.ndarray        # [N,3]
    anchor_feat: jnp.ndarray   # [N,F]
    hyper_latent: jnp.ndarray  # [N,F//hyper_divisor]
    offsets: jnp.ndarray       # [N,K,3]
    mask_logit: jnp.ndarray    # [N,K]
    scaling_log: jnp.ndarray   # [N,6] (3 offset scales + 3 gaussian scales)
    rotation: jnp.ndarray      # [N,4] frozen identity (lr group exists, unused)
    opacity_raw: jnp.ndarray   # [N,1] frozen (renderer opacity comes from MLP)
    mlps: DecoderMLPs
    prior: FactorizedPrior


class Buffers(NamedTuple):
    """Non-optimized training state."""

    alive: jnp.ndarray             # [N] bool — slot in use
    bound_min: jnp.ndarray         # [1,3] anchor quantization bounds
    bound_max: jnp.ndarray         # [1,3]
    opacity_accum: jnp.ndarray     # [N] densification stats (ref :696-713)
    anchor_denom: jnp.ndarray      # [N]
    offset_grad_accum: jnp.ndarray  # [N,K]
    offset_denom: jnp.ndarray      # [N,K]


class SceneModel(NamedTuple):
    params: Params
    buffers: Buffers


# ---------------------------------------------------------------------------
# Activations / derived quantities (ref gaussian_model.py:288-375)
# ---------------------------------------------------------------------------

def get_scaling(params: Params) -> jnp.ndarray:
    return jnp.exp(params.scaling_log)


def get_mask(params: Params) -> jnp.ndarray:
    """[N,K] hard binary per-gaussian mask with STE."""
    return mask_ste(params.mask_logit)


def get_mask_anchor(params: Params, alive: jnp.ndarray) -> jnp.ndarray:
    """[N] bool — anchor alive iff any offset mask alive (ref :302-310)."""
    m = jax.lax.stop_gradient(get_mask(params))
    return (jnp.sum(m, axis=1) > 0) & alive


def get_anchor(params: Params, buffers: Buffers) -> jnp.ndarray:
    """16-bit quantized anchors with STE (ref :341-345)."""
    q, _ = quantize_anchor(params.anchor, buffers.bound_min, buffers.bound_max)
    return q


def get_rotation(params: Params) -> jnp.ndarray:
    n = jnp.linalg.norm(params.rotation, axis=-1, keepdims=True)
    return params.rotation / jnp.maximum(n, 1e-12)


def update_anchor_bound(buffers: Buffers, anchor: jnp.ndarray,
                        alive: jnp.ndarray) -> Buffers:
    """Recompute quantization bounds with 1.2/0.8 margins (ref :351-361)."""
    big = jnp.float32(1e30)
    amin = jnp.min(jnp.where(alive[:, None], anchor, big), axis=0, keepdims=True)
    amax = jnp.max(jnp.where(alive[:, None], anchor, -big), axis=0, keepdims=True)
    bmin = jnp.where(amin < 0, amin * 1.2, amin * 0.8)
    bmax = jnp.where(amax > 0, amax * 1.2, amax * 0.8)
    return buffers._replace(bound_min=bmin, bound_max=bmax)


# ---------------------------------------------------------------------------
# Initialisation (ref voxelize_sample + create_from_pcd, :377-423)
# ---------------------------------------------------------------------------

def voxelize_points(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Round to voxel grid + unique (ref :377-380)."""
    return np.unique(np.round(points / voxel_size), axis=0) * voxel_size


def init_scene_model(key: jax.Array, points: np.ndarray, cfg: ModelConfig,
                     capacity: int | None = None) -> tuple[SceneModel, float]:
    """Build the padded scene state from an SfM point cloud.

    Returns (model, voxel_size) — voxel_size may have been auto-derived from
    the kNN median when cfg.voxel_size <= 0 (ref :382-394).
    """
    voxel_size = cfg.voxel_size
    if voxel_size <= 0:
        dist2 = mean_knn_sq_dist(points)
        voxel_size = float(np.median(dist2))

    pts = voxelize_points(np.asarray(points, np.float64), voxel_size)
    n = pts.shape[0]
    if capacity is None:
        capacity = cfg.anchor_capacity or int(n * cfg.capacity_headroom)
    capacity = max(capacity, n)
    # keep capacity lane-friendly
    capacity = ((capacity + 127) // 128) * 128

    dist2 = np.maximum(mean_knn_sq_dist(pts), 1e-7)
    scales0 = np.log(np.sqrt(dist2))[:, None].repeat(6, axis=1)

    def pad(x, fill=0.0):
        out = np.full((capacity,) + x.shape[1:], fill, dtype=np.float32)
        out[:n] = x
        return jnp.asarray(out)

    f, k_off = cfg.feat_dim, cfg.n_offsets
    k1, k2 = jax.random.split(key)
    params = Params(
        anchor=pad(pts.astype(np.float32)),
        anchor_feat=jnp.zeros((capacity, f), jnp.float32),
        hyper_latent=jnp.zeros((capacity, cfg.hyper_dim), jnp.float32),
        offsets=jnp.zeros((capacity, k_off, 3), jnp.float32),
        mask_logit=jnp.concatenate([
            jnp.ones((n, k_off), jnp.float32),
            jnp.zeros((capacity - n, k_off), jnp.float32)]),
        scaling_log=pad(scales0),
        rotation=jnp.zeros((capacity, 4), jnp.float32).at[:, 0].set(1.0),
        opacity_raw=jnp.full((capacity, 1), float(np.log(0.1 / 0.9)), jnp.float32),
        mlps=init_decoder_mlps(k1, cfg),
        prior=init_factorized_prior(k2, cfg.hyper_dim),
    )
    alive = jnp.arange(capacity) < n
    buffers = Buffers(
        alive=alive,
        bound_min=jnp.zeros((1, 3), jnp.float32),
        bound_max=jnp.ones((1, 3), jnp.float32),
        opacity_accum=jnp.zeros((capacity,), jnp.float32),
        anchor_denom=jnp.zeros((capacity,), jnp.float32),
        offset_grad_accum=jnp.zeros((capacity, k_off), jnp.float32),
        offset_denom=jnp.zeros((capacity, k_off), jnp.float32),
    )
    # bounds from the initial anchors (ref train.py:109 calls
    # update_anchor_bound right after Scene construction)
    buffers = update_anchor_bound(buffers, params.anchor, alive)
    return SceneModel(params, buffers), voxel_size


def n_alive(model: SceneModel) -> int:
    return int(np.asarray(jnp.sum(model.buffers.alive)))
