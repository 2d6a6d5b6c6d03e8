"""Model snapshots: attribute-named anchor PLY + network checkpoint.

Behavioral spec: /root/reference/scene/gaussian_model.py:561-654 (save_ply /
load_ply_sparse_gaussian) and :912-951 (save/load_mlp_checkpoints). Uses the
same PLY attribute names and the reference's transposed offset/mask layout
(offsets stored as [3,K] flattened), so snapshots are structurally
interchangeable. Only alive anchors are written; loading builds a padded pool.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np

from contextgs_tpu.config import ModelConfig
from contextgs_tpu.models import state as st
from contextgs_tpu.models.state import Buffers, Params, SceneModel
from contextgs_tpu.scene.ply_io import read_ply, write_ply
from contextgs_tpu.utils.checkpoint import load_pytree, save_pytree


def save_model_ply(path: str, params: Params, buffers: Buffers) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    alive = np.asarray(buffers.alive)
    anchor = np.asarray(params.anchor)[alive]
    n, k = anchor.shape[0], params.offsets.shape[1]
    fields: dict[str, np.ndarray] = {}
    for i, c in enumerate("xyz"):
        fields[c] = anchor[:, i].astype(np.float32)
    for i, c in enumerate(("nx", "ny", "nz")):
        fields[c] = np.zeros(n, np.float32)
    offsets = np.asarray(params.offsets)[alive].transpose(0, 2, 1).reshape(n, -1)
    for i in range(offsets.shape[1]):
        fields[f"f_offset_{i}"] = offsets[:, i].astype(np.float32)
    masks = np.asarray(params.mask_logit)[alive].reshape(n, 1, k)
    masks = masks.reshape(n, -1)
    for i in range(masks.shape[1]):
        fields[f"f_mask_{i}"] = masks[:, i].astype(np.float32)
    feat = np.asarray(params.anchor_feat)[alive]
    for i in range(feat.shape[1]):
        fields[f"f_anchor_feat_{i}"] = feat[:, i].astype(np.float32)
    hyper = np.asarray(params.hyper_latent)[alive]
    for i in range(hyper.shape[1]):
        fields[f"f_hyper_latent_{i}"] = hyper[:, i].astype(np.float32)
    fields["opacity"] = np.asarray(params.opacity_raw)[alive][:, 0].astype(np.float32)
    scaling = np.asarray(params.scaling_log)[alive]
    for i in range(scaling.shape[1]):
        fields[f"scale_{i}"] = scaling[:, i].astype(np.float32)
    rot = np.asarray(params.rotation)[alive]
    for i in range(rot.shape[1]):
        fields[f"rot_{i}"] = rot[:, i].astype(np.float32)
    write_ply(path, fields)


def load_model_ply(path: str, cfg: ModelConfig, template: SceneModel
                   ) -> SceneModel:
    """Load a snapshot into a (fresh-capacity) padded model; MLP/prior leaves
    are taken from `template` (load them via load_networks)."""
    v = read_ply(path)
    n = len(v["x"])
    k = cfg.n_offsets
    cap = max(template.buffers.alive.shape[0], ((n + 127) // 128) * 128)

    def grab(prefix, m):
        return np.stack([v[f"{prefix}_{i}"] for i in range(m)], axis=1)

    anchor = np.stack([v["x"], v["y"], v["z"]], axis=1)
    offsets = grab("f_offset", 3 * k).reshape(n, 3, k).transpose(0, 2, 1)
    masks = grab("f_mask", k)
    feat = grab("f_anchor_feat", cfg.feat_dim)
    hyper = grab("f_hyper_latent", cfg.hyper_dim)
    scaling = grab("scale", 6)
    rot = grab("rot", 4)
    opacity = v["opacity"][:, None]

    def pad(x):
        out = np.zeros((cap,) + x.shape[1:], np.float32)
        out[:n] = x
        return out

    import jax.numpy as jnp
    params = template.params._replace(
        anchor=jnp.asarray(pad(anchor)),
        anchor_feat=jnp.asarray(pad(feat)),
        hyper_latent=jnp.asarray(pad(hyper)),
        offsets=jnp.asarray(pad(offsets)),
        mask_logit=jnp.asarray(pad(masks)),
        scaling_log=jnp.asarray(pad(scaling)),
        rotation=jnp.asarray(pad(rot)),
        opacity_raw=jnp.asarray(pad(opacity)))
    alive = jnp.asarray(np.arange(cap) < n)
    buffers = template.buffers._replace(
        alive=alive,
        opacity_accum=jnp.zeros((cap,)),
        anchor_denom=jnp.zeros((cap,)),
        offset_grad_accum=jnp.zeros((cap, k)),
        offset_denom=jnp.zeros((cap, k)))
    return SceneModel(params, buffers)


def save_networks(path: str, params: Params, extra: dict | None = None) -> None:
    """MLPs + factorized prior + metadata (ref save_mlp_checkpoints :912-936)."""
    save_pytree(path, dict(mlps=params.mlps, prior=params.prior))
    if extra is not None:
        with open(path + ".meta", "wb") as f:
            pickle.dump(extra, f)


def load_networks(path: str, like_params: Params):
    nets = load_pytree(path, dict(mlps=like_params.mlps,
                                  prior=like_params.prior))
    extra = None
    if os.path.exists(path + ".meta"):
        with open(path + ".meta", "rb") as f:
            extra = pickle.load(f)
    return nets["mlps"], nets["prior"], extra
