"""Decoder MLPs as explicit parameter pytrees (no framework modules).

Behavioral spec: /root/reference/scene/gaussian_model.py:143-198 —
- mlp_opacity: Linear(feat+3+1 → feat) ReLU Linear(feat → K) Tanh
- mlp_cov:     Linear(feat+3+1 → feat) ReLU Linear(feat → 7K)
- mlp_color:   Linear(feat+3+1 → feat) ReLU Linear(feat → 3K) Sigmoid
- mlp_feature_bank (optional): Linear(3+1 → feat) ReLU Linear(feat → 3) Softmax
- mlp_grid[i]: Linear(in_i → 2·feat) ReLU Linear(2·feat → (feat+6+3K)·2+3)
  where in_i = hyper+3 for the coarsest level, context_dim+hyper otherwise.

Init matches torch.nn.Linear defaults (U(±1/√fan_in) for weight and bias) so
training dynamics are comparable. Kept fp32 end to end: these MLPs are counted
into the bitstream at 32 bit/param (ref get_mlp_size, gaussian_model.py:193-198)
and the context MLPs must be bit-deterministic between encode and decode.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from contextgs_tpu.config import ModelConfig


class Linear(NamedTuple):
    w: jnp.ndarray   # [in, out]
    b: jnp.ndarray   # [out]


def _init_linear(key, fan_in: int, fan_out: int) -> Linear:
    kw, kb = jax.random.split(key)
    bound = 1.0 / (fan_in ** 0.5)
    return Linear(
        w=jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        b=jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound))


class MLP(NamedTuple):
    l1: Linear
    l2: Linear


def _init_mlp(key, d_in: int, d_hidden: int, d_out: int) -> MLP:
    k1, k2 = jax.random.split(key)
    return MLP(_init_linear(k1, d_in, d_hidden), _init_linear(k2, d_hidden, d_out))


def mlp_apply(p: MLP, x: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.relu(x @ p.l1.w + p.l1.b)
    return h @ p.l2.w + p.l2.b


class DecoderMLPs(NamedTuple):
    opacity: MLP
    cov: MLP
    color: MLP
    grid: tuple          # level_num context MLPs; index level_num-1 = coarsest
    feature_bank: MLP | None = None


def init_decoder_mlps(key: jax.Array, cfg: ModelConfig) -> DecoderMLPs:
    f, k = cfg.feat_dim, cfg.n_offsets
    keys = jax.random.split(key, 5 + cfg.level_num)
    grid_out = (f + 6 + 3 * k) * 2 + 3
    grids = []
    for i in range(cfg.level_num):
        d_in = (cfg.hyper_dim + 3 if i == cfg.level_num - 1
                else cfg.context_dim + cfg.hyper_dim)
        grids.append(_init_mlp(keys[5 + i], d_in, 2 * f, grid_out))
    return DecoderMLPs(
        opacity=_init_mlp(keys[0], f + 3 + 1, f, k),
        cov=_init_mlp(keys[1], f + 3 + 1, f, 7 * k),
        color=_init_mlp(keys[2], f + 3 + 1, f, 3 * k),
        grid=tuple(grids),
        feature_bank=_init_mlp(keys[3], 3 + 1, f, 3) if cfg.use_feat_bank else None,
    )


def apply_opacity(p: DecoderMLPs, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.tanh(mlp_apply(p.opacity, x))


def apply_cov(p: DecoderMLPs, x: jnp.ndarray) -> jnp.ndarray:
    return mlp_apply(p.cov, x)


def apply_color(p: DecoderMLPs, x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid(mlp_apply(p.color, x))


def apply_feature_bank(p: DecoderMLPs, x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softmax(mlp_apply(p.feature_bank, x), axis=1)


def apply_grid(p: DecoderMLPs, level: int, x: jnp.ndarray) -> jnp.ndarray:
    return mlp_apply(p.grid[level], x)


def count_mlp_params(p: DecoderMLPs) -> int:
    return sum(leaf.size for leaf in jax.tree_util.tree_leaves(p))
