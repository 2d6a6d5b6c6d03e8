"""Densification unit tests: stats accumulation, growing, pruning."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from contextgs_tpu.config import ModelConfig, OptimizationConfig
from contextgs_tpu.models import densify, state as st
from contextgs_tpu.train.optim import init_adam

CFG = ModelConfig(feat_dim=8, n_offsets=4, voxel_size=0.1,
                  update_init_factor=4, capacity_headroom=6.0)
OPT = OptimizationConfig(update_interval=100, success_threshold=0.8,
                         densify_grad_threshold=0.0002, min_opacity=0.005)


def _model(rng, n=40):
    pts = rng.uniform(-1, 1, (n, 3))
    model, voxel = st.init_scene_model(jax.random.PRNGKey(0), pts, CFG)
    return model, voxel


def test_accumulate_stats(rng):
    model, _ = _model(rng)
    b = model.buffers
    n, k = b.offset_grad_accum.shape
    nk = n * k
    neural_op = jnp.full((nk,), 0.5)
    gvalid = jnp.ones((nk,), bool)
    radii = jnp.ones((nk,), bool)
    anchor_vis = b.alive
    sgrad = jnp.full((nk, 2), 3e-4)
    b2 = densify.accumulate_stats(b, neural_op, gvalid, radii, anchor_vis,
                                  sgrad, k)
    alive = np.asarray(b.alive)
    np.testing.assert_allclose(np.asarray(b2.opacity_accum)[alive], 0.5 * k)
    np.testing.assert_allclose(np.asarray(b2.anchor_denom)[alive], 1.0)
    np.testing.assert_allclose(np.asarray(b2.offset_grad_accum)[alive],
                               np.hypot(3e-4, 3e-4), rtol=1e-6)
    # invisible anchors untouched
    assert (np.asarray(b2.anchor_denom)[~alive] == 0).all()


def test_growing_creates_new_anchors(rng):
    model, voxel = _model(rng)
    p, b = model.params, model.buffers
    n, k = b.offset_grad_accum.shape
    # strong gradients + enough observations on all offsets of alive anchors
    # → growth candidates; offsets displaced so candidates leave occupied voxels
    p = p._replace(offsets=jnp.full((n, k, 3), 5.0))
    ones_nk = jnp.ones((n, k))
    b = b._replace(
        offset_grad_accum=jnp.where(b.alive[:, None], ones_nk, 0.0),
        offset_denom=jnp.where(b.alive[:, None], 100.0 * ones_nk, 0.0),
        opacity_accum=jnp.where(b.alive, 100.0, 0.0),
        anchor_denom=jnp.where(b.alive, 100.0, 0.0))
    n_before = st.n_alive(st.SceneModel(p, b))
    res = jax.jit(lambda p, b, a, key: densify.adjust_anchors(
        p, b, a, CFG, OPT, voxel, key))(p, b, init_adam(p),
                                        jax.random.PRNGKey(1))
    assert int(res.n_grown) > 0
    assert not bool(res.overflowed)
    assert st.n_alive(st.SceneModel(res.params, res.buffers)) > n_before - int(res.n_pruned)
    # new anchors have fresh stats and identity rotation
    newly = np.asarray(res.buffers.alive) & ~np.asarray(b.alive)
    assert newly.sum() == int(res.n_grown)
    np.testing.assert_allclose(np.asarray(res.buffers.opacity_accum)[newly], 0.0)
    np.testing.assert_allclose(np.asarray(res.params.rotation)[newly, 0], 1.0)
    # survivors' gaussian log-scales clamped at 0.05 (ref :729-733)
    assert float(res.params.scaling_log[:, 3:].max()) <= 0.05 + 1e-6


def test_pruning_removes_low_opacity(rng):
    model, voxel = _model(rng)
    p, b = model.params, model.buffers
    alive = np.asarray(b.alive)
    idx = np.where(alive)[0]
    kill = idx[: len(idx) // 2]
    opacity_accum = np.zeros(alive.shape[0], np.float32)
    opacity_accum[idx] = 10.0
    opacity_accum[kill] = 0.0            # below min_opacity * denom
    b = b._replace(
        opacity_accum=jnp.asarray(opacity_accum),
        anchor_denom=jnp.where(b.alive, 100.0, 0.0))
    res = jax.jit(lambda p, b, a, key: densify.adjust_anchors(
        p, b, a, CFG, OPT, voxel, key))(p, b, init_adam(p),
                                        jax.random.PRNGKey(1))
    assert int(res.n_pruned) == len(kill)
    assert not np.asarray(res.buffers.alive)[kill].any()
    assert np.asarray(res.buffers.alive)[idx[len(idx) // 2:]].all()
