"""Multi-chip sharded step: gradient equivalence vs the single-chip step.

With λ_dssim = 0 (pure L1 + scaling reg) the sharded loss is mathematically
identical to the single-chip one (no SSIM band seams), so parameters after one
step must match to float tolerance across an 8-device CPU mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contextgs_tpu.config import (ModelConfig, OptimizationConfig,
                                  PipelineConfig, TrainConfig)
from contextgs_tpu.models import state as st
from contextgs_tpu.parallel.sharded import (make_mesh, make_sharded_train_step,
                                            shard_model)
from contextgs_tpu.train.optim import init_adam
from contextgs_tpu.train.step import make_train_step

from utils_synthetic import make_test_camera

W = H = 32


def _setup(rng):
    cfg = TrainConfig(
        model=ModelConfig(feat_dim=8, n_offsets=4, voxel_size=0.05,
                          capacity_headroom=2.0),
        opt=OptimizationConfig(lambda_dssim=0.0, rate_sample_frac=1.0),
        pipe=PipelineConfig(backend="reference", chunk_size=128))
    pts = rng.uniform(-0.7, 0.7, (300, 3)) + np.array([0, 0, 2.5])
    model, voxel = st.init_scene_model(jax.random.PRNGKey(0), pts, cfg.model)
    p = model.params._replace(
        anchor_feat=jax.random.normal(jax.random.PRNGKey(1),
                                      model.params.anchor_feat.shape) * 0.3,
        offsets=jax.random.normal(jax.random.PRNGKey(2),
                                  model.params.offsets.shape) * 0.1)
    model = st.SceneModel(p, model.buffers)
    cam = make_test_camera(width=W, height=H)
    cd = {k: jnp.asarray(v) for k, v in cam.as_device_dict().items()}
    gt = jnp.asarray(rng.random((3, H, W)).astype(np.float32))
    return cfg, model, voxel, cd, gt


def test_sharded_step_matches_single_chip(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg, model, voxel, cam, gt = _setup(rng)
    bg = jnp.zeros(3)
    adam = init_adam(model.params)
    key = jax.random.PRNGKey(3)
    it = jnp.asarray(50.0)

    # single-chip step ("plain" phase)
    step1 = make_train_step(cfg, W, H, budget=8192, phase="plain",
                            level_scales=(), spatial_lr_scale=1.0,
                            voxel_size=voxel)
    p1, _, _, m1 = step1(model.params, model.buffers, adam, cam, gt, bg, it,
                         jnp.asarray(False), key)

    # sharded step on the 8-device CPU mesh
    mesh = make_mesh(8)
    sp, sb, sa, _ = shard_model(mesh, model.params, model.buffers, adam)
    step8 = make_sharded_train_step(cfg, mesh, W, H, budget=8192,
                                    phase="plain", level_scales=(),
                                    spatial_lr_scale=1.0, voxel_size=voxel,
                                    backend="reference")
    p8, _, m8 = step8(sp, sb, sa, cam, gt, bg, it, key)

    assert np.isclose(float(m1.l1), float(m8["loss"] and m8["l1"]), rtol=1e-5)
    for name in ("anchor_feat", "offsets", "mask_logit", "scaling_log"):
        a = np.asarray(getattr(p1, name))
        b = np.asarray(getattr(p8, name))
        np.testing.assert_allclose(b, a, atol=1e-4,
                                   err_msg=f"params diverge: {name}")
    # replicated network params: Adam's first step is ~lr·sign(g), so weights
    # whose true gradient is at float-noise level can flip sign between the
    # two reductions (|diff| = 2·lr). Require agreement except for that
    # bounded artifact on a small fraction of elements.
    for la, lb in zip(jax.tree.leaves(p1.mlps), jax.tree.leaves(p8.mlps)):
        a, b = np.asarray(la), np.asarray(lb)
        diff = np.abs(a - b)
        # bound: 2×max MLP lr (0.008) covers a full sign flip; with a tiny
        # test scene many MLP weights have noise-level gradients, so a large
        # sign-flip fraction is expected — systematic errors (double psum,
        # missing reduction) would instead move EVERY element and also break
        # the tight anchor-parameter checks above
        assert diff.max() < 2e-2, f"MLP param diff too large: {diff.max()}"
