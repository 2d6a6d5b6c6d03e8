"""Model snapshot (PLY + networks) round trip."""

import jax
import numpy as np

from contextgs_tpu.config import ModelConfig
from contextgs_tpu.models import state as st
from contextgs_tpu.scene.snapshot import (load_model_ply, load_networks,
                                          save_model_ply, save_networks)

CFG = ModelConfig(feat_dim=8, n_offsets=4, voxel_size=0.05)


def test_snapshot_roundtrip(rng, tmp_path):
    pts = rng.uniform(-1, 1, (120, 3))
    model, _ = st.init_scene_model(jax.random.PRNGKey(0), pts, CFG)
    p = model.params._replace(
        anchor_feat=jax.random.normal(jax.random.PRNGKey(1),
                                      model.params.anchor_feat.shape),
        offsets=jax.random.normal(jax.random.PRNGKey(2),
                                  model.params.offsets.shape))
    model = st.SceneModel(p, model.buffers)

    ply = str(tmp_path / "pc.ply")
    nets = str(tmp_path / "nets.pkl")
    save_model_ply(ply, model.params, model.buffers)
    save_networks(nets, model.params, extra=dict(voxel_size=0.05))

    loaded = load_model_ply(ply, CFG, model)
    mlps, prior, extra = load_networks(nets, model.params)
    assert extra["voxel_size"] == 0.05

    alive = np.asarray(model.buffers.alive)
    for field in ("anchor", "anchor_feat", "hyper_latent", "offsets",
                  "mask_logit", "scaling_log", "rotation"):
        a = np.asarray(getattr(model.params, field))[alive]
        b = np.asarray(getattr(loaded.params, field))[
            np.asarray(loaded.buffers.alive)]
        np.testing.assert_array_equal(a, b, err_msg=field)
    # networks round trip exactly
    for la, lb in zip(jax.tree.leaves(model.params.mlps), jax.tree.leaves(mlps)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
