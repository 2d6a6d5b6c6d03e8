"""Codec fidelity end-to-end: rendering from DECODED parameters must match the
eval-mode context render (the reference computes all test metrics from decoded
parameters — any encoder/decoder drift shows up as a PSNR crater, SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from contextgs_tpu.compression.codec import decode_scene, encode_scene
from contextgs_tpu.config import (ModelConfig, OptimizationConfig,
                                  PipelineConfig, TrainConfig)
from contextgs_tpu.evaluation import make_decoded_renderer
from contextgs_tpu.models import state as st
from contextgs_tpu.models.levels import build_level_maps
from contextgs_tpu.models.context import multi_scale_generate
from contextgs_tpu.models.decode import decode_neural_gaussians
from contextgs_tpu.ops import rasterize as rz

from utils_synthetic import make_test_camera

CFG = ModelConfig(feat_dim=8, n_offsets=4, hyper_divisor=4, level_num=3,
                  voxel_size=0.08)
W = H = 32


def test_decoded_render_matches_eval_context(rng, tmp_path):
    pts = rng.uniform(-0.6, 0.6, (200, 3)) + np.array([0, 0, 2.5])
    model, voxel = st.init_scene_model(jax.random.PRNGKey(0), pts, CFG)
    p = model.params
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    p = p._replace(
        anchor_feat=jax.random.normal(k1, p.anchor_feat.shape),
        hyper_latent=jax.random.normal(k2, p.hyper_latent.shape),
        offsets=jax.random.normal(k3, p.offsets.shape) * 0.2)
    b = model.buffers
    scales = [4.0, 16.0]

    # --- eval-mode render (pre-codec): STE-quantized context path ---
    cam = make_test_camera(width=W, height=H)
    cd = {k: jnp.asarray(v) for k, v in cam.as_device_dict().items()}

    @jax.jit
    def eval_render(p, b):
        anchor_q = st.get_anchor(p, b)
        maps = build_level_maps(anchor_q, b.alive, voxel, tuple(scales), 3)
        ctx = multi_scale_generate(p, b, CFG, maps, anchor_q,
                                   jax.random.PRNGKey(0), training=False)
        vis = rz.visible_filter(anchor_q, st.get_scaling(p)[:, :3],
                                cd["world_view"], cd["full_proj"],
                                cd["tanfovx"], cd["tanfovy"], W, H,
                                valid=b.alive)
        ng = decode_neural_gaussians(p, b, CFG, cd["camera_center"], vis,
                                     feat=ctx.feat_q, grid_scaling=ctx.scaling_q,
                                     grid_offsets=ctx.offsets_q, anchor=anchor_q)
        out = rz.rasterize(ng.xyz, ng.scaling, ng.rot, ng.color, ng.opacity,
                           world_view=cd["world_view"], full_proj=cd["full_proj"],
                           tanfovx=cd["tanfovx"], tanfovy=cd["tanfovy"],
                           width=W, height=H, bg=jnp.zeros(3), budget=4096,
                           chunk_size=128, backend="reference",
                           valid=ng.gauss_valid)
        return out.image

    img_eval = np.asarray(eval_render(p, b))

    # --- encode → decode → decoded-version render ---
    out_dir = str(tmp_path / "bs")
    encode_scene(p, b, CFG, scales, voxel, out_dir)
    dec = decode_scene(out_dir, CFG)
    cfg_full = TrainConfig(model=CFG, opt=OptimizationConfig(),
                           pipe=PipelineConfig(backend="reference",
                                               chunk_size=128))
    renderer = make_decoded_renderer(dec, cfg_full, W, H, budget=4096)
    img_dec = np.asarray(renderer(cd, jnp.zeros(3)))

    assert np.abs(img_eval).sum() > 0.1, "eval render is empty"
    # decoded parameters equal the STE-quantized ones up to window clamping
    # and device-vs-host rounding of exact .5 ties → images nearly identical
    diff = np.abs(img_dec - img_eval)
    assert diff.max() < 5e-2, f"decoded render drifted: max diff {diff.max()}"
    assert diff.mean() < 2e-3


def test_decoded_render_recovers_from_budget_overflow(rng, tmp_path, caplog):
    """VERDICT r2 weak #6: a too-small eval instance budget must not silently
    truncate the deepest splats of the reported renders — the decoded renderer
    doubles the budget and re-renders, like the train loop does."""
    import logging

    pts = rng.uniform(-0.6, 0.6, (120, 3)) + np.array([0, 0, 2.5])
    model, voxel = st.init_scene_model(jax.random.PRNGKey(0), pts, CFG)
    p = model.params
    p = p._replace(offsets=jax.random.normal(
        jax.random.PRNGKey(3), p.offsets.shape) * 0.2)
    b = model.buffers
    scales = [4.0, 16.0]

    out_dir = str(tmp_path / "bs")
    encode_scene(p, b, CFG, scales, voxel, out_dir)
    dec = decode_scene(out_dir, CFG)
    cfg_full = TrainConfig(model=CFG, opt=OptimizationConfig(),
                           pipe=PipelineConfig(backend="reference",
                                               chunk_size=128))
    cam = make_test_camera(width=W, height=H)
    cd = {k: jnp.asarray(v) for k, v in cam.as_device_dict().items()}

    ok = make_decoded_renderer(dec, cfg_full, W, H, budget=4096)
    img_ref = np.asarray(ok(cd, jnp.zeros(3)))

    tiny = make_decoded_renderer(dec, cfg_full, W, H, budget=16)
    with caplog.at_level(logging.WARNING, logger="contextgs"):
        img_tiny = np.asarray(tiny(cd, jnp.zeros(3)))
    assert any("overflow" in r.message for r in caplog.records), \
        "overflow was not logged"
    np.testing.assert_allclose(img_tiny, img_ref, atol=1e-5)


def test_decoded_render_anchor_compaction_exact(rng, tmp_path, caplog):
    """anchor_cap compacts the visible anchors into a bounded working set
    before decode+rasterize; with enough capacity the image must be exact,
    and an undersized cap must recover via the doubling reaction."""
    import logging

    pts = rng.uniform(-0.6, 0.6, (200, 3)) + np.array([0, 0, 2.5])
    model, voxel = st.init_scene_model(jax.random.PRNGKey(0), pts, CFG)
    p = model.params
    p = p._replace(offsets=jax.random.normal(
        jax.random.PRNGKey(3), p.offsets.shape) * 0.2)
    b = model.buffers
    scales = [4.0, 16.0]

    out_dir = str(tmp_path / "bs")
    encode_scene(p, b, CFG, scales, voxel, out_dir)
    dec = decode_scene(out_dir, CFG)
    cfg_full = TrainConfig(model=CFG, opt=OptimizationConfig(),
                           pipe=PipelineConfig(backend="reference",
                                               chunk_size=128))
    cam = make_test_camera(width=W, height=H)
    cd = {k: jnp.asarray(v) for k, v in cam.as_device_dict().items()}

    plain = make_decoded_renderer(dec, cfg_full, W, H, budget=4096)
    img_ref = np.asarray(plain(cd, jnp.zeros(3)))
    n_anchors = dec.anchor.shape[0]

    # cap ≥ visible set: exact
    capped = make_decoded_renderer(dec, cfg_full, W, H, budget=4096,
                                   anchor_cap=max(n_anchors, 8))
    img_cap = np.asarray(capped(cd, jnp.zeros(3)))
    np.testing.assert_allclose(img_cap, img_ref, atol=1e-5)

    # undersized cap: overflow is logged, reaction doubles until exact
    tiny = make_decoded_renderer(dec, cfg_full, W, H, budget=4096,
                                 anchor_cap=8)
    with caplog.at_level(logging.WARNING, logger="contextgs"):
        img_tiny = np.asarray(tiny(cd, jnp.zeros(3)))
    assert any("anchor-cap overflow" in r.message for r in caplog.records), \
        "anchor-cap overflow was not logged"
    np.testing.assert_allclose(img_tiny, img_ref, atol=1e-5)
