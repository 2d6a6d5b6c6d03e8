"""Codec round-trip: encode∘decode must bit-exactly reproduce the encoder's
quantized states through the autoregressive context chain (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from contextgs_tpu.compression.codec import decode_scene, encode_scene
from contextgs_tpu.config import ModelConfig
from contextgs_tpu.models import state as st

CFG = ModelConfig(feat_dim=8, n_offsets=4, hyper_divisor=4, level_num=3,
                  voxel_size=0.05)


def _trainedish_model(rng, n_pts=300):
    """A model with non-trivial content (as if partially trained)."""
    pts = rng.uniform(-1, 1, (n_pts, 3))
    model, voxel = st.init_scene_model(jax.random.PRNGKey(0), pts, CFG)
    p = model.params
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(5), 4)
    n = p.anchor.shape[0]
    p = p._replace(
        anchor_feat=jax.random.normal(k1, p.anchor_feat.shape) * 2.0,
        hyper_latent=jax.random.normal(k2, p.hyper_latent.shape) * 2.0,
        offsets=jax.random.normal(k3, p.offsets.shape) * 0.3,
        # a few masks off
        mask_logit=jnp.where(jax.random.uniform(k4, p.mask_logit.shape) < 0.15,
                             -8.0, 1.0),
    )
    return st.SceneModel(p, model.buffers), voxel


def test_codec_roundtrip_bit_exact(rng, tmp_path):
    model, voxel = _trainedish_model(rng)
    p, b = model.params, model.buffers
    scales = [4.0, 16.0]
    out = str(tmp_path / "bitstreams")
    bits, enc_states = encode_scene(p, b, CFG, scales, voxel, out,
                                    return_states=True)
    dec = decode_scene(out, CFG)

    # every stream fully consumed is asserted inside decode_scene
    np.testing.assert_array_equal(dec.anchor, enc_states["anchor"])
    np.testing.assert_array_equal(dec.masks, enc_states["masks"])
    np.testing.assert_array_equal(dec.hyper, enc_states["hyper"])
    # the autoregressive chain: decoded values must be BIT-identical to the
    # encoder's dequantized states, else the context diverges
    np.testing.assert_array_equal(dec.feat, enc_states["feat"])
    np.testing.assert_array_equal(dec.scaling, enc_states["scaling"])
    np.testing.assert_array_equal(dec.offsets, enc_states["offsets"])

    # masked-out offsets decode to zero (ref gaussian_model.py:1471-1475)
    off = dec.offsets.reshape(-1, 3)
    dead = (dec.masks.reshape(-1) == 0)
    assert np.all(off[dead] == 0)

    # sizes: breakdown sums and is non-trivial
    assert bits["total"] > bits["mlp"]
    for k in ("anchor", "hyper", "masks", "feat", "scaling", "offsets"):
        assert bits[k] >= 0
    # quantized values close to originals (distortion bounded by Q/2)
    alive = np.asarray(st.get_mask_anchor(p, b.alive))
    orig_feat = np.asarray(p.anchor_feat)[alive]
    assert np.abs(dec.feat - orig_feat).max() < 1.01  # Q_feat ≈ <2, err ≤ Q/2


def test_codec_compresses(rng, tmp_path):
    model, voxel = _trainedish_model(rng)
    p, b = model.params, model.buffers
    out = str(tmp_path / "bs")
    bits = encode_scene(p, b, CFG, [4.0, 16.0], voxel, out)
    n_alive = int(np.asarray(st.get_mask_anchor(p, b.alive)).sum())
    raw_bits = n_alive * (CFG.feat_dim + 6 + 3 * CFG.n_offsets) * 32
    coded = bits["feat"] + bits["scaling"] + bits["offsets"]
    assert coded < raw_bits, "entropy coding should beat raw fp32"


def test_codec_deterministic(rng, tmp_path):
    model, voxel = _trainedish_model(rng, n_pts=150)
    p, b = model.params, model.buffers
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    encode_scene(p, b, CFG, [4.0, 16.0], voxel, d1)
    encode_scene(p, b, CFG, [4.0, 16.0], voxel, d2)
    for f in ("anchor.npy", "hyper.b", "masks.b", "feat0.b", "feat1.b",
              "feat2.b", "scaling0.b", "offsets0.b"):
        with open(f"{d1}/{f}", "rb") as fa, open(f"{d2}/{f}", "rb") as fb:
            assert fa.read() == fb.read(), f"{f} differs between runs"


def test_stream_escape_outliers():
    """Residuals past MAX_WINDOW must round-trip exactly via the escape side
    stream — no silent saturation (VERDICT r1 weak #8)."""
    from contextgs_tpu.compression.codec import (_code_stream, _decode_stream,
                                                 MAX_WINDOW)
    r = np.random.default_rng(3)
    n = 500
    q = np.full(n, 0.01, np.float32)
    mean = (r.normal(0, 1, n) * 0.01).astype(np.float32)
    scale = np.full(n, 0.02, np.float32)
    x = mean + r.normal(0, 0.02, n).astype(np.float32)
    x[::50] = 100.0      # residual ≈ 10_000 steps ≫ MAX_WINDOW
    x[25::50] = -80.0
    data, w, side, deq = _code_stream(x, mean, scale, q)
    # r5: the window is cost-modeled (escapes are cheaper than taxing every
    # symbol with a huge window's CDF floor) — outliers go to the escape
    # stream regardless of w
    assert MAX_WINDOW >= w >= 64 and len(side) > 0
    out = _decode_stream(data, side, mean, scale, q, w)
    np.testing.assert_array_equal(out, deq)
    # decoded equals the exact quantization of x: outliers NOT saturated
    expected = (np.round(x.astype(np.float64) / q) * q).astype(np.float32)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_codec_roundtrip_with_feat_outliers(rng, tmp_path):
    """End-to-end: extreme anchor_feat values survive encode∘decode exactly."""
    model, voxel = _trainedish_model(rng, n_pts=200)
    p, b = model.params, model.buffers
    feat = np.asarray(p.anchor_feat).copy()
    feat[5, 0] = 4000.0
    feat[7, 2] = -3500.0
    p = p._replace(anchor_feat=jnp.asarray(feat))
    out = str(tmp_path / "bs_out")
    _, enc_states = encode_scene(p, b, CFG, [4.0, 16.0], voxel, out,
                                 return_states=True)
    dec = decode_scene(out, CFG)
    np.testing.assert_array_equal(dec.feat, enc_states["feat"])
    alive = np.asarray(st.get_mask_anchor(p, b.alive))
    kept = feat[alive]
    # the outlier rows decode to their true (unsaturated) quantized values
    assert np.abs(dec.feat - kept).max() < 1.01


def test_actual_bits_track_model_estimate(rng, tmp_path):
    """Coded payload must track the model's own rate estimate (VERDICT r4
    weak #3 / r5 fix): the estimate and the encoder now build the SAME
    kept-set level maps, so the symbols the coder sees are the symbols the
    estimate priced. Actual may run slightly above (coder slack, CDF floor,
    chunk metadata) but a structural context mismatch shows up as tens of
    percent — pin the contract at +5%."""
    from contextgs_tpu.models.context import estimate_total_bits
    from contextgs_tpu.models.levels import build_level_maps

    model, voxel = _trainedish_model(rng, n_pts=400)
    p, b = model.params, model.buffers
    scales = [4.0, 16.0]
    out = str(tmp_path / "bs_contract")
    bits = encode_scene(p, b, CFG, scales, voxel, out)

    anchor_q = st.get_anchor(p, b)
    kept = st.get_mask_anchor(p, b.alive)
    maps = build_level_maps(anchor_q, kept, voxel, tuple(scales),
                            CFG.level_num)
    est = estimate_total_bits(p, b, CFG, maps, anchor_q,
                              jax.random.PRNGKey(9))
    for stream in ("feat", "scaling", "offsets", "hyper", "masks"):
        actual = float(bits[stream])
        estimate = float(est[stream])
        assert actual <= estimate * 1.05 + 2048, (
            stream, actual, estimate)
