"""Bitstream encoder/decoder: trained scene → compressed files → scene.

Behavioral spec: /root/reference/scene/gaussian_model.py:1007-1539
(conduct_encoding / conduct_decoding) and :980-1004 (estimate_final_bits).
Produces the same artifact set: anchor.npy (raw uint16 codes), hyper.b
(factorized-prior streams), masks.b (Bernoulli), feat{L}.b / scaling{L}.b /
offsets{L}.b per level (conditional-gaussian streams, 1000-anchor chunks with
per-chunk symbol min/max in metadata), meta.pkl and mlp.pkl.

Determinism contract: the per-level μ/σ/Q come from ONE jitted predictor
(models/context.make_level_predictor) fed identically-shaped arrays on both
sides, dequantized values are computed in host float32 the same way on both
sides, and CDF tables are built in host float64 — encode∘decode is exactly
lossless and the autoregressive context chain is bit-identical.

Differences from the reference worth noting: levels/anchors are coded in slot
order (the reference follows torch.unique's voxel-key order — same content,
same size); hyper is coded as per-channel shared-CDF streams over a
data-derived symbol range (compressai uses learned tail quantiles — same
losslessness, near-identical rate).
"""

from __future__ import annotations

import functools
import os
import pickle
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import ndtr

from contextgs_tpu.config import ModelConfig
from contextgs_tpu.compression import coder
from contextgs_tpu.models import state as st
from contextgs_tpu.models.context import make_level_predictor
from contextgs_tpu.models.entropy import factorized_pmf_table
from contextgs_tpu.models.levels import build_level_maps
from contextgs_tpu.models.mlps import count_mlp_params
from contextgs_tpu.models.quant import ANCHOR_ROUND_DIGITS, CLAMP_STEPS, Q_ANCHOR
from contextgs_tpu.utils.checkpoint import load_pytree, save_pytree

CHUNK = 1000          # anchors per entropy-coding chunk (ref MAX_batch_size)
# Jitted codec stages (level maps, context predictor) run on anchor arrays
# padded to the next power of two (min 1024): anchor counts differ per scene
# and per checkpoint, and every fresh shape would otherwise recompile —
# tens of seconds per compile through this environment's remote compiler
# dominates small-scene encode/decode wall time. Pad rows are masked out of
# every level (alive=False) and never selected for coding; encoder and
# decoder use the same bucket, preserving the bit-exactness contract.

def _bucket(n: int) -> int:
    b = 1024
    while b < n:
        b *= 2
    return b
# Per-element CDF windows. The reference builds [N, range] tables over the raw
# chunk min/max (encodings.py:91-97), which explodes to GBs when a stream has
# outliers (SURVEY.md §7 hard-part 4). Here each element gets a window of W
# symbols centred at round(μ/Q) — its own predicted mean — with W chosen per
# stream-chunk as the smallest power of two covering the residuals |s−μ/Q|
# (min 64, capped at MAX_WINDOW and recorded in the metadata). The window base
# is recomputed identically by the decoder from the same μ. Residuals past the
# capped window are NOT saturated (the reference never saturates — its tables
# span the true min/max, encodings.py:91-97): a window-EDGE symbol acts as an
# escape code whose true residual follows in a raw int32 side stream (length
# recorded per chunk). Edge bins carry the full gaussian tail mass, so escapes
# are cheap to signal and exact to reconstruct.
MIN_WINDOW = 64
MAX_WINDOW = 2048
MAX_SYMBOL_RANGE = 1 << 16   # guard for the per-channel hyper tables (shared
                             # tables grow with the data range; beyond ±32768
                             # steps the latent has diverged, not drifted)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _jit_level_maps(anchor_q, alive, voxel_size, level_scales, level_num):
    return build_level_maps(anchor_q, alive, voxel_size, level_scales,
                            level_num)


class DecodedScene(NamedTuple):
    """Compacted decoded arrays (the reference's decoded_version state)."""

    anchor: np.ndarray     # [N,3] dequantized
    feat: np.ndarray       # [N,F]
    scaling: np.ndarray    # [N,6] linear (NOT log)
    offsets: np.ndarray    # [N,K,3]
    masks: np.ndarray      # [N,K] {0,1}
    hyper: np.ndarray      # [N,Fh]
    mlps: object           # DecoderMLPs
    prior: object
    level_scales: list
    voxel_size: float


def _dequantize_anchor_np(codes: np.ndarray, bmin: np.ndarray,
                          bmax: np.ndarray) -> np.ndarray:
    interval = ((bmax - bmin) * Q_ANCHOR + 1e-6).astype(np.float32)
    return (codes.astype(np.float32) * interval + bmin.astype(np.float32))


def _choose_window(abs_res: np.ndarray) -> int:
    """Pick the chunk's window width by total-cost model, not max residual.

    Growing the window to cover every residual (the round-4 policy) is doubly
    expensive: the uint16 CDF's >=1-unit bin floor taxes EVERY symbol by
    ~(w-1)/65536 of its probability mass (-n·log2(1-(w-1)/2^16) bits), and
    CDF-row construction costs n·(w+1) ndtr evaluations — at w=2048 the
    table build dominated encode wall time (158 s at 77k anchors, r4).
    Escapes instead cost ~16 payload bits + the edge-bin surprise (edge bins
    absorb the full gaussian tail, so signalling is cheap). Minimizing the
    modeled total picks small windows with a few escapes over huge windows
    with none; the decoder reads w from the chunk metadata either way."""
    n = abs_res.size
    best_w, best_cost = MAX_WINDOW, None
    w = MIN_WINDOW
    while True:
        esc = int((abs_res > (w // 2 - 2)).sum())
        cost = (n * -np.log2(1.0 - (w - 1) / 65536.0)
                + esc * (16.0 + 10.0))   # payload + nominal edge surprise
        if best_cost is None or cost < best_cost:
            best_w, best_cost = w, cost
        if w >= MAX_WINDOW or esc == 0:
            break
        w *= 2
    return best_w


def _window_base(mean: np.ndarray, q: np.ndarray, w: int) -> np.ndarray:
    """Per-element window base symbol = round(μ/Q) − W/2, recomputed
    identically by encoder and decoder (host float64)."""
    return (np.round(mean.astype(np.float64) / q.astype(np.float64))
            .astype(np.int64) - w // 2)


def _windowed_cdf_rows(mean: np.ndarray, scale: np.ndarray, q: np.ndarray,
                       base: np.ndarray, w: int) -> np.ndarray:
    """Float64 CDF rows over each element's own symbol window [base, base+W).

    The first/last bins absorb the full gaussian tail mass (CDF pinned to 0/1
    at the window boundaries): edge symbols double as escape codes, so they
    must stay cheap even when the model puts ~no mass at the window edge."""
    offs = (np.arange(w + 1, dtype=np.float64) - 0.5)[None, :]
    edges = (base[:, None] + offs) * q[:, None].astype(np.float64)
    z = (edges - mean[:, None]) / np.maximum(scale, 1e-9)[:, None]
    # For wide windows, evaluate ndtr only inside ±6σ: beyond it ndtr is 0/1
    # to <1e-9, far below the uint16 quantization grid, and saturated entries
    # dominate wide windows (the encode/decode wall-time sink — 15.8 s of a
    # 24 s encode at 77k anchors was CDF builds). For narrow windows most
    # entries are live and the boolean-gather overhead would exceed the
    # savings, so evaluate directly. Encoder and decoder share this function,
    # so the round trip stays bit-exact by construction either way.
    if w > 128:
        c = np.where(z > 0, 1.0, 0.0)
        m = np.abs(z) < 6.0
        c[m] = ndtr(z[m])
    else:
        c = ndtr(z)
    c[:, 0] = 0.0
    c[:, -1] = 1.0
    return np.clip(c, 0.0, 1.0)


def _code_stream(x, mean, scale, q, stats=None):
    """Encode one flat stream → (bytes, window, escape bytes, dequantized).

    Symbols are STE-clamped (ref encodings.py:203-216); the chunk's window
    width adapts to the residual spread up to MAX_WINDOW. Residuals that still
    fall outside code the nearest window EDGE as an escape and append their
    true relative symbol to a raw int32 side stream — encode∘decode is exactly
    lossless with no saturation (matching the reference, whose tables always
    span the true min/max).

    When `stats` (a dict) is passed, accumulates the per-chunk bit-cost
    decomposition used to audit actual-vs-estimate (VERDICT r4 weak #3):
    ideal gaussian cross-entropy of the coded symbols, float-windowed-CDF
    cost, quantized-uint16-CDF cost, payload bytes, escape count/bytes."""
    if x.size == 0:
        return b"", MIN_WINDOW, b"", x.astype(np.float32)
    x = np.clip(x, -CLAMP_STEPS * q, CLAMP_STEPS * q)
    s = np.round(x.astype(np.float64) / q).astype(np.int64)
    mu_sym = np.round(mean.astype(np.float64) / q.astype(np.float64)).astype(np.int64)
    w = _choose_window(np.abs(s - mu_sym))
    base = _window_base(mean, q, w)
    rel = s - base                                       # true relative symbol
    win = np.clip(rel, 0, w - 1).astype(np.int32)
    # edge symbols always carry an escape payload (even when the true value
    # happens to BE the edge) so the decoder needs no extra signalling
    esc = (win == 0) | (win == w - 1)
    esc_rel = rel[esc]
    # escapes fit int16 in practice (symbols are clamped to ±15000 steps and
    # the window base tracks the predicted mean); pay int32 only when the
    # model mean has diverged that far. Encoded as |w| sign in the metadata:
    # w > 0 → int16 payload, w < 0 → int32 (backward compatible: old streams
    # always stored positive w with int32 payloads via the 3-tuple format).
    use16 = (esc_rel.size == 0
             or (esc_rel.min() >= -32768 and esc_rel.max() < 32768))
    side = esc_rel.astype(np.int16 if use16 else np.int32).tobytes()
    deq = ((base + rel).astype(np.float32) * q.astype(np.float32))
    t0 = time.perf_counter()
    fcdf = _windowed_cdf_rows(mean, scale, q, base, w)
    rows = coder.quantize_cdf(fcdf)
    t1 = time.perf_counter()
    data = coder.encode(rows, win)
    t2 = time.perf_counter()
    if stats is not None:
        stats["cdf_s"] = stats.get("cdf_s", 0.0) + (t1 - t0)
        stats["coder_s"] = stats.get("coder_s", 0.0) + (t2 - t1)
        ar = np.arange(x.size)
        qd = q.astype(np.float64)
        zlo = ((s.astype(np.float64) - 0.5) * qd
               - mean.astype(np.float64)) / np.maximum(scale, 1e-9)
        zhi = zlo + qd / np.maximum(scale, 1e-9)
        p_ideal = np.maximum(ndtr(zhi) - ndtr(zlo), 1e-12)
        p_win = np.maximum(fcdf[ar, win + 1] - fcdf[ar, win], 1e-12)
        wq = np.diff(rows.astype(np.int64) & 0xFFFF, axis=-1)
        wq[:, -1] += 1 << 16     # top value stored mod 2^16
        p_q = wq[ar, win] / 65536.0
        stats["n_sym"] = stats.get("n_sym", 0) + x.size
        stats["ideal_bits"] = (stats.get("ideal_bits", 0.0)
                               - float(np.log2(p_ideal).sum()))
        stats["win_bits"] = (stats.get("win_bits", 0.0)
                             - float(np.log2(p_win).sum()))
        stats["qcdf_bits"] = (stats.get("qcdf_bits", 0.0)
                              - float(np.log2(p_q).sum()))
        stats["payload_bits"] = stats.get("payload_bits", 0) + len(data) * 8
        stats["escape_bits"] = stats.get("escape_bits", 0) + len(side) * 8
        stats["n_escape"] = stats.get("n_escape", 0) + int(esc.sum())
        stats.setdefault("windows", []).append(w)
    return data, w, side, deq


def _decode_stream(data, side, mean, scale, q, w: int):
    n = mean.shape[0]
    if n == 0:
        return np.zeros(0, np.float32)
    base = _window_base(mean, q, w)
    rows = coder.quantize_cdf(_windowed_cdf_rows(mean, scale, q, base, w))
    win = coder.decode(rows, data).astype(np.int64)
    rel = win
    esc = (win == 0) | (win == w - 1)
    n_esc = int(esc.sum())
    if n_esc:
        # payload width is deducible: bytes / escape count (int16 for new
        # streams, int32 for pre-r5 streams — no format flag needed)
        itemsize = len(side) // n_esc
        assert itemsize in (2, 4) and len(side) == n_esc * itemsize, \
            f"escape side stream mismatch: {len(side)}B for {n_esc} escapes"
        vals = np.frombuffer(side, dtype=f"<i{itemsize}").astype(np.int64)
        rel[esc] = vals
    else:
        assert len(side) == 0, "unexpected escape bytes"
    return (base + rel).astype(np.float32) * q.astype(np.float32)


def _ep_host(ep, idx):
    """EntropyParams → host numpy, gathered at idx, Q broadcast per column."""
    def g(a):
        return np.asarray(a)[idx]
    return dict(
        mean_feat=g(ep.mean_feat), scale_feat=g(ep.scale_feat),
        q_feat=g(ep.q_feat), mean_scaling=g(ep.mean_scaling),
        scale_scaling=g(ep.scale_scaling), q_scaling=g(ep.q_scaling),
        mean_offsets=g(ep.mean_offsets), scale_offsets=g(ep.scale_offsets),
        q_offsets=g(ep.q_offsets))


def encode_scene(params: st.Params, buffers: st.Buffers, cfg: ModelConfig,
                 level_scales: list, voxel_size: float, out_dir: str,
                 disable_hyper: bool = False, return_states: bool = False,
                 stream_stats: dict | None = None):
    """conduct_encoding equivalent. Returns a size breakdown in bits
    (plus the encoder-side dequantized states when return_states, for the
    round-trip bit-exactness tests)."""
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()

    keep = np.asarray(st.get_mask_anchor(params, buffers.alive))
    idx_keep = np.where(keep)[0]
    n = len(idx_keep)

    bmin = np.asarray(buffers.bound_min)
    bmax = np.asarray(buffers.bound_max)

    if len(level_scales) < cfg.level_num - 1:
        # lazily search scales if training never reached the context phase
        # (ref computes level_scale on first use inside conduct_encoding,
        # gaussian_model.py:1042)
        from contextgs_tpu.models.levels import find_divide_scale
        level_scales = find_divide_scale(
            np.asarray(params.anchor)[idx_keep], voxel_size, bmin, bmax,
            cfg.target_ratio, cfg.level_num)

    # --- anchors: 16-bit codes, stored raw (ref :1097-1101) ---
    anchors_raw = np.asarray(params.anchor)[idx_keep]
    interval = (bmax - bmin) * Q_ANCHOR + 1e-6
    codes = np.clip(np.floor((anchors_raw - bmin) / interval), 0,
                    2 ** ANCHOR_ROUND_DIGITS - 1).astype(np.uint16)
    np.save(os.path.join(out_dir, "anchor.npy"), codes)
    anchor_q_np = _dequantize_anchor_np(codes, bmin, bmax)

    # --- hyper latent: factorized prior, per-channel streams (ref :1082-1109) ---
    hyper = np.asarray(params.hyper_latent)[idx_keep]
    hyper_sym = np.clip(np.round(hyper), -(MAX_SYMBOL_RANGE // 2),
                        MAX_SYMBOL_RANGE // 2).astype(np.int32)
    if disable_hyper:
        hyper_sym = np.zeros_like(hyper_sym)
    h_lo = int(hyper_sym.min()) - 1 if n else 0
    h_hi = int(hyper_sym.max()) + 1 if n else 0
    pmf = np.asarray(factorized_pmf_table(params.prior, h_lo, h_hi),
                     np.float64)                    # [C,S]
    cdf = np.concatenate([np.zeros((pmf.shape[0], 1)), np.cumsum(pmf, axis=1)],
                         axis=1)
    cdf /= np.maximum(cdf[:, -1:], 1e-12)
    hyper_rows = coder.quantize_cdf(np.clip(cdf, 0, 1))
    hyper_streams = []
    for c in range(hyper.shape[1]):
        hyper_streams.append(coder.encode_shared(
            hyper_rows[c], hyper_sym[:, c] - h_lo))
    with open(os.path.join(out_dir, "hyper.b"), "wb") as f:
        f.write(b"".join(hyper_streams))
    hyper_deq = hyper_sym.astype(np.float32)

    # --- masks: Bernoulli stream (ref :1265-1269) ---
    masks = np.asarray(st.get_mask(params))[idx_keep]          # [N,K]
    mask_bits = masks.reshape(-1).astype(np.int32)
    p1 = float(np.clip(mask_bits.mean() if mask_bits.size else 0.5,
                       1e-6, 1 - 1e-6))
    mask_row = coder.quantize_cdf(np.array([0.0, 1 - p1, 1.0]))
    mask_stream = coder.encode_shared(mask_row, mask_bits)
    with open(os.path.join(out_dir, "masks.b"), "wb") as f:
        f.write(mask_stream)

    # --- level structure on decoded anchors (bucket-padded, see _bucket) ---
    n_pad = _bucket(n)
    anchor_q = jnp.asarray(np.pad(anchor_q_np, ((0, n_pad - n), (0, 0))))
    alive = jnp.arange(n_pad) < n
    maps = _jit_level_maps(anchor_q, alive, voxel_size, tuple(level_scales),
                           cfg.level_num)
    level = np.asarray(maps.level)[:n]
    parent = maps.parent

    predictor = make_level_predictor(cfg)
    hyper_ctx = jnp.asarray(np.pad(
        hyper_deq * (0.0 if disable_hyper else 1.0), ((0, n_pad - n), (0, 0))))
    feat_state = jnp.zeros((n_pad, cfg.feat_dim), jnp.float32)
    scaling_state = jnp.zeros((n_pad, 6), jnp.float32)

    feat_np = np.asarray(params.anchor_feat)[idx_keep]
    scaling_np = np.exp(np.asarray(params.scaling_log)[idx_keep])
    offsets_np = np.asarray(params.offsets)[idx_keep].reshape(n, -1)

    meta_levels = []
    bits = dict(anchor=n * 3 * 16, hyper=sum(len(s) for s in hyper_streams) * 8,
                masks=len(mask_stream) * 8, feat=0, scaling=0, offsets=0)
    offsets_q_np = np.zeros_like(offsets_np)

    for li in reversed(range(cfg.level_num)):
        ep = predictor(params.mlps, li, anchor_q, feat_state, scaling_state,
                       parent, hyper_ctx)
        idx = np.where(level == li)[0]
        eph = _ep_host(ep, idx)
        chunks = []
        streams = {"feat": [], "scaling": [], "offsets": []}
        feat_deq_level = np.zeros((len(idx), cfg.feat_dim), np.float32)
        scaling_deq_level = np.zeros((len(idx), 6), np.float32)
        for s0 in range(0, len(idx), CHUNK):
            sl = slice(s0, min(s0 + CHUNK, len(idx)))
            rows = idx[sl]
            nn = len(rows)
            qf = np.repeat(eph["q_feat"][sl], cfg.feat_dim, axis=1).reshape(-1)
            qs = np.repeat(eph["q_scaling"][sl], 6, axis=1).reshape(-1)
            qo = np.repeat(eph["q_offsets"][sl], 3 * cfg.n_offsets,
                           axis=1).reshape(-1)
            sst = (None if stream_stats is None else
                   {k: stream_stats.setdefault(k, {})
                    for k in ("feat", "scaling", "offsets")})
            d_f, w_f, e_f, deq_f = _code_stream(
                feat_np[rows].reshape(-1), eph["mean_feat"][sl].reshape(-1),
                eph["scale_feat"][sl].reshape(-1), qf,
                stats=None if sst is None else sst["feat"])
            d_s, w_s, e_s, deq_s = _code_stream(
                scaling_np[rows].reshape(-1),
                eph["mean_scaling"][sl].reshape(-1),
                eph["scale_scaling"][sl].reshape(-1), qs,
                stats=None if sst is None else sst["scaling"])
            m3 = np.repeat(masks[rows], 3, axis=1).reshape(-1).astype(bool)
            d_o, w_o, e_o, deq_o = _code_stream(
                offsets_np[rows].reshape(-1)[m3],
                eph["mean_offsets"][sl].reshape(-1)[m3],
                eph["scale_offsets"][sl].reshape(-1)[m3], qo[m3],
                stats=None if sst is None else sst["offsets"])
            # chunk layout in the stream file: [range-coded bytes][escape i32s]
            streams["feat"].append(d_f + e_f)
            streams["scaling"].append(d_s + e_s)
            streams["offsets"].append(d_o + e_o)
            chunks.append(dict(n=nn, feat=(len(d_f), w_f, len(e_f)),
                               scaling=(len(d_s), w_s, len(e_s)),
                               offsets=(len(d_o), w_o, len(e_o))))
            feat_deq_level[sl] = deq_f.reshape(nn, cfg.feat_dim)
            scaling_deq_level[sl] = deq_s.reshape(nn, 6)
            off_full = np.zeros(nn * 3 * cfg.n_offsets, np.float32)
            off_full[m3] = deq_o
            offsets_q_np[rows] = off_full.reshape(nn, -1)
        for name in streams:
            with open(os.path.join(out_dir, f"{name}{li}.b"), "wb") as f:
                f.write(b"".join(streams[name]))
            bits[name] += sum(len(b) for b in streams[name]) * 8
        meta_levels.append(dict(level=li, count=len(idx), chunks=chunks))
        feat_state = feat_state.at[jnp.asarray(idx)].set(
            jnp.asarray(feat_deq_level))
        scaling_state = scaling_state.at[jnp.asarray(idx)].set(
            jnp.asarray(scaling_deq_level))

    mlp_bits = (count_mlp_params(params.mlps)
                + sum(x.size for x in jax.tree.leaves(params.prior))) * 32
    meta = dict(n=n, chunk=CHUNK, levels=meta_levels,
                hyper_range=(h_lo, h_hi),
                hyper_lens=[len(s) for s in hyper_streams],
                prob_masks=p1, bound_min=bmin, bound_max=bmax,
                level_scales=list(level_scales), voxel_size=voxel_size,
                disable_hyper=disable_hyper)
    with open(os.path.join(out_dir, "meta.pkl"), "wb") as f:
        pickle.dump(meta, f)
    save_pytree(os.path.join(out_dir, "mlp.pkl"),
                dict(mlps=params.mlps, prior=params.prior))
    bits["meta"] = os.path.getsize(os.path.join(out_dir, "meta.pkl")) * 8
    bits["mlp"] = mlp_bits
    bits["total"] = sum(bits.values())
    bits["time_s"] = time.time() - t0
    if return_states:
        states = dict(anchor=anchor_q_np, feat=np.asarray(feat_state)[:n],
                      scaling=np.asarray(scaling_state)[:n],
                      offsets=offsets_q_np.reshape(n, cfg.n_offsets, 3),
                      masks=masks, hyper=hyper_deq, level=level)
        return bits, states
    return bits


def decode_scene(out_dir: str, cfg: ModelConfig, mlps_like=None,
                 prior_like=None) -> DecodedScene:
    """conduct_decoding equivalent: files → compacted decoded arrays."""
    t0 = time.time()
    with open(os.path.join(out_dir, "meta.pkl"), "rb") as f:
        meta = pickle.load(f)
    n = meta["n"]
    from contextgs_tpu.models.mlps import init_decoder_mlps
    from contextgs_tpu.models.entropy import init_factorized_prior
    like = dict(mlps=mlps_like or init_decoder_mlps(jax.random.PRNGKey(0), cfg),
                prior=prior_like or init_factorized_prior(
                    jax.random.PRNGKey(0), cfg.hyper_dim))
    nets = load_pytree(os.path.join(out_dir, "mlp.pkl"), like)
    mlps, prior = nets["mlps"], nets["prior"]

    codes = np.load(os.path.join(out_dir, "anchor.npy"))
    anchor_np = _dequantize_anchor_np(codes, meta["bound_min"],
                                      meta["bound_max"])

    # hyper
    h_lo, h_hi = meta["hyper_range"]
    pmf = np.asarray(factorized_pmf_table(prior, h_lo, h_hi), np.float64)
    cdf = np.concatenate([np.zeros((pmf.shape[0], 1)), np.cumsum(pmf, axis=1)],
                         axis=1)
    cdf /= np.maximum(cdf[:, -1:], 1e-12)
    hyper_rows = coder.quantize_cdf(np.clip(cdf, 0, 1))
    with open(os.path.join(out_dir, "hyper.b"), "rb") as f:
        hyper_all = f.read()
    hyper_sym = np.zeros((n, cfg.hyper_dim), np.int32)
    pos = 0
    for c, ln in enumerate(meta["hyper_lens"]):
        hyper_sym[:, c] = coder.decode_shared(
            hyper_rows[c], n, hyper_all[pos:pos + ln]) + h_lo
        pos += ln
    assert pos == len(hyper_all), "hyper stream not fully consumed"
    hyper = hyper_sym.astype(np.float32)

    # masks
    p1 = meta["prob_masks"]
    mask_row = coder.quantize_cdf(np.array([0.0, 1 - p1, 1.0]))
    with open(os.path.join(out_dir, "masks.b"), "rb") as f:
        masks = coder.decode_shared(mask_row, n * cfg.n_offsets, f.read())
    masks = masks.reshape(n, cfg.n_offsets).astype(np.float32)

    # levels on decoded anchors — identical computation to the encoder
    n_pad = _bucket(n)
    anchor_q = jnp.asarray(np.pad(anchor_np, ((0, n_pad - n), (0, 0))))
    alive = jnp.arange(n_pad) < n
    maps = _jit_level_maps(anchor_q, alive, meta["voxel_size"],
                           tuple(meta["level_scales"]), cfg.level_num)
    level = np.asarray(maps.level)[:n]
    parent = maps.parent

    predictor = make_level_predictor(cfg)
    hyper_ctx = jnp.asarray(np.pad(
        hyper * (0.0 if meta["disable_hyper"] else 1.0),
        ((0, n_pad - n), (0, 0))))
    feat_state = jnp.zeros((n_pad, cfg.feat_dim), jnp.float32)
    scaling_state = jnp.zeros((n_pad, 6), jnp.float32)
    feat_out = np.zeros((n, cfg.feat_dim), np.float32)
    scaling_out = np.zeros((n, 6), np.float32)
    offsets_out = np.zeros((n, 3 * cfg.n_offsets), np.float32)

    data = {}
    for li in range(cfg.level_num):
        for name in ("feat", "scaling", "offsets"):
            with open(os.path.join(out_dir, f"{name}{li}.b"), "rb") as f:
                data[(name, li)] = f.read()

    for entry in sorted((e for e in meta["levels"]), key=lambda e: -e["level"]):
        li = entry["level"]
        ep = predictor(mlps, li, anchor_q, feat_state, scaling_state,
                       parent, hyper_ctx)
        idx = np.where(level == li)[0]
        assert len(idx) == entry["count"], \
            f"level {li}: {len(idx)} anchors vs encoded {entry['count']}"
        eph = _ep_host(ep, idx)
        pos = {"feat": 0, "scaling": 0, "offsets": 0}
        for ci, ch in enumerate(entry["chunks"]):
            s0 = ci * meta["chunk"]
            sl = slice(s0, s0 + ch["n"])
            rows = idx[sl]
            qf = np.repeat(eph["q_feat"][sl], cfg.feat_dim, axis=1).reshape(-1)
            qs = np.repeat(eph["q_scaling"][sl], 6, axis=1).reshape(-1)
            qo = np.repeat(eph["q_offsets"][sl], 3 * cfg.n_offsets,
                           axis=1).reshape(-1)
            def take(name):
                ln, w, ls = ch[name]
                p = pos[name]
                blob = data[(name, li)]
                pos[name] = p + ln + ls
                return blob[p:p + ln], blob[p + ln:p + ln + ls], w

            d, e, w = take("feat")
            feat_out[rows] = _decode_stream(
                d, e, eph["mean_feat"][sl].reshape(-1),
                eph["scale_feat"][sl].reshape(-1), qf, w
            ).reshape(ch["n"], cfg.feat_dim)
            d, e, w = take("scaling")
            scaling_out[rows] = _decode_stream(
                d, e, eph["mean_scaling"][sl].reshape(-1),
                eph["scale_scaling"][sl].reshape(-1), qs, w
            ).reshape(ch["n"], 6)
            m3 = np.repeat(masks[rows], 3, axis=1).reshape(-1).astype(bool)
            d, e, w = take("offsets")
            off = np.zeros(ch["n"] * 3 * cfg.n_offsets, np.float32)
            off[m3] = _decode_stream(
                d, e, eph["mean_offsets"][sl].reshape(-1)[m3],
                eph["scale_offsets"][sl].reshape(-1)[m3], qo[m3], w)
            offsets_out[rows] = off.reshape(ch["n"], -1)
        for name in ("feat", "scaling", "offsets"):
            assert pos[name] == len(data[(name, li)]), \
                f"{name}{li} stream not fully consumed"
        feat_state = feat_state.at[jnp.asarray(idx)].set(
            jnp.asarray(feat_out[idx]))
        scaling_state = scaling_state.at[jnp.asarray(idx)].set(
            jnp.asarray(scaling_out[idx]))

    import logging
    logging.getLogger("contextgs_tpu").info(
        "decoded %d anchors in %.1fs", n, time.time() - t0)
    return DecodedScene(
        anchor=anchor_np, feat=feat_out, scaling=scaling_out,
        offsets=offsets_out.reshape(n, cfg.n_offsets, 3), masks=masks,
        hyper=hyper, mlps=mlps, prior=prior,
        level_scales=meta["level_scales"], voxel_size=meta["voxel_size"])
