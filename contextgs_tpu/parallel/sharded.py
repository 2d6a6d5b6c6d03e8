"""Multi-chip training: anchors sharded, image tiles banded, grads psum'd.

The reference has no distributed backend at all (SURVEY.md §2.13/§5.8); this
module is the TPU-native scaling design from BASELINE.json's north star:

- one `jax.sharding.Mesh` axis ``gs`` over the pod slice;
- anchor-indexed parameters and optimizer moments are sharded on dim 0 — the
  per-anchor stages (neural-gaussian MLP decode, quantization-aware context,
  rate estimate) run fully parallel with zero communication;
- each device decodes and projects its local gaussians, `all_gather`s only the
  ~12 floats/gaussian of screen-space splat state over ICI (never the
  parameters), and rasterizes its own horizontal band of image tiles with the
  Pallas kernel (pallas_call under shard_map);
- the loss is a `psum` of per-band partial losses, so shard_map's autodiff
  transposes the gather into the correct per-gaussian gradient accumulation
  and psums the replicated MLP/prior gradients automatically.

Densification under the mesh (round 2, VERDICT r1 #3): the training step
accumulates the reference's densify statistics per shard (the screenspace
cotangent rides the all_gather — its autodiff transpose psum-scatters each
gaussian's full-image gradient back to its home shard), `adjust_anchors` runs
per shard with per-shard free-slot pools (growth is fully local), and a
host-side `reshard_anchors` pass (at densify cadence) deduplicates voxels
globally and redistributes anchors so each shard owns WHOLE context trees:

- the multi-level hierarchy is a forest — every voxel at every level lies
  inside exactly one tree rooted at a coarsest-level representative (members
  of a voxel share their representative, so voxels never span trees);
- sharding by hash(tree root) therefore makes the per-shard
  `build_level_maps` EXACTLY the global hierarchy restricted to the shard:
  every parent gather is shard-local by construction (SURVEY §7 hard-part 5).

Remaining deviation vs single-chip: SSIM is computed per band and
pixel-weighted, so its 11-pixel window does not cross band seams (L1 and the
rate terms are exact); within one densify interval two shards may grow the
same voxel (deduplicated at the next reshard, keep-first like the reference's
unique).

The CPU-mesh dryrun (__graft_entry__.dryrun_multichip) runs this exact step
with the dense reference blend, since Pallas cannot execute on CPU here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from contextgs_tpu.config import TrainConfig
from contextgs_tpu.models import densify, state as st
from contextgs_tpu.models.context import estimate_rate, multi_scale_generate
from contextgs_tpu.models.decode import decode_neural_gaussians
from contextgs_tpu.models.levels import build_level_maps
from contextgs_tpu.models.quant import quantize_anchor
from contextgs_tpu.models.state import Buffers, Params
from contextgs_tpu.ops import rasterize as rz
from contextgs_tpu.ops.ssim import ssim
from contextgs_tpu.train.optim import adam_update, AdamState

AXIS = "gs"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def _params_spec(params: Params) -> Params:
    fields = {}
    for name in params._fields:
        v = getattr(params, name)
        if name in ("mlps", "prior"):
            fields[name] = jax.tree.map(lambda l: P(), v)
        else:
            fields[name] = P(AXIS, *([None] * (v.ndim - 1)))
    return Params(**fields)


def shard_model(mesh: Mesh, params: Params, buffers: Buffers,
                adam: AdamState):
    """Place model/optimizer on the mesh (anchor-dim sharded)."""
    pspec = _params_spec(params)
    bspec = Buffers(alive=P(AXIS), bound_min=P(), bound_max=P(),
                    opacity_accum=P(AXIS), anchor_denom=P(AXIS),
                    offset_grad_accum=P(AXIS, None),
                    offset_denom=P(AXIS, None))
    aspec = AdamState(mu=pspec, nu=pspec, count=P())

    def put(tree, spec):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, spec)

    return (put(params, pspec), put(buffers, bspec), put(adam, aspec),
            (pspec, bspec, aspec))


def make_sharded_train_step(cfg: TrainConfig, mesh: Mesh, width: int,
                            height: int, budget: int, phase: str,
                            level_scales: tuple, spatial_lr_scale: float,
                            voxel_size: float, backend: str = "pallas"):
    """Jitted multi-device train step mirroring train/step.py."""
    mcfg, opt, pipe = cfg.model, cfg.opt, cfg.pipe
    n_dev = mesh.devices.size
    ts_px = pipe.tile_size
    tiles_y = (height + ts_px - 1) // ts_px
    rows_per = -(-tiles_y // n_dev)
    pad_rows = rows_per * n_dev
    height_pad = pad_rows * ts_px
    local_budget = max(budget // n_dev, 4096)
    n_pix_total = float(width * height)

    def loss_shard(params, screen_dummy, alive, bound_min, bound_max, cam,
                   gt_pad, bg, key):
        """Per-device body; anchor arrays are local shards [N/n_dev, ...].

        `screen_dummy` is the local [n_local·K, 2] zero tensor whose cotangent
        is the densification screen-gradient statistic (ref train.py:168-173):
        it is all_gathered onto every band's projection, so its transpose
        (psum-scatter) returns each gaussian's FULL-image viewspace gradient,
        summed over bands, to its home shard."""
        idx = jax.lax.axis_index(AXIS)
        key = jax.random.fold_in(key, idx)
        anchor_q, _ = quantize_anchor(params.anchor, bound_min, bound_max)
        feat = params.anchor_feat
        grid_scaling = st.get_scaling(params)
        grid_offsets = params.offsets

        rate_bpp = jnp.zeros(())
        if phase == "context":
            fake_buffers = Buffers(alive=alive, bound_min=bound_min,
                                   bound_max=bound_max, opacity_accum=None,
                                   anchor_denom=None, offset_grad_accum=None,
                                   offset_denom=None)
            # kept-set membership, matching the encoder (see train/step.py)
            kept = st.get_mask_anchor(params, alive)
            maps = build_level_maps(jax.lax.stop_gradient(anchor_q), kept,
                                    voxel_size, level_scales, mcfg.level_num)
            kc, kr = jax.random.split(key)
            ctx = multi_scale_generate(params, fake_buffers, mcfg, maps,
                                       anchor_q, kc, training=True,
                                       disable_hyper=opt.disable_hyper)
            feat, grid_scaling, grid_offsets = (ctx.feat_q, ctx.scaling_q,
                                                ctx.offsets_q)
            rate = estimate_rate(params, fake_buffers, mcfg, ctx,
                                 st.get_mask(params),
                                 st.get_mask_anchor(params, alive), kr,
                                 sample_frac=opt.rate_sample_frac)
            rate_bpp = jax.lax.pmean(rate.bit_per_param, AXIS)

        vis = rz.visible_filter(anchor_q, grid_scaling[:, :3],
                                cam["world_view"], cam["full_proj"],
                                cam["tanfovx"], cam["tanfovy"], width, height,
                                valid=alive)
        ng = decode_neural_gaussians(params, None, mcfg, cam["camera_center"],
                                     vis, feat=feat, grid_scaling=grid_scaling,
                                     grid_offsets=grid_offsets, anchor=anchor_q)

        # gather splat state over ICI; rasterize the local tile band
        xyz = jax.lax.all_gather(ng.xyz, AXIS, tiled=True)
        scaling = jax.lax.all_gather(ng.scaling, AXIS, tiled=True)
        rot = jax.lax.all_gather(ng.rot, AXIS, tiled=True)
        color = jax.lax.all_gather(ng.color, AXIS, tiled=True)
        opacity = jax.lax.all_gather(ng.opacity, AXIS, tiled=True)
        gvalid = jax.lax.all_gather(ng.gauss_valid, AXIS, tiled=True)

        sd_all = jax.lax.all_gather(screen_dummy, AXIS, tiled=True)

        def band_branch(row0):
            def run():
                out = rz.rasterize(
                    xyz, scaling, rot, color, opacity,
                    world_view=cam["world_view"], full_proj=cam["full_proj"],
                    tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
                    width=width, height=height, bg=bg,
                    tile_size=ts_px, budget=local_budget,
                    chunk_size=pipe.chunk_size, backend=backend,
                    valid=gvalid, screen_dummy=sd_all,
                    tile_band=(row0, rows_per))
                return out.image, out.visibility, out.overflowed
            return run

        band, band_vis, band_ovf = jax.lax.switch(
            idx, [band_branch(d * rows_per) for d in range(n_dev)])
        # full-image visibility (radii>0 in ANY band) for the LOCAL gaussians:
        # a reduce_scatter sums per-band flags and lands the home slice
        vis_local = jax.lax.psum_scatter(
            band_vis.astype(jnp.int32), AXIS, scatter_dimension=0,
            tiled=True) > 0                                     # [local_nk]
        overflowed = jax.lax.psum(band_ovf.astype(jnp.int32), AXIS) > 0
        gt_band = jax.lax.dynamic_slice_in_dim(
            gt_pad, idx * rows_per * ts_px, rows_per * ts_px, axis=1)
        pix_valid = jax.lax.dynamic_slice_in_dim(
            jnp.arange(height_pad) < height, idx * rows_per * ts_px,
            rows_per * ts_px, 0).astype(jnp.float32)[None, :, None]

        diff = jnp.abs(band - gt_band) * pix_valid
        l1 = jax.lax.psum(jnp.sum(diff), AXIS) / (3.0 * n_pix_total)
        sse = jax.lax.psum(jnp.sum(jnp.square(diff)), AXIS)
        mse = sse / (3.0 * n_pix_total)
        # band-local SSIM, pixel-weighted (window does not cross seams)
        ssim_band = ssim(band * pix_valid, gt_band * pix_valid)
        w_band = jnp.sum(pix_valid) * width / n_pix_total
        ssim_v = jax.lax.psum(ssim_band * w_band, AXIS)

        gv = ng.gauss_valid
        prod3 = jnp.prod(ng.scaling, axis=1)
        scaling_reg = (jax.lax.psum(jnp.sum(jnp.where(gv, prod3, 0.0)), AXIS)
                       / jnp.maximum(jax.lax.psum(jnp.sum(gv), AXIS), 1))

        loss = (opt.lmbda_rec * ((1 - opt.lambda_dssim) * l1
                                 + opt.lambda_dssim * (1 - ssim_v))
                + opt.scaling_reg_weight * scaling_reg)
        if phase == "context":
            mask_mean = (jax.lax.psum(
                jnp.sum(jax.nn.sigmoid(params.mask_logit) * alive[:, None]),
                AXIS) / jnp.maximum(
                    jax.lax.psum(jnp.sum(alive), AXIS) * mcfg.n_offsets, 1))
            loss = loss + opt.lmbda * rate_bpp + opt.mask_reg_weight * mask_mean
        aux = (l1, mse, rate_bpp, ng.neural_opacity, ng.gauss_valid,
               vis_local, vis, overflowed)
        return loss, aux

    @jax.jit
    def step(params, buffers, adam, cam, gt, bg, it, with_stats, key):
        pspec = _params_spec(params)
        cam_spec = {k: P() for k in cam}
        gt_pad = jnp.pad(gt, ((0, 0), (0, height_pad - height), (0, 0)))
        nk_total = params.offsets.shape[0] * mcfg.n_offsets
        screen_dummy0 = jnp.zeros((nk_total, 2), jnp.float32)

        grad_fn = jax.value_and_grad(loss_shard, argnums=(0, 1), has_aux=True)
        smapped = shard_map(
            grad_fn, mesh=mesh,
            in_specs=(pspec, P(AXIS), P(AXIS), P(), P(), cam_spec, P(), P(),
                      P()),
            out_specs=((P(), (P(), P(), P(), P(AXIS), P(AXIS), P(AXIS),
                              P(AXIS), P())),
                       (pspec, P(AXIS))),
            check_vma=True)
        ((loss, aux), (grads, screen_grad)) = smapped(
            params, screen_dummy0, buffers.alive, buffers.bound_min,
            buffers.bound_max, cam, gt_pad, bg, key)
        (l1, mse, bpp, neural_op, gauss_valid, vis_full, anchor_vis,
         overflowed) = aux

        # densification statistics (sharded elementwise per anchor — the
        # arrays come out of shard_map with P(AXIS) shardings, so this stays
        # communication-free under jit's sharding propagation)
        sf = with_stats.astype(jnp.float32)
        new_buffers = densify.accumulate_stats(
            buffers, neural_op * sf + 0.0, gauss_valid & with_stats,
            vis_full, anchor_vis & with_stats, screen_grad, mcfg.n_offsets)

        new_params, new_adam = adam_update(params, grads, adam, opt, it,
                                          spatial_lr_scale)
        return new_params, new_buffers, new_adam, dict(
            loss=loss, l1=l1, bpp=bpp, overflowed=overflowed,
            psnr=-10.0 * jnp.log10(jnp.maximum(mse, 1e-12)))

    return step


def make_sharded_densify(cfg: TrainConfig, mesh: Mesh, voxel_size: float):
    """`adjust_anchors` under the mesh: growth uses the shard's OWN free-slot
    pool; candidate voxels are deduplicated against the EXISTING anchors of
    all shards (adjust_anchors all_gathers every shard's voxel keys per level
    via ``gather_axis``). Only candidate-vs-candidate duplicates across shards
    within one interval can slip through; those are removed by the next
    host-side `reshard_anchors` (keep-first, like the reference's unique)."""
    from contextgs_tpu.models import densify as dn

    @jax.jit
    def run(params, buffers, adam, key):
        pspec = _params_spec(params)
        bspec = Buffers(alive=P(AXIS), bound_min=P(), bound_max=P(),
                        opacity_accum=P(AXIS), anchor_denom=P(AXIS),
                        offset_grad_accum=P(AXIS, None),
                        offset_denom=P(AXIS, None))
        aspec = AdamState(mu=pspec, nu=pspec, count=P())

        def body(params, buffers, adam, key):
            idx = jax.lax.axis_index(AXIS)
            res = dn.adjust_anchors(params, buffers, adam, cfg.model, cfg.opt,
                                    voxel_size, jax.random.fold_in(key, idx),
                                    gather_axis=AXIS)
            return (res.params, res.buffers, res.adam,
                    jax.lax.psum(res.n_grown, AXIS),
                    jax.lax.psum(res.n_pruned, AXIS),
                    jax.lax.psum(res.overflowed.astype(jnp.int32), AXIS) > 0)

        return shard_map(
            body, mesh=mesh,
            in_specs=(pspec, bspec, aspec, P()),
            out_specs=(pspec, bspec, aspec, P(), P(), P()),
            check_vma=True)(params, buffers, adam, key)

    return run


def compute_tree_roots(anchor: np.ndarray, alive: np.ndarray,
                       voxel_size: float, level_scales: tuple,
                       level_num: int) -> np.ndarray:
    """[N] int32: each anchor's coarsest-level ancestor (host-side).

    The hierarchy is a forest: members of any voxel at any level share their
    representative, so voxels never span trees and sharding whole trees keeps
    every parent gather local."""
    maps = jax.jit(build_level_maps, static_argnums=(2, 3, 4))(
        jnp.asarray(anchor), jnp.asarray(alive), float(voxel_size),
        tuple(level_scales), int(level_num))
    parent = np.asarray(maps.parent)
    root = np.arange(anchor.shape[0], dtype=np.int64)
    for _ in range(level_num - 1):
        root = parent[root]
    return root.astype(np.int32)


def reshard_anchors(params: Params, buffers: Buffers, adam: AdamState,
                    n_dev: int, voxel_size: float,
                    level_scales: tuple | None = None, level_num: int = 3,
                    headroom: float = 1.3, min_capacity: int = 0):
    """Host-side anchor redistribution (run at densify cadence).

    1. global voxel dedup at the finest anchor grid (cross-shard growth can
       duplicate a voxel within one interval; the reference's `unique`
       guarantees one anchor per voxel — keep the first occupant);
    2. shard assignment: hash of the anchor's context-tree ROOT when
       `level_scales` is known (context phase — keeps the whole autoregressive
       tree on one shard), plain spatial voxel hash before that;
    3. per-shard packing into equal-capacity slabs (grown if any shard
       outgrows its slab), dead tail slots zeroed.

    Returns (params, buffers, adam) as HOST-side pytrees with capacity a
    multiple of n_dev — re-place with `shard_model`."""
    alive = np.asarray(buffers.alive).copy()
    n = alive.shape[0]

    # key voxels/trees off the 16-bit QUANTIZED anchor — the same grid the
    # training step uses (build_level_maps on anchor_q via st.get_anchor) and
    # adjust_anchors dedups on. Keying off the raw anchor can round a
    # boundary-adjacent anchor into a different voxel/parent than at train
    # time, silently splitting a context tree across shards.
    from contextgs_tpu.models.quant import ANCHOR_ROUND_DIGITS, Q_ANCHOR
    bmin = np.asarray(buffers.bound_min)
    bmax = np.asarray(buffers.bound_max)
    interval = (bmax - bmin) * Q_ANCHOR + 1e-6
    codes = np.clip(np.floor((np.asarray(params.anchor) - bmin) / interval),
                    0, 2 ** ANCHOR_ROUND_DIGITS - 1)
    anchor = codes * interval + bmin                  # quantized grid anchor

    keys = np.round(anchor / voxel_size).astype(np.int64)
    ai = np.nonzero(alive)[0]
    _, first = np.unique(keys[ai], axis=0, return_index=True)
    keep = ai[np.sort(first)]
    n_dupes = len(ai) - len(keep)

    if level_scales:
        # colocate by KEPT-set trees (alive ∧ mask_anchor): the training step
        # now builds level maps over the kept membership (see train/step.py),
        # so parent locality must be established on the same forest. Non-kept
        # anchors are their own roots and land wherever their hash says —
        # they have no parents/children in the kept hierarchy. Mask flips
        # between reshard points can transiently break locality; the next
        # reshard restores it (same bounded-approximation class as the
        # per-shard densify subsampling).
        mask_np = np.asarray(st.get_mask_anchor(params, jnp.asarray(alive)))
        root = compute_tree_roots(anchor, mask_np, voxel_size, level_scales,
                                  level_num)[keep].astype(np.int64)
        shard = ((root * 2654435761) % 2**31) % n_dev
    else:
        ck = np.floor(anchor[keep] / (voxel_size * 16.0)).astype(np.int64)
        shard = (((ck[:, 0] * 73856093) ^ (ck[:, 1] * 19349663)
                  ^ (ck[:, 2] * 83492791)) % (2**31)) % n_dev

    per = [keep[shard == d] for d in range(n_dev)]
    need = max(len(p) for p in per)
    cap_per = max(n // n_dev, 1)
    if need > cap_per or need * headroom > cap_per:
        cap_per = int(np.ceil(need * headroom / 256.0) * 256)
    # explicit growth request (per-shard pool exhausted during densify —
    # mirror the single-chip loop's capacity doubling)
    cap_per = max(cap_per, -(-min_capacity // n_dev))
    new_n = cap_per * n_dev

    # row permutation: new row -> old row (or -1 for a dead pad slot)
    src = np.full(new_n, -1, np.int64)
    for d, rows in enumerate(per):
        src[d * cap_per:d * cap_per + len(rows)] = rows
    pad = src < 0
    src_c = np.where(pad, 0, src)

    def take(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == n:
            out = x[src_c]
            out[pad] = 0
            return jnp.asarray(out)
        return jnp.asarray(x)

    new_params = params._replace(**{
        f: take(getattr(params, f)) for f in params._fields
        if f not in ("mlps", "prior")})
    new_buffers = Buffers(
        alive=jnp.asarray(~pad),
        bound_min=jnp.asarray(np.asarray(buffers.bound_min)),
        bound_max=jnp.asarray(np.asarray(buffers.bound_max)),
        opacity_accum=take(buffers.opacity_accum),
        anchor_denom=take(buffers.anchor_denom),
        offset_grad_accum=take(buffers.offset_grad_accum),
        offset_denom=take(buffers.offset_denom))

    def take_tree(t):
        return t._replace(**{
            f: take(getattr(t, f)) for f in t._fields
            if f not in ("mlps", "prior")})

    new_adam = AdamState(mu=take_tree(adam.mu), nu=take_tree(adam.nu),
                         count=adam.count)
    return new_params, new_buffers, new_adam, dict(
        n_alive=int(len(keep)), n_dupes_removed=int(n_dupes),
        capacity=int(new_n))
