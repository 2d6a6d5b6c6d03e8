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

Round-1 simplifications (roadmap in SURVEY.md §7 hard-part #5):
- the multi-level context hierarchy is built per shard (each device divides
  its own anchors into levels). Cross-shard parent gathers would need anchors
  sharded by coarse-voxel key; statistically this per-shard variant trains the
  same context MLPs, and the single-chip path keeps exact reference semantics.
- SSIM is computed per band and pixel-weighted, so its 11-pixel window does
  not cross band seams (L1 and the rate terms are exact).

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
from contextgs_tpu.models import state as st
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

    def loss_shard(params, alive, bound_min, bound_max, cam, gt_pad, bg, key):
        """Per-device body; anchor arrays are local shards [N/n_dev, ...]."""
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
            maps = build_level_maps(jax.lax.stop_gradient(anchor_q), alive,
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

        def band_branch(row0):
            def run():
                out = rz.rasterize(
                    xyz, scaling, rot, color, opacity,
                    world_view=cam["world_view"], full_proj=cam["full_proj"],
                    tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
                    width=width, height=height, bg=bg,
                    tile_size=ts_px, budget=local_budget,
                    chunk_size=pipe.chunk_size, backend=backend,
                    valid=gvalid, tile_band=(row0, rows_per))
                return out.image
            return run

        band = jax.lax.switch(idx, [band_branch(d * rows_per)
                                    for d in range(n_dev)])     # [3,bh,W]
        gt_band = jax.lax.dynamic_slice_in_dim(
            gt_pad, idx * rows_per * ts_px, rows_per * ts_px, axis=1)
        pix_valid = jax.lax.dynamic_slice_in_dim(
            jnp.arange(height_pad) < height, idx * rows_per * ts_px,
            rows_per * ts_px, 0).astype(jnp.float32)[None, :, None]

        diff = jnp.abs(band - gt_band) * pix_valid
        l1 = jax.lax.psum(jnp.sum(diff), AXIS) / (3.0 * n_pix_total)
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
        return loss, (l1, rate_bpp)

    @jax.jit
    def step(params, buffers, adam, cam, gt, bg, it, key):
        pspec = _params_spec(params)
        cam_spec = {k: P() for k in cam}
        gt_pad = jnp.pad(gt, ((0, 0), (0, height_pad - height), (0, 0)))

        grad_fn = jax.value_and_grad(loss_shard, has_aux=True)
        smapped = shard_map(
            grad_fn, mesh=mesh,
            in_specs=(pspec, P(AXIS), P(), P(), cam_spec, P(), P(), P()),
            out_specs=((P(), (P(), P())), pspec),
            check_vma=False)
        (loss, (l1, bpp)), grads = smapped(
            params, buffers.alive, buffers.bound_min, buffers.bound_max,
            cam, gt_pad, bg, key)
        new_params, new_adam = adam_update(params, grads, adam, opt, it,
                                          spatial_lr_scale)
        return new_params, new_adam, dict(loss=loss, l1=l1, bpp=bpp)

    return step
