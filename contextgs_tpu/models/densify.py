"""Anchor densification on fixed-capacity padded pools.

Behavioral spec: /root/reference/scene/gaussian_model.py:696-910
(training_statis, anchor_growing, adjust_anchor). The reference reallocates
tensors and performs Adam-state surgery; here growing *activates free slots*
(with zeroed Adam moments — exactly what `cat_tensors_to_optimizer` produces
for new rows) and pruning clears the alive bit. Everything is jittable with
static shapes; if a growth round produces more anchors than free slots the
excess is dropped and an overflow flag is returned so the host can enlarge
the pool (one re-jit) before the next interval.

Growing reproduces the reference's 3-depth multi-resolution scheme: candidates
are gaussians whose accumulated screen-gradient exceeds 2^i · threshold,
subsampled with probability 1−0.5^(i+1), voxelized at
voxel_size · update_init_factor / update_hierachy_factor^i, deduplicated
against occupied anchor voxels; new anchors inherit the voxel-max candidate
feature/hyper (the reference's scatter_max, :816-820).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from contextgs_tpu.config import ModelConfig, OptimizationConfig
from contextgs_tpu.models import state as st
from contextgs_tpu.models.levels import segmented_carry
from contextgs_tpu.models.state import Buffers, Params
from contextgs_tpu.train.optim import AdamState


# ---------------------------------------------------------------------------
# Per-step statistics (ref training_statis, :696-713)
# ---------------------------------------------------------------------------

def accumulate_stats(buffers: Buffers, neural_opacity: jnp.ndarray,
                     gauss_valid: jnp.ndarray, radii_pos: jnp.ndarray,
                     anchor_visible: jnp.ndarray, screen_grad: jnp.ndarray,
                     n_offsets: int) -> Buffers:
    """neural_opacity/gauss_valid/radii_pos/screen_grad are [N·K] slot arrays;
    anchor_visible is [N]."""
    n = anchor_visible.shape[0]
    op = jnp.maximum(neural_opacity, 0.0).reshape(n, n_offsets)
    vis = anchor_visible
    opacity_accum = buffers.opacity_accum + jnp.where(vis, op.sum(axis=1), 0.0)
    anchor_denom = buffers.anchor_denom + vis.astype(jnp.float32)

    update = (gauss_valid & radii_pos).reshape(n, n_offsets)
    gnorm = jnp.linalg.norm(screen_grad[:, :2], axis=-1).reshape(n, n_offsets)
    offset_grad_accum = buffers.offset_grad_accum + jnp.where(update, gnorm, 0.0)
    offset_denom = buffers.offset_denom + update.astype(jnp.float32)
    return buffers._replace(opacity_accum=opacity_accum,
                            anchor_denom=anchor_denom,
                            offset_grad_accum=offset_grad_accum,
                            offset_denom=offset_denom)


# ---------------------------------------------------------------------------
# Sort-based voxel utilities (static shapes)
# ---------------------------------------------------------------------------

def _sorted_groups(keys3: jnp.ndarray, valid: jnp.ndarray, prio: jnp.ndarray):
    """Lexicographically sort voxel keys; return per-original-element
    (group_id, is_group_leader, leader_prio). `prio` breaks ties inside a
    group (leader = smallest prio). Invalid elements form a sentinel group."""
    n = keys3.shape[0]
    big = jnp.int32(2 ** 30)
    kx = jnp.where(valid, keys3[:, 0], big)
    ky = jnp.where(valid, keys3[:, 1], big)
    kz = jnp.where(valid, keys3[:, 2], big)
    idx = jnp.arange(n, dtype=jnp.int32)
    sx, sy, sz, sprio, sidx = jax.lax.sort((kx, ky, kz, prio, idx), num_keys=4)
    new_group = jnp.concatenate([
        jnp.ones((1,), bool),
        (sx[1:] != sx[:-1]) | (sy[1:] != sy[:-1]) | (sz[1:] != sz[:-1])])
    gid_sorted = jnp.cumsum(new_group.astype(jnp.int32)) - 1
    leader_prio_sorted = segmented_carry(new_group, sprio)
    gid = jnp.zeros((n,), jnp.int32).at[sidx].set(gid_sorted)
    is_leader = jnp.zeros((n,), bool).at[sidx].set(new_group)
    leader_prio = jnp.zeros((n,), jnp.int32).at[sidx].set(leader_prio_sorted)
    return gid, is_leader, leader_prio


def _voxel_occupied(cand_keys: jnp.ndarray, cand_valid: jnp.ndarray,
                    anchor_keys: jnp.ndarray, anchor_valid: jnp.ndarray):
    """For each candidate, is its voxel occupied by any valid anchor?

    Joint sort with a source flag; within each voxel group anchors (flag 0)
    sort first, so a candidate's voxel is occupied iff its group leader is an
    anchor."""
    keys = jnp.concatenate([anchor_keys, cand_keys], axis=0)
    valid = jnp.concatenate([anchor_valid, cand_valid], axis=0)
    flag = jnp.concatenate([
        jnp.zeros((anchor_keys.shape[0],), jnp.int32),
        jnp.ones((cand_keys.shape[0],), jnp.int32)])
    _, _, leader_flag = _sorted_groups(keys, valid, flag)
    return (leader_flag[anchor_keys.shape[0]:] == 0) & cand_valid


# ---------------------------------------------------------------------------
# adjust_anchor (ref :856-910) — grow, reset stats, prune
# ---------------------------------------------------------------------------

class DensifyResult(NamedTuple):
    params: Params
    buffers: Buffers
    adam: AdamState
    n_grown: jnp.ndarray
    n_pruned: jnp.ndarray
    overflowed: jnp.ndarray


def _zero_anchor_rows(tree, sel):
    """Zero rows `sel` of every anchor-indexed leaf in an (mu/nu) Params tree."""
    def z(leaf):
        if leaf.ndim >= 1 and leaf.shape[0] == sel.shape[0]:
            m = sel.reshape((sel.shape[0],) + (1,) * (leaf.ndim - 1))
            return jnp.where(m, 0.0, leaf)
        return leaf
    anchor_fields = ["anchor", "anchor_feat", "hyper_latent", "offsets",
                     "mask_logit", "scaling_log", "rotation", "opacity_raw"]
    return tree._replace(**{f: z(getattr(tree, f)) for f in anchor_fields})


def adjust_anchors(params: Params, buffers: Buffers, adam: AdamState,
                   cfg: ModelConfig, opt: OptimizationConfig,
                   voxel_size: float, key: jax.Array,
                   gather_axis: str | None = None) -> DensifyResult:
    """With `gather_axis` (inside shard_map over that mesh axis), the
    occupied-voxel dedup checks candidates against ALL shards' anchors (an
    all_gather of the int32 voxel keys — the reference's global `unique`
    semantics); growth slots, stats, and pruning stay shard-local."""
    n, k = params.offsets.shape[0], cfg.n_offsets
    nk = n * k

    grads = buffers.offset_grad_accum / buffers.offset_denom
    grads = jnp.nan_to_num(grads, nan=0.0, posinf=0.0).reshape(nk)
    offset_mask = (buffers.offset_denom.reshape(nk)
                   > opt.update_interval * opt.success_threshold * 0.5)

    alive = buffers.alive
    total_grown = jnp.int32(0)
    overflow = jnp.zeros((), bool)
    keys = jax.random.split(key, cfg.update_depth)

    for i in range(cfg.update_depth):
        thr = opt.densify_grad_threshold * ((cfg.update_hierachy_factor // 2) ** i)
        size_factor = cfg.update_init_factor // (cfg.update_hierachy_factor ** i)
        cur_size = voxel_size * size_factor

        rand_keep = jax.random.uniform(keys[i], (nk,)) > (0.5 ** (i + 1))
        alive_rep = jnp.repeat(alive, k, axis=0)
        cand = (grads >= thr) & offset_mask & rand_keep & alive_rep

        anchor_q = st.get_anchor(params, buffers)
        scaling3 = st.get_scaling(params)[:, :3]
        all_xyz = (anchor_q[:, None, :]
                   + params.offsets * scaling3[:, None, :]).reshape(nk, 3)
        cand_keys = jnp.round(all_xyz / cur_size).astype(jnp.int32)
        anchor_keys = jnp.round(anchor_q / cur_size).astype(jnp.int32)

        gid, is_leader, _ = _sorted_groups(cand_keys, cand,
                                           jnp.arange(nk, dtype=jnp.int32))
        occ_keys, occ_valid = anchor_keys, alive
        if gather_axis is not None:
            occ_keys = jax.lax.all_gather(anchor_keys, gather_axis, tiled=True)
            occ_valid = jax.lax.all_gather(alive, gather_axis, tiled=True)
        occupied = _voxel_occupied(cand_keys, cand, occ_keys, occ_valid)
        # a group is occupied iff any member is (same voxel): leaders decide
        occ_per_group = jax.ops.segment_max(
            occupied.astype(jnp.int32), gid, num_segments=nk)
        new_leader = cand & is_leader & (occ_per_group[gid] == 0)

        # voxel-max feature/hyper over the group (ref scatter_max, :816-820)
        neg = jnp.float32(-1e30)
        feat_rep = jnp.repeat(params.anchor_feat, k, axis=0)
        hyper_rep = jnp.repeat(params.hyper_latent, k, axis=0)
        feat_src = jnp.where(cand[:, None], feat_rep, neg)
        hyper_src = jnp.where(cand[:, None], hyper_rep, neg)
        feat_max = jax.ops.segment_max(feat_src, gid, num_segments=nk)
        hyper_max = jax.ops.segment_max(hyper_src, gid, num_segments=nk)

        # allocate free slots in index order
        free_order = jnp.argsort(alive.astype(jnp.int32), stable=True)  # free first
        n_free = jnp.sum(~alive)
        rank = jnp.cumsum(new_leader.astype(jnp.int32)) - 1
        can_place = new_leader & (rank < n_free)
        overflow = overflow | jnp.any(new_leader & (rank >= n_free))
        dest = jnp.where(can_place, free_order[jnp.clip(rank, 0, n - 1)], n)

        new_anchor_pos = cand_keys.astype(jnp.float32) * cur_size
        new_scaling = jnp.full((nk, 6), jnp.log(cur_size), jnp.float32)

        def scatter_rows(arr, values):
            return arr.at[dest].set(values, mode="drop")

        p = params
        p = p._replace(
            anchor=scatter_rows(p.anchor, new_anchor_pos),
            anchor_feat=scatter_rows(p.anchor_feat, feat_max[gid]),
            hyper_latent=scatter_rows(p.hyper_latent, hyper_max[gid]),
            offsets=scatter_rows(p.offsets, jnp.zeros((nk, k, 3))),
            mask_logit=scatter_rows(p.mask_logit, jnp.ones((nk, k))),
            scaling_log=scatter_rows(p.scaling_log, new_scaling),
            rotation=scatter_rows(
                p.rotation,
                jnp.zeros((nk, 4)).at[:, 0].set(1.0)),
            opacity_raw=scatter_rows(p.opacity_raw,
                                     jnp.full((nk, 1), jnp.log(0.1 / 0.9))),
        )
        placed = jnp.zeros((n,), bool).at[dest].set(can_place, mode="drop")
        alive = alive | placed
        # zero Adam moments and stats of activated slots
        adam = adam._replace(mu=_zero_anchor_rows(adam.mu, placed),
                             nu=_zero_anchor_rows(adam.nu, placed))
        buffers = buffers._replace(
            opacity_accum=jnp.where(placed, 0.0, buffers.opacity_accum),
            anchor_denom=jnp.where(placed, 0.0, buffers.anchor_denom),
            offset_grad_accum=jnp.where(placed[:, None], 0.0,
                                        buffers.offset_grad_accum),
            offset_denom=jnp.where(placed[:, None], 0.0, buffers.offset_denom),
            alive=alive)
        params = p
        total_grown = total_grown + jnp.sum(can_place)

    # reset offset stats where they were consumed (ref :878-890)
    om = offset_mask.reshape(n, k)
    buffers = buffers._replace(
        offset_denom=jnp.where(om, 0.0, buffers.offset_denom),
        offset_grad_accum=jnp.where(om, 0.0, buffers.offset_grad_accum))

    # prune (ref :892-910)
    prune = (buffers.opacity_accum < opt.min_opacity * buffers.anchor_denom)
    enough = buffers.anchor_denom > opt.update_interval * opt.success_threshold
    prune = prune & enough & alive
    # anchors with enough observations get their opacity stats reset
    buffers = buffers._replace(
        opacity_accum=jnp.where(enough, 0.0, buffers.opacity_accum),
        anchor_denom=jnp.where(enough, 0.0, buffers.anchor_denom))
    alive = alive & ~prune
    buffers = buffers._replace(
        alive=alive,
        offset_grad_accum=jnp.where(prune[:, None], 0.0,
                                    buffers.offset_grad_accum),
        offset_denom=jnp.where(prune[:, None], 0.0, buffers.offset_denom))

    # the reference clamps survivors' gaussian log-scales at 0.05 on every
    # densify step (ref :729-733)
    sl = params.scaling_log
    params = params._replace(scaling_log=jnp.concatenate(
        [sl[:, :3], jnp.minimum(sl[:, 3:], 0.05)], axis=1))

    return DensifyResult(params=params, buffers=buffers, adam=adam,
                         n_grown=total_grown, n_pruned=jnp.sum(prune),
                         overflowed=overflow)
