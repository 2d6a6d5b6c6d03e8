"""Multi-level anchor hierarchy (the ContextGS novelty), static-shape JAX.

Behavioral spec: /root/reference/scene/gaussian_model.py:1726-1793 and
/root/reference/utils/multi_level.py. The reference builds, per call, nested
ragged index lists (level i anchors ⊂ level i−1) via torch.unique. Here the
same structure is expressed as two fixed-shape per-anchor arrays:

- ``level[a]``  — the *highest* level anchor `a` belongs to (coding happens
  coarse→fine, so anchor `a` is entropy-coded exactly once, at level[a]);
- ``parent[a]`` — the original-space index of `a`'s coarser-level voxel
  representative (its autoregressive context source); for anchors at the
  coarsest level parent[a] = a (unused).

Voxel-unique is sort-based: lexicographic `lax.sort` over the 3 rounded
coordinates with the original index as a stable tie-break reproduces
torch.unique's first-occupant representative (ref multi_level.py:23-30 takes
the min original index per voxel; a stable sort puts it first in each group).

`find_divide_scale` (host, numpy) binary-searches the per-level voxel scale for
a `target_ratio` unique fraction, exactly as ref gaussian_model.py:1726-1749;
it runs once and is persisted in checkpoints.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LevelMaps(NamedTuple):
    level: jnp.ndarray     # [N] int32 in [0, level_num)
    parent: jnp.ndarray    # [N] int32 original-space parent index
    counts: jnp.ndarray    # [level_num] int32 anchors whose level == i


def segmented_carry(is_start: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Forward-fill `values` from segment starts: out[i] = values[j] for the
    latest j ≤ i with is_start[j]. Associative 'last set value' scan."""

    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va)

    _, out = jax.lax.associative_scan(op, (is_start, values))
    return out


def _voxel_unique_representative(keys: jnp.ndarray, valid: jnp.ndarray):
    """keys [N,3] int32 voxel coords (+ valid mask) → per-element
    (is_representative [N] bool, rep_index [N] int32: original index of the
    first occupant of this element's voxel).

    Invalid elements are grouped into a sentinel voxel and excluded.
    """
    n = keys.shape[0]
    big = jnp.int32(2 ** 30)
    kx = jnp.where(valid, keys[:, 0], big)
    ky = jnp.where(valid, keys[:, 1], big)
    kz = jnp.where(valid, keys[:, 2], big)
    idx = jnp.arange(n, dtype=jnp.int32)
    sx, sy, sz, sidx = jax.lax.sort((kx, ky, kz, idx), num_keys=3)
    new_group = jnp.concatenate([
        jnp.ones((1,), bool),
        (sx[1:] != sx[:-1]) | (sy[1:] != sy[:-1]) | (sz[1:] != sz[:-1])])
    # representative (first occupant) original index per group: propagate the
    # group-start value forward with a segmented "last set value" scan
    rep_sorted = segmented_carry(new_group, sidx)
    # scatter back to original order
    rep = jnp.zeros((n,), jnp.int32).at[sidx].set(rep_sorted)
    is_rep = jnp.zeros((n,), bool).at[sidx].set(new_group)
    return is_rep & valid, jnp.where(valid, rep, idx)


def build_level_maps(anchors: jnp.ndarray, alive: jnp.ndarray,
                     voxel_size: float, level_scales: tuple,
                     level_num: int) -> LevelMaps:
    """Compute level membership and parents for all (padded) anchors.

    anchors: [N,3] quantized anchor positions; alive: [N] bool (dead/padded
    slots behave like the reference's mask-zeroed anchors: they are excluded
    from every level above 0 and never become representatives).

    Matches ref divide_levels (gaussian_model.py:1751-1765): level 1 keys are
    rounded from mask-zeroed anchor positions of level 0 members; level i keys
    from the level i−1 representatives' positions.
    """
    n = anchors.shape[0]
    level = jnp.zeros((n,), jnp.int32)
    parent = jnp.arange(n, dtype=jnp.int32)
    member = alive                     # membership of the current level
    for i in range(1, level_num):
        scale = voxel_size * float(level_scales[i - 1])
        pos = jnp.where(member[:, None], anchors, 0.0)
        keys = jnp.round(pos / scale).astype(jnp.int32)
        is_rep, rep = _voxel_unique_representative(keys, member)
        # members of level i-1 that are not representatives get their parent
        # (context source) from this round; representatives ascend to level i
        parent = jnp.where(member & ~is_rep, rep, parent)
        level = jnp.where(is_rep, i, level)
        member = is_rep
    lv = jnp.where(alive, level, -1)
    counts = jnp.stack([jnp.sum(lv == i) for i in range(level_num)])
    return LevelMaps(level=jnp.where(alive, level, 0).astype(jnp.int32),
                     parent=parent.astype(jnp.int32), counts=counts)


def find_divide_scale(anchors: np.ndarray, voxel_size: float,
                      bound_min: np.ndarray, bound_max: np.ndarray,
                      target_ratio: float, level_num: int) -> list:
    """Host-side binary search for per-level voxel scales
    (ref find_divide_scale, gaussian_model.py:1726-1749)."""
    scale_upper0 = float(((bound_max - bound_min) / voxel_size).max())

    def search(upper, lower, pts):
        while True:
            scale = (upper + lower) / 2
            uniq = np.unique(np.round(pts / voxel_size / scale), axis=0) \
                * voxel_size * scale
            ratio = uniq.shape[0] / pts.shape[0]
            if abs(ratio - target_ratio) < 0.01 or abs(upper - lower) < 1:
                return scale, uniq
            if ratio < target_ratio:
                upper = scale
            else:
                lower = scale

    pts = np.asarray(anchors, dtype=np.float64)
    scales = []
    lower = 1.0
    upper = scale_upper0
    for _ in range(level_num - 1):
        scale, pts = search(upper, lower, pts)
        lower = scale
        scales.append(float(scale))
    return scales
