"""Tile-instance expansion and depth sort, static-shape XLA.

The CUDA reference duplicates each gaussian into one instance per touched tile,
radix-sorts by (tile | depth) keys, then finds per-tile ranges. Here the same
structure is built with static shapes: a global instance *budget* B replaces
dynamic allocation. Each instance slot s ∈ [0,B) maps to its gaussian through a
searchsorted over the exclusive prefix sum of per-gaussian tile counts, so a
single gaussian may own arbitrarily many slots (no per-gaussian cap — large
splats early in training are handled exactly). Slots beyond the true total get
a sentinel tile id and sort to the end.

Sort: `jax.lax.sort` with 2 lexicographic keys (tile id, depth) — a stable XLA
sort matching the CUDA order (depth ascending within tile, gaussian index as
tie-break via stability).

After sorting, instances are re-scattered so every tile's segment is padded to
a multiple of `align` (the Pallas chunk size): all kernel DMA offsets become
chunk-aligned and no chunk ever crosses a segment boundary, which both
satisfies Mosaic's lane-alignment rules and makes backward gradient writes
disjoint across tiles. Padded slots have valid=False and are neutralized by
forcing their opacity to zero at pack time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from contextgs_tpu.ops.rasterize.projection import ProjectedGaussians


class TileInstances(NamedTuple):
    gauss_ids: jnp.ndarray     # [B_pad] int32 gaussian index per aligned slot
    tile_ids: jnp.ndarray      # [B_pad] int32 tile id (sentinel n_tiles for pad slots)
    tile_bounds: jnp.ndarray   # [n_tiles+1] int32 aligned segment boundaries
    valid: jnp.ndarray         # [B_pad] bool
    total: jnp.ndarray         # [] int32 true number of instances (pre-align)
    overflowed: jnp.ndarray    # [] bool — budget exceeded, tail instances dropped


def padded_size(budget: int, n_tiles: int, align: int) -> int:
    """Static size of the aligned instance table."""
    return budget + n_tiles * align


def expand_and_sort(proj: ProjectedGaussians, tiles_x: int, tiles_y: int,
                    budget: int, align: int = 256,
                    tile_row_offset: int = 0) -> TileInstances:
    """Build the sorted, segment-aligned tile-instance table (static shapes).

    With `tile_row_offset`, tile ids are local to a horizontal band starting
    at that tile row (rects must already be band-clamped by the projection)."""
    n_tiles = tiles_x * tiles_y
    counts = proj.n_tiles.astype(jnp.int32)                    # [G]
    offsets = jnp.cumsum(counts) - counts                      # exclusive prefix sum
    total = offsets[-1] + counts[-1] if counts.shape[0] > 0 else jnp.int32(0)
    total = jnp.minimum(total, budget)

    slots = jnp.arange(budget, dtype=jnp.int32)
    # slot → gaussian: last g with offsets[g] <= s. Equivalent to
    # searchsorted(offsets, slots, 'right')-1 but via scatter-add + cumsum —
    # XLA lowers vectorized searchsorted to a gather-heavy binary-search loop
    # that costs ~300ms at 2M slots on TPU, vs ~10ms for this formulation.
    heads = jnp.zeros((budget,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.cumsum(heads) - 1
    g = jnp.clip(g, 0, max(counts.shape[0] - 1, 0))
    k = slots - offsets[g]                                     # tile index within rect
    valid = slots < total

    rect_w = jnp.maximum(proj.rect_max[g, 0] - proj.rect_min[g, 0], 1)
    ty = k // rect_w
    tx = k - ty * rect_w
    tile = ((proj.rect_min[g, 1] + ty - tile_row_offset) * tiles_x
            + proj.rect_min[g, 0] + tx)
    tile = jnp.where(valid, tile, n_tiles).astype(jnp.int32)
    depth = jnp.where(valid, proj.depths[g], jnp.inf).astype(jnp.float32)

    tile_s, _, gauss_s = jax.lax.sort((tile, depth, g), num_keys=2)

    # raw per-tile boundaries, then align each segment length up to `align`
    raw_bounds = jnp.searchsorted(
        tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    seg_len = raw_bounds[1:] - raw_bounds[:-1]                 # [n_tiles]
    pad_len = ((seg_len + align - 1) // align) * align
    bounds = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(pad_len).astype(jnp.int32)])

    b_pad = padded_size(budget, n_tiles, align)
    # scatter sorted slots to their aligned positions (pads stay at segment end)
    src_valid = tile_s < n_tiles
    new_pos = jnp.where(
        src_valid,
        bounds[jnp.clip(tile_s, 0, n_tiles - 1)] +
        (jnp.arange(budget, dtype=jnp.int32) - raw_bounds[jnp.clip(tile_s, 0, n_tiles - 1)]),
        b_pad)                                                 # dropped
    out_gauss = jnp.zeros((b_pad,), jnp.int32).at[new_pos].set(
        gauss_s, mode="drop")
    out_tile = jnp.full((b_pad,), n_tiles, jnp.int32).at[new_pos].set(
        tile_s, mode="drop")
    out_valid = jnp.zeros((b_pad,), bool).at[new_pos].set(
        src_valid, mode="drop")

    return TileInstances(gauss_ids=out_gauss, tile_ids=out_tile,
                         tile_bounds=bounds, valid=out_valid, total=total,
                         overflowed=(offsets[-1] + counts[-1]) > budget)
