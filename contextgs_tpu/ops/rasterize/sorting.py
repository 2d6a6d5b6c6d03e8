"""Tile-instance expansion and depth sort, static-shape XLA.

The CUDA reference duplicates each gaussian into one instance per touched tile,
radix-sorts by (tile | depth) keys, then finds per-tile ranges. Here the same
structure is built with static shapes: a global instance *budget* B replaces
dynamic allocation. Each instance slot s ∈ [0,B) maps to its gaussian through
the exclusive prefix sum of per-gaussian tile counts, so a single gaussian may
own arbitrarily many slots (no per-gaussian cap — large splats early in
training are handled exactly). Slots beyond the true total get a sentinel tile
id and sort to the end.

Performance rules this file is built around (measured on TPU):
- a 1M-element *scalar* gather (`x[idx]`) costs ~10 ms (≈10 ns/element — XLA
  lowers it to serial scalar loads), while a 1M `cumsum` costs ~0.15 ms and a
  [1M, 9] *row* gather ~3 ms (rows ride the (8,128) vector layout);
- therefore every per-slot `x[gi]` lookup is expressed as a *forward fill*:
  scatter per-gaussian value deltas at segment-head slots, then cumsum. The
  three rect fields are bit-packed into one int32 word so one scatter+cumsum
  fills all three (field-wise partial sums are the true nonnegative values,
  so no cross-field borrows occur);
- sorts are cheap (~1 ms for 1M keys): the tile sort packs (tile, slot) into
  ONE uint32 key with no payloads, and the inverse permutation `perm` is
  produced by a second 2-operand sort instead of a 1M scatter.

Sort strategy (two-phase, cheaper than one big multi-key sort):
1. argsort the G gaussians by view depth (G ≪ B), gather their rects into
   depth order;
2. expand instances — now already globally depth-ordered — and sort by tile id
   with the slot index in the low key bits. Stability (slot order = depth
   order) preserves depth order within each tile, matching the CUDA
   (tile | depth) radix order with gaussian-index tie-break.

After sorting, instances are re-scattered so every tile's segment is padded to
a multiple of `align` (the Pallas chunk size): all kernel DMA offsets become
chunk-aligned and no chunk ever crosses a segment boundary, which both
satisfies Mosaic's lane-alignment rules and makes backward gradient writes
disjoint across tiles. The aligned table stores `src_slot` (the depth-order
slot of each aligned position, sentinel `budget` for pads); the splat-state
pack is then two *row* gathers (depth-rank → rows, aligned-pos → rows) and the
backward pass reduces per-gaussian gradients with one cumsum + two boundary
row-gathers over `seg_bounds` (contiguous per gaussian in depth order) instead
of a giant colliding scatter-add.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from contextgs_tpu.ops.rasterize.projection import ProjectedGaussians


class TileInstances(NamedTuple):
    src_slot: jnp.ndarray      # [B_pad] int32 depth-order slot per aligned
                               # position (sentinel `budget` for pad slots)
    rank_slot: jnp.ndarray     # [B] int32 depth rank per depth-order slot
                               # (sentinel G for slots past the true total)
    gauss_ids: jnp.ndarray     # [B_pad] int32 gaussian index per aligned slot
    tile_ids: jnp.ndarray      # [B_pad] int32 tile id (sentinel n_tiles for pads)
    tile_bounds: jnp.ndarray   # [n_tiles+1] int32 aligned segment boundaries
    valid: jnp.ndarray         # [B_pad] bool
    total: jnp.ndarray         # [] int32 true number of instances (pre-align)
    overflowed: jnp.ndarray    # [] bool — budget exceeded, tail instances dropped
    perm: jnp.ndarray          # [B] int32 depth-order slot → aligned position
                               # (b_pad for dropped/pad slots)
    order: jnp.ndarray         # [G] int32 depth rank → gaussian index
    seg_bounds: jnp.ndarray    # [G+1] int32 prefix sum of per-depth-rank tile
                               # counts (slot ranges in depth order, pre-cap)


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
    G = proj.n_tiles.shape[0]

    # --- phase 1: depth-order the gaussians (culled ones sort last) ---
    dkey = jnp.where(proj.n_tiles > 0, proj.depths, jnp.inf)
    order = jnp.argsort(dkey, stable=True).astype(jnp.int32)     # [G]
    counts = proj.n_tiles[order].astype(jnp.int32)
    rmin_x = proj.rect_min[order, 0]
    rmin_y = proj.rect_min[order, 1] - tile_row_offset
    rect_w = jnp.maximum(proj.rect_max[order, 0] - rmin_x, 1)

    incl = jnp.cumsum(counts)                                  # inclusive prefix sum
    offsets = (incl - counts).astype(jnp.int32)                # exclusive
    seg_bounds = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  incl.astype(jnp.int32)])
    total = incl[-1] if G > 0 else jnp.int32(0)
    overflowed = total > budget
    total = jnp.minimum(total, budget)

    slots = jnp.arange(budget, dtype=jnp.int32)
    valid = slots < total

    def ffill(vals):
        """Per-slot forward fill of a per-depth-rank value: scatter value
        deltas at segment-head slots, cumsum. Zero-count ranks collide on one
        head slot and their deltas telescope; ranks whose head is past the
        budget are dropped (their slots don't exist)."""
        d = vals - jnp.concatenate([jnp.zeros((1,), vals.dtype), vals[:-1]])
        heads = jnp.zeros((budget,), vals.dtype).at[offsets].add(
            d, mode="drop")
        return jnp.cumsum(heads)

    # depth rank per slot = fill of the rank index itself (sentinel G past
    # the true total)
    rank = ffill(jnp.arange(G, dtype=jnp.int32))
    rank = jnp.where(valid, jnp.clip(rank, 0, max(G - 1, 0)), G)

    # rect fields, bit-packed into one forward fill when they fit 31 bits
    wx = max(tiles_x - 1, 1).bit_length()      # rmin_x < tiles_x
    wy = max(tiles_y - 1, 1).bit_length()      # band-local rmin_y < tiles_y
    ww = max(tiles_x, 1).bit_length()          # 1 ≤ rect_w ≤ tiles_x
    if wx + wy + ww <= 31:
        geom = ffill(rmin_x | (rmin_y << wx) | (rect_w << (wx + wy)))
        rx = geom & ((1 << wx) - 1)
        ry = (geom >> wx) & ((1 << wy) - 1)
        rw = jnp.maximum(geom >> (wx + wy), 1)
    else:
        rx = ffill(rmin_x)
        ry = ffill(rmin_y)
        rw = jnp.maximum(ffill(rect_w), 1)

    k = slots - ffill(offsets)                                 # index within rect
    ty = k // rw
    tx = k - ty * rw
    tile = (ry + ty) * tiles_x + rx + tx
    tile = jnp.where(valid, tile, n_tiles).astype(jnp.int32)

    # --- phase 2: sort by tile, slot index in the low bits (stable ⇒ depth
    # order within each tile). Single uint32 key, no payloads, when it fits.
    bits_slot = max(1, (budget - 1).bit_length())
    if (n_tiles << bits_slot) | (budget - 1) < 2 ** 32:
        key = (tile.astype(jnp.uint32) << bits_slot) | slots.astype(jnp.uint32)
        key_s = jax.lax.sort(key)
        tile_s = (key_s >> bits_slot).astype(jnp.int32)
        src_slot = (key_s & ((1 << bits_slot) - 1)).astype(jnp.int32)
    else:
        tile_s, src_slot = jax.lax.sort((tile, slots), num_keys=1)

    # raw per-tile boundaries, then align each segment length up to `align`
    raw_bounds = jnp.searchsorted(
        tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    seg_len = raw_bounds[1:] - raw_bounds[:-1]                 # [n_tiles]
    pad_len = ((seg_len + align - 1) // align) * align
    bounds = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(pad_len).astype(jnp.int32)])

    b_pad = padded_size(budget, n_tiles, align)
    # aligned_pos = sorted_pos + accumulated pad of earlier segments; the
    # per-sorted-slot pad shift is itself a forward fill from tile boundaries
    delta = bounds[:-1] - raw_bounds[:-1]                      # [n_tiles]
    dd = delta - jnp.concatenate([jnp.zeros((1,), jnp.int32), delta[:-1]])
    shift = jnp.zeros((budget,), jnp.int32).at[raw_bounds[:-1]].add(
        dd, mode="drop")
    src_valid = tile_s < n_tiles
    new_pos = jnp.where(src_valid, slots + jnp.cumsum(shift), b_pad)

    out_src = jnp.full((b_pad,), budget, jnp.int32).at[new_pos].set(
        src_slot, mode="drop")
    out_valid = out_src < budget

    # depth-order slot → aligned position: src_slot is a permutation of
    # [0, budget), so invert it with a cheap 2-operand sort (a 1M scatter
    # costs ~5 ms; the sort ~1 ms)
    _, perm = jax.lax.sort(
        (src_slot, jnp.where(src_valid, new_pos, b_pad)), num_keys=1)

    # tile id per aligned slot, derived from bounds (no second scatter): the
    # unused tail past bounds[-1] lands on the sentinel n_tiles automatically
    tile_heads = jnp.zeros((b_pad,), jnp.int32).at[bounds[1:]].add(
        1, mode="drop")
    out_tile = jnp.cumsum(tile_heads)
    out_tile = jnp.where(out_valid, out_tile, n_tiles).astype(jnp.int32)

    # gaussian id per aligned slot — derived through two scalar gathers; the
    # Pallas path never reads it (row-gathers through src_slot/rank instead)
    # so XLA dead-code-eliminates this in the hot path
    rank_ext = jnp.concatenate([rank, jnp.full((1,), G, jnp.int32)])
    order_ext = jnp.concatenate([order, jnp.zeros((1,), jnp.int32)])
    out_gauss = order_ext[rank_ext[jnp.minimum(out_src, budget)]]

    return TileInstances(src_slot=out_src, rank_slot=rank, gauss_ids=out_gauss,
                         tile_ids=out_tile, tile_bounds=bounds,
                         valid=out_valid, total=total, overflowed=overflowed,
                         perm=perm, order=order, seg_bounds=seg_bounds)
