"""Tile-instance expansion and depth sort, static-shape XLA.

The CUDA reference duplicates each gaussian into one instance per touched tile,
radix-sorts by (tile | depth) keys, then finds per-tile ranges. Here the same
structure is built with static shapes: a global instance *budget* B replaces
dynamic allocation. Each instance slot s ∈ [0,B) maps to its gaussian through
the exclusive prefix sum of per-gaussian tile counts, so a single gaussian may
own arbitrarily many slots (no per-gaussian cap — large splats early in
training are handled exactly). Slots beyond the true total get a sentinel tile
id and sort to the end.

Performance rules this file is built around (device-lane timings at 1M
instances / 200k gaussians on TPU):
- scalar gathers cost ~10 ns/element and row gathers ~3-9 ns/row — both
  serial-index-bound — while a sort PAYLOAD costs only ~0.45 ms per 1M-element
  operand. Every reordering therefore rides a sort payload instead of a
  gather: the depth sort carries the bit-packed rect geometry and the gaussian
  index; the tile sort carries the depth rank.
- scalar scatters cost ~1.8 ms per 200k indices regardless of payload width,
  so the three per-slot forward fills (rank, rect geometry, segment offset)
  are bit-packed into TWO int32 scatter+cumsum words (fields never borrow:
  every field-wise partial sum is a true nonnegative in-range value).
- 1M-element 1D cumsums are ~0.2 ms — effectively free next to everything
  above.
- int32 division lowers to a long scalar routine; `k // rect_w` is computed
  in f32 (exact: both operands < 2^15, quotient error < 1/rect_w).

Sort strategy (two-phase, cheaper than one big multi-key sort):
1. ONE stable sort of the G gaussians by view depth (G ≪ B) with the rect
   geometry (bit-packed u32) and gaussian index as payloads — no post-sort
   gathers;
2. expand instances — now already globally depth-ordered — and sort by tile id
   with the slot index in the low key bits and the depth rank as payload.
   Stability (slot order = depth order) preserves depth order within each
   tile, matching the CUDA (tile | depth) radix order with gaussian-index
   tie-break.

After sorting, instances are re-scattered so every tile's segment is padded to
a multiple of `align` (the Pallas chunk size): all kernel DMA offsets become
chunk-aligned and no chunk ever crosses a segment boundary, which both
satisfies Mosaic's lane-alignment rules and makes backward gradient writes
disjoint across tiles. The aligned table stores `rank_aligned` (the depth RANK
of each aligned position, sentinel G for pads): the splat-state pack is then a
single row gather from the [G,·] table (rank → rows), and the backward pass
reduces per-gaussian gradients with one cumsum + two boundary row-gathers over
`seg_bounds` (contiguous per gaussian in depth order) instead of a giant
colliding scatter-add.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from contextgs_tpu.ops.rasterize.projection import ProjectedGaussians


class TileInstances(NamedTuple):
    rank_aligned: jnp.ndarray  # [B_pad] int32 depth rank per aligned position
                               # (sentinel G for pad/overflow slots)
    src_slot: jnp.ndarray      # [B_pad] int32 depth-order slot per aligned
                               # position (sentinel `budget` for pad slots)
    rank_slot: jnp.ndarray     # [B] int32 depth rank per depth-order slot
                               # (sentinel G for slots past the true total)
    gauss_ids: jnp.ndarray     # [B_pad] int32 gaussian index per aligned slot
    tile_ids: jnp.ndarray      # [B_pad] int32 tile id (sentinel n_tiles for pads)
    tile_bounds: jnp.ndarray   # [n_tiles+1] int32 aligned segment boundaries
    valid: jnp.ndarray         # [B_pad] bool
    total: jnp.ndarray         # [] int32 number of VALID instances — clamped
                               # to the budget (slot validity derives from it)
    demand: jnp.ndarray        # [] int32 pre-clamp instance count: the true
                               # demand, may exceed the budget (watermark)
    overflowed: jnp.ndarray    # [] bool — budget exceeded, tail instances dropped
    perm: jnp.ndarray          # [B] int32 depth-order slot → aligned position
                               # (b_pad for dropped/pad slots)
    order: jnp.ndarray         # [G] int32 depth rank → gaussian index
    inv_order: jnp.ndarray     # [G] int32 gaussian index → depth rank
    seg_bounds: jnp.ndarray    # [G+1] int32 prefix sum of per-depth-rank tile
                               # counts (slot ranges in depth order, pre-cap)
    n_vis: jnp.ndarray         # [] int32 gaussians with >=1 tile; the depth
                               # sort puts exactly these at ranks [0, n_vis)


def default_slack(n_tiles: int, align: int) -> int:
    """Alignment-padding headroom of the instance table.

    Worst-case per-tile alignment waste is align-1; the EXPECTED waste is
    (align-1)/2 (segment lengths uniform mod align), with fluctuation that is
    tiny relative to the mean at realistic tile counts (thousands of tiles).
    5/8·align covers mean + a wide margin while keeping the static table ~20%
    smaller than the worst case — every downstream gather/transpose/cumsum
    scales with it. Overflow is detected exactly and reacted to host-side
    (train/loop.py doubles the budget and re-jits).

    At SMALL tile counts (multi-chip bands, small images) the fluctuation is
    NOT tiny — at ~4 occupied tiles 5/8·align sits only ~1.7σ above the mean
    waste, so slack overflow could fire non-pathologically; there the full
    worst case is cheap anyway, so use it and make overflow mean what it says
    (instances genuinely exceeded the budget)."""
    if n_tiles <= 512:
        return n_tiles * align
    return -(-(n_tiles * align * 5 // 8) // align) * align


def padded_size(budget: int, n_tiles: int, align: int,
                slack: int | None = None) -> int:
    """Static size of the aligned instance table."""
    if slack is None:
        slack = default_slack(n_tiles, align)
    return budget + min(slack, n_tiles * align)


def expand_and_sort(proj: ProjectedGaussians, tiles_x: int, tiles_y: int,
                    budget: int, align: int = 256,
                    tile_row_offset: int = 0,
                    slack: int | None = None) -> TileInstances:
    """Build the sorted, segment-aligned tile-instance table (static shapes).

    With `tile_row_offset`, tile ids are local to a horizontal band starting
    at that tile row (rects must already be band-clamped by the projection)."""
    n_tiles = tiles_x * tiles_y
    G = proj.n_tiles.shape[0]

    wx = max(tiles_x - 1, 1).bit_length()      # rmin_x < tiles_x
    wy = max(tiles_y - 1, 1).bit_length()      # band-local rmin_y < tiles_y
    ww = max(tiles_x, 1).bit_length()          # 1 ≤ rect_w ≤ tiles_x
    wc = max(n_tiles, 1).bit_length()          # counts ≤ n_tiles

    # --- phase 1: depth-order the gaussians (culled ones sort last) with the
    # rect geometry riding as sort payloads — no post-sort gathers ---
    dkey = jnp.where(proj.n_tiles > 0, proj.depths, jnp.inf)
    iota_g = jnp.arange(G, dtype=jnp.int32)
    b_rmx = proj.rect_min[:, 0]
    b_rmy = proj.rect_min[:, 1] - tile_row_offset
    b_rw = jnp.maximum(proj.rect_max[:, 0] - b_rmx, 1)
    b_cnt = proj.n_tiles.astype(jnp.int32)
    if wx + wy + ww + wc <= 32:
        u = jnp.uint32
        gpack = (b_rmx.astype(u) | (b_rmy.astype(u) << wx)
                 | (b_rw.astype(u) << (wx + wy))
                 | (b_cnt.astype(u) << (wx + wy + ww)))
        _, gpack_s, order = jax.lax.sort((dkey, gpack, iota_g),
                                         num_keys=1, is_stable=True)
        rmin_x = (gpack_s & ((1 << wx) - 1)).astype(jnp.int32)
        rmin_y = ((gpack_s >> wx) & ((1 << wy) - 1)).astype(jnp.int32)
        rect_w = ((gpack_s >> (wx + wy)) & ((1 << ww) - 1)).astype(jnp.int32)
        counts = (gpack_s >> (wx + wy + ww)).astype(jnp.int32)
    else:                                      # huge images: gather fallback
        order = jnp.argsort(dkey, stable=True).astype(jnp.int32)
        counts = b_cnt[order]
        rmin_x = b_rmx[order]
        rmin_y = b_rmy[order]
        rect_w = b_rw[order]

    # per-gaussian rect geometry (the names below are rebound to per-slot
    # fills further down; the bounds histogram needs the [G] views)
    g_rmx, g_rmy, g_rw = rmin_x, rmin_y, rect_w
    incl = jnp.cumsum(counts)                                  # inclusive
    offsets = (incl - counts).astype(jnp.int32)                # exclusive
    seg_bounds = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  incl.astype(jnp.int32)])
    demand = incl[-1].astype(jnp.int32) if G > 0 else jnp.int32(0)
    overflowed = demand > budget
    total = jnp.minimum(demand, budget)

    slots = jnp.arange(budget, dtype=jnp.int32)
    valid = slots < total

    def ffill(vals):
        """Per-slot forward fill of a per-depth-rank value: scatter value
        deltas at segment-head slots, cumsum. Zero-count ranks collide on one
        head slot and their deltas telescope; ranks whose head is past the
        budget are dropped (their slots don't exist).

        The barrier keeps the delta/bit-pack producer chain OUT of the
        scatter fusion: fused in, XLA recomputes it per scattered element on
        the scalar unit (~1.7 ms per word at 200k heads, measured round 3);
        materialized first, the scatter+cumsum pair costs ~0.27 ms."""
        d = vals - jnp.concatenate([jnp.zeros((1,), vals.dtype), vals[:-1]])
        d = jax.lax.optimization_barrier(d)
        heads = jnp.zeros((budget,), vals.dtype).at[offsets].add(
            d, mode="drop", indices_are_sorted=True)
        return jnp.cumsum(heads)

    # three per-slot fills (depth rank; rect geometry; segment offset),
    # bit-packed into TWO scatter+cumsum words when the fields fit 31 bits.
    # Packing is sound because each field's partial sums are its true values,
    # always nonnegative and in-range, so no cross-field borrows occur.
    wr = max(1, (G - 1).bit_length()) if G > 0 else 1   # rank < G
    wo = max(1, (budget - 1).bit_length())              # offset < budget
    # greedy first-fit of the five fields into as few 31-bit words as the
    # widths allow (2 at bench scale; 3 once wr+wo grow past ~40 bits at
    # reference scene scale, where the packed pair no longer fits). Scatters
    # are index-serial (~8 ns/head) so each saved word is ~8 ms/iter at 1M
    # gaussians; the shifts/ors are vector-cheap.
    fields = [("rank", iota_g, wr), ("off_fill", offsets, wo),
              ("rect_w", rect_w, ww), ("rmin_y", rmin_y, wy),
              ("rmin_x", rmin_x, wx)]
    words: list = []          # each: list of (name, value, width)
    for f in fields:
        for wd in words:
            if sum(x[2] for x in wd) + f[2] <= 31:
                wd.append(f)
                break
        else:
            words.append([f])
    unpacked: dict = {}
    for wd in words:
        packed_val = jnp.zeros_like(iota_g)
        shift = 0
        for name, val, width in reversed(wd):   # low bits = last field
            packed_val = packed_val | (val << shift)
            shift += width
        filled = ffill(packed_val)
        shift = 0
        for name, val, width in reversed(wd):
            # dtype-pinned shift: under jax_enable_x64 a python-int literal
            # promotes to int64 and shift_right_logical rejects the mix
            # (x64 is only used by the CPU f64 oracle path in tests)
            unpacked[name] = (jax.lax.shift_right_logical(
                filled, jnp.asarray(shift, filled.dtype))
                              & ((1 << width) - 1))
            shift += width
    rank = unpacked["rank"]
    rect_w = unpacked["rect_w"]
    rmin_y = unpacked["rmin_y"]
    off_fill = unpacked["off_fill"]
    rmin_x = unpacked["rmin_x"]
    rank = jnp.where(valid, jnp.clip(rank, 0, max(G - 1, 0)), G)
    rect_w = jnp.maximum(rect_w, 1)

    k = slots - off_fill                                       # index in rect
    if n_tiles < (1 << 15):
        # f32 division is exact here: k < counts ≤ n_tiles < 2^15 and
        # 1 ≤ rect_w ≤ tiles_x ≤ 2^8, so the roundoff of the single-rounded
        # quotient (≤ ulp(2^15)/2 = 2^-9) never crosses the 1/rect_w ≥ 2^-8
        # gap below the next integer; int div would lower to a scalar routine
        ty = (k.astype(jnp.float32) / rect_w.astype(jnp.float32)
              ).astype(jnp.int32)
    else:
        ty = k // rect_w
    tx = k - ty * rect_w
    tile = (rmin_y + ty) * tiles_x + rmin_x + tx
    tile = jnp.where(valid, tile, n_tiles).astype(jnp.int32)

    # raw per-tile segment lengths. Preferred path: one MXU matmul histogram —
    # counts[ty,tx] = Σ_g cover_y[g,ty]·cover_x[g,tx] over the separable rect
    # indicators (exact in bf16: 0/1 operands are exactly representable and
    # the f32 accumulator is exact below 2^24). A searchsorted over the sorted
    # [B] tile array costs ~8 ms at 1M instances; the matmul is ~0.3 ms at
    # 200k gaussians and needs nothing from the tile sort — which lets the
    # sort itself produce the segment-ALIGNED table directly (fillers below).
    # Budget overflow is handled exactly: gaussians whose instances all fit
    # contribute their full rect, the single straddling gaussian
    # (offset < budget < incl) contributes its first `budget - offset`
    # row-major rect cells via a tiny elementwise grid.
    # histogram path: the bf16 cover matrices cost G·(tiles_x+tiles_y)·2
    # bytes each — ~0.9 GB apiece at the cap below (v5e HBM is 16 GB), and
    # the matmul is ~7 GFLOP/Mgaussian (tens of µs). The searchsorted
    # fallback costs ~10x the whole sort stage at reference scene scale
    # (measured 247 ms/iter e2e at 1M gaussians before this cap was raised),
    # so prefer the histogram far beyond the original conservative cap.
    # the raised cap is TPU-sized (16 GB HBM); CPU/dev runs near it would
    # allocate multi-GB host buffers where the searchsorted fallback is safer
    hist_cap = (448 << 20) if jax.default_backend() == "tpu" else (48 << 20)
    use_hist = G > 0 and G * (tiles_x + tiles_y) <= hist_cap
    if use_hist:
        rect_h = (counts.astype(jnp.float32) / g_rw.astype(jnp.float32)
                  ).astype(jnp.int32)       # exact: counts = rect_w·rect_h
        full = incl <= budget
        iy = jnp.arange(tiles_y, dtype=jnp.int32)
        ix = jnp.arange(tiles_x, dtype=jnp.int32)
        h_eff = jnp.where(full, rect_h, 0)
        w_eff = jnp.where(counts > 0, g_rw, 0)
        cov_y = ((iy[None, :] >= g_rmy[:, None])
                 & (iy[None, :] < (g_rmy + h_eff)[:, None])
                 ).astype(jnp.bfloat16)                        # [G, tiles_y]
        cov_x = ((ix[None, :] >= g_rmx[:, None])
                 & (ix[None, :] < (g_rmx + w_eff)[:, None])
                 ).astype(jnp.bfloat16)                        # [G, tiles_x]
        cnt2d = jax.lax.dot_general(
            cov_y, cov_x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [tiles_y, tiles_x]
        s = jnp.argmax(incl > budget)                  # straddler (if any)
        r_part = jnp.where(overflowed,
                           budget - (incl[s] - counts[s]), 0)
        sx, sy, sw = g_rmx[s], g_rmy[s], g_rw[s]
        k2d = (iy[:, None] - sy) * sw + (ix[None, :] - sx)
        part = ((ix[None, :] >= sx) & (ix[None, :] < sx + sw)
                & (k2d >= 0) & (k2d < r_part)).astype(jnp.int32)
        seg_len = (cnt2d.astype(jnp.int32) + part).reshape(n_tiles)
    b_pad = padded_size(budget, n_tiles, align, slack)
    n_fill = n_tiles * align
    # the sort below pads every tile to a full `align` multiple (worst case),
    # but the STATIC aligned table keeps only `slack` padding headroom: the
    # sorted prefix [:b_pad] is kept, the tail dropped. If real instances
    # spill past b_pad (pathological alignment waste), flag overflow — the
    # host reacts exactly like a budget overflow (clamped bounds stay
    # chunk-aligned, so kernels just see truncated trailing tiles).
    b_full = budget + n_fill

    if use_hist:
        # --- phase 2, aligned-by-construction: segment lengths are known
        # BEFORE the sort, so sorting `pad_needed(t)` filler entries per tile
        # (key: tile t, slot past every real slot) right along with the real
        # instances yields the segment-aligned table straight out of the sort
        # — no searchsorted, no pad-shift fills, no [B]→[B_pad] scatter
        # (~5 ms at 1M instances). Fillers beyond a tile's need go to the
        # sentinel tile and land in the unused tail past bounds[-1].
        pad_len = ((seg_len + align - 1) // align) * align
        bounds = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  jnp.cumsum(pad_len).astype(jnp.int32)])
        overflowed = overflowed | (bounds[-1] > b_pad)
        bounds = jnp.minimum(bounds, b_pad)
        pad_needed = pad_len - seg_len                         # [n_tiles], <align
        f_keep = (jax.lax.broadcasted_iota(jnp.int32, (n_tiles, align), 1)
                  < pad_needed[:, None])
        f_tile = jnp.where(
            f_keep,
            jax.lax.broadcasted_iota(jnp.int32, (n_tiles, align), 0),
            n_tiles).reshape(n_fill)
        # filler slot value = `budget` sorts after every real slot (< budget)
        bits_slot = max(1, budget.bit_length())
        if ((n_tiles << bits_slot) | budget) < 2 ** 32:
            key = jnp.concatenate([
                (tile.astype(jnp.uint32) << bits_slot)
                | slots.astype(jnp.uint32),
                (f_tile.astype(jnp.uint32) << bits_slot)
                | jnp.uint32(budget)])
            rank_ext = jnp.concatenate([rank, jnp.full((n_fill,), G,
                                                       jnp.int32)])
            # unstable: real keys are unique (tile|slot) and filler ties all
            # carry identical payloads — a stable sort would make XLA thread
            # a third iota operand through the whole sort (~1 ms at 1.25M)
            key_s, out_rank = jax.lax.sort((key, rank_ext), num_keys=1,
                                           is_stable=False)
            src_sorted = (key_s & ((1 << bits_slot) - 1)).astype(jnp.int32)
        else:
            tile_ext = jnp.concatenate([tile, f_tile])
            slot_ext = jnp.concatenate(
                [slots, jnp.full((n_fill,), budget, jnp.int32)])
            rank_ext = jnp.concatenate([rank, jnp.full((n_fill,), G,
                                                       jnp.int32)])
            _, src_sorted, out_rank = jax.lax.sort(
                (tile_ext, slot_ext, rank_ext), num_keys=2)

        # depth-order slot → aligned position: every real slot appears exactly
        # once in src_sorted (fillers carry the sentinel `budget` and sort
        # last within the value), so a 2-operand sort inverts it. The aligned
        # table is the PREFIX [:b_pad] of the full sorted stream, so full-
        # stream positions < b_pad stay valid; dropped slots → sentinel b_pad
        # (zero gradient row). Lazy: DCE'd unless the consumer needs it.
        # unstable: values 0..budget-1 are unique; ties exist only among the
        # sentinel fillers, whose positions are sliced away below
        pos_sorted = jax.lax.sort(
            (src_sorted, jnp.arange(b_full, dtype=jnp.int32)), num_keys=1,
            is_stable=False)[1]
        perm = jnp.minimum(pos_sorted[:budget], b_pad)

        out_rank = out_rank[:b_pad]
        out_valid = out_rank < G
        out_src = jnp.minimum(src_sorted[:b_pad], budget)
    else:
        # --- phase 2 fallback (huge scenes: the cover matrices of the
        # histogram would not fit): sort reals only, recover bounds with a
        # searchsorted, then scatter into aligned positions.
        bits_slot = max(1, (budget - 1).bit_length())
        if (n_tiles << bits_slot) | (budget - 1) < 2 ** 32:
            key = (tile.astype(jnp.uint32) << bits_slot
                   ) | slots.astype(jnp.uint32)
            key_s, rank_s = jax.lax.sort((key, rank), num_keys=1)
            tile_s = (key_s >> bits_slot).astype(jnp.int32)
            src_slot = (key_s & ((1 << bits_slot) - 1)).astype(jnp.int32)
        else:
            tile_s, src_slot, rank_s = jax.lax.sort((tile, slots, rank),
                                                    num_keys=1)
        raw_bounds = jnp.searchsorted(
            tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        seg_len = raw_bounds[1:] - raw_bounds[:-1]             # [n_tiles]
        pad_len = ((seg_len + align - 1) // align) * align
        bounds = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  jnp.cumsum(pad_len).astype(jnp.int32)])
        overflowed = overflowed | (bounds[-1] > b_pad)
        # aligned_pos = sorted_pos + accumulated pad of earlier segments; the
        # per-sorted-slot pad shift is a forward fill from tile boundaries
        delta = bounds[:-1] - raw_bounds[:-1]                  # [n_tiles]
        bounds = jnp.minimum(bounds, b_pad)
        dd = delta - jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                      delta[:-1]])
        shift = jnp.zeros((budget,), jnp.int32).at[raw_bounds[:-1]].add(
            dd, mode="drop", indices_are_sorted=True)
        src_valid = tile_s < n_tiles
        new_pos = jnp.where(src_valid, slots + jnp.cumsum(shift), b_pad)

        # ONE scalar scatter spreads the depth rank into the aligned table;
        # the pack step is then a single [B_pad] row gather from the [G,·]
        # splat rows (sentinel G hits an appended zero row). Positions past
        # b_pad (slack overflow) are dropped — flagged above.
        out_rank = jnp.full((b_pad,), G, jnp.int32).at[new_pos].set(
            rank_s, mode="drop")
        out_valid = out_rank < G

        # depth-order slot → aligned position, sort-based inversion. Lazy.
        _, perm = jax.lax.sort(
            (src_slot, jnp.minimum(new_pos, b_pad)), num_keys=1)

        # aligned src_slot table (lazy): scatter like out_rank
        out_src = jnp.full((b_pad,), budget, jnp.int32).at[new_pos].set(
            src_slot, mode="drop")

    # gaussian → depth rank (inverse of `order`), same sort-based inversion;
    # lets the backward GATHER per-gaussian gradients instead of scattering
    # them (scatters cost ~2x a gather of the same index count). Lazy.
    _, inv_order = jax.lax.sort((order, iota_g), num_keys=1, is_stable=False)

    # tile id per aligned slot, derived from bounds (no second scatter): the
    # unused tail past bounds[-1] lands on the sentinel n_tiles automatically
    tile_heads = jnp.zeros((b_pad,), jnp.int32).at[bounds[1:]].add(
        1, mode="drop", indices_are_sorted=True)
    out_tile = jnp.cumsum(tile_heads)
    out_tile = jnp.where(out_valid, out_tile, n_tiles).astype(jnp.int32)

    # gaussian id per aligned slot (lazy, scalar gather; hot path never reads
    # it so XLA dead-code-eliminates this)
    order_ext = jnp.concatenate([order, jnp.zeros((1,), jnp.int32)])
    out_gauss = order_ext[jnp.minimum(out_rank, G)]

    return TileInstances(rank_aligned=out_rank, src_slot=out_src,
                         rank_slot=rank, gauss_ids=out_gauss,
                         tile_ids=out_tile, tile_bounds=bounds,
                         valid=out_valid, total=total, demand=demand,
                         overflowed=overflowed,
                         perm=perm, order=order, inv_order=inv_order,
                         seg_bounds=seg_bounds,
                         n_vis=jnp.sum(b_cnt > 0).astype(jnp.int32))
