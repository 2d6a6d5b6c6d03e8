"""Pure-JAX reference rasterizer: golden model for the Pallas kernels.

Tile-segmented O(B·PIX) formulation — every sorted tile-instance against the
256 pixels of ITS OWN tile (an instance never touches other tiles, exactly as
in the CUDA reference's per-tile lists). The per-pixel front-to-back
transmittance recurrence runs in log space over the tile-sorted instance
axis, segmented at tile boundaries by subtracting the segment-head prefix —
identical semantics to the dense [B,H,W] formulation this replaces, but 16×
less memory traffic at 64×64 (it used to be the CPU-parity-run bottleneck:
~11 s/iter at a 37k-slot table against 4096 pixels).

Fully differentiable by autodiff, which makes it the gradient oracle for the
custom-VJP Pallas kernels (golden tests assert fwd/bwd agreement).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from contextgs_tpu.ops.rasterize.common import (T_EPS, alpha_from_power,
                                                gaussian_power)
from contextgs_tpu.ops.rasterize.projection import ProjectedGaussians
from contextgs_tpu.ops.rasterize.sorting import TileInstances


def blend_reference(
    proj: ProjectedGaussians,
    inst: TileInstances,
    colors: jnp.ndarray,        # [G,3]
    opacities: jnp.ndarray,     # [G]
    width: int,
    height: int,
    tile_size: int = 16,
    bg: jnp.ndarray | None = None,
    tile_row_offset: int = 0,
    band_height: int | None = None,
    t_eps: float = T_EPS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (image [3,H,W], final transmittance [H,W]); with a tile band,
    H is the band height and pixel rows start at tile_row_offset·tile_size.

    `t_eps` overrides the early-termination threshold — golden tests scale it
    ±δ to build a gradient envelope that bounds threshold-flip discrepancy
    between this oracle and the Pallas kernels (borderline instances at
    T·(1−α)≈T_EPS legitimately differ between any two f32 evaluation
    orders)."""
    tiles_x = (width + tile_size - 1) // tile_size
    y0 = tile_row_offset * tile_size
    if band_height is None:
        band_height = height - y0
    band_rows = -(-band_height // tile_size)
    n_tiles = inst.tile_bounds.shape[0] - 1
    pix = tile_size * tile_size

    g = inst.gauss_ids                                     # [B]
    mean2d = proj.means2d[g]                               # [B,2]
    conic = proj.conics[g]                                 # [B,3]
    col = colors[g]                                        # [B,3]
    opac = opacities[g]                                    # [B]
    B = g.shape[0]

    valid = inst.valid & (inst.tile_ids < n_tiles)         # [B]
    t_of = jnp.minimum(inst.tile_ids, n_tiles - 1)
    # pixel coordinates of each instance's OWN tile [B, pix]
    k = jnp.arange(pix, dtype=jnp.int32)[None, :]
    base_x = (t_of % tiles_x) * tile_size
    base_y = (t_of // tiles_x + tile_row_offset) * tile_size
    PX = (base_x[:, None] + k % tile_size).astype(jnp.float32)
    PY = (base_y[:, None] + k // tile_size).astype(jnp.float32)

    dx = mean2d[:, 0, None] - PX                           # [B, pix]
    dy = mean2d[:, 1, None] - PY
    power = gaussian_power(dx, dy, conic[:, 0, None], conic[:, 1, None],
                           conic[:, 2, None])
    alpha = alpha_from_power(power, opac[:, None])
    alpha = jnp.where(valid[:, None], alpha, 0.0)

    heads = inst.tile_bounds[t_of]                         # [B] segment head row
    # segment-LOCAL accumulation via a segmented associative scan (reset at
    # each tile's head row): a global cumsum minus the head's prefix loses
    # precision at large B — late segments subtract two large near-equal
    # f32 prefixes, and borderline T·(1−α)≈T_EPS inclusion decisions then
    # flip vs the Pallas kernels (which restart their log prefix every
    # chunk). The segmented scan never accumulates across segments, so its
    # error is bounded by the segment length alone.
    is_head = (jnp.arange(B, dtype=heads.dtype) == heads)[:, None]
    head_b = jnp.broadcast_to(is_head, (B, pix))

    def seg_T(alpha):
        """Per-(instance, pixel) transmittance BEFORE the instance, within
        its tile segment: exp of the segment-local exclusive log-prefix."""
        lg = jnp.log1p(-alpha)                             # [B, pix] ≤ 0

        def op(l, r):
            al, fl = l
            ar, fr = r
            return jnp.where(fr, ar, al + ar), fl | fr

        incl, _ = jax.lax.associative_scan(op, (lg, head_b), axis=0)
        return jnp.exp(incl - lg), lg                      # exclusive prefix

    # early-termination prefix: include while T·(1−α) ≥ T_EPS, then recompute
    # the recurrence with excluded instances' alpha zeroed (two passes, same
    # as the dense formulation / the Pallas kernels)
    T1, _ = seg_T(alpha)
    include = T1 * (1.0 - alpha) >= t_eps
    alpha = jnp.where(include, alpha, 0.0)
    T, lg = seg_T(alpha)
    w = alpha * T                                          # [B, pix]

    seg_ids = jnp.where(valid, t_of, n_tiles)              # pads → dump row
    image_t = jnp.stack([
        jax.ops.segment_sum(col[:, c, None] * w, seg_ids,
                            num_segments=n_tiles + 1)[:n_tiles]
        for c in range(3)])                                # [3, n_tiles, pix]
    total_lg = jax.ops.segment_sum(lg, seg_ids,
                                   num_segments=n_tiles + 1)[:n_tiles]
    final_t_t = jnp.exp(total_lg)                          # [n_tiles, pix]

    def untile(x):                                         # [..., n_tiles, pix]
        x = x.reshape(x.shape[:-2] + (band_rows, tiles_x, tile_size, tile_size))
        x = jnp.swapaxes(x, -3, -2)
        x = x.reshape(x.shape[:-4] + (band_rows * tile_size,
                                      tiles_x * tile_size))
        return x[..., :band_height, :width]

    image = untile(image_t)
    final_t = untile(final_t_t)
    if bg is not None:
        image = image + final_t[None] * bg[:, None, None]
    return image, final_t
