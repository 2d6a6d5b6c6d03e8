"""Pure-JAX reference rasterizer: golden model for the Pallas kernels.

O(B·P) dense formulation — every sorted tile-instance against every pixel —
so it is only for small scenes/tests, but it is *exactly* the tile pipeline's
semantics: same projection, same instance sort order, same tile-rect masking
(a gaussian only touches pixels of tiles in its rect, as in the CUDA
reference), same alpha/transmittance thresholds. Fully differentiable by
autodiff, which makes it the gradient oracle for the custom-VJP kernels.
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
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (image [3,H,W], final transmittance [H,W]); with a tile band,
    H is the band height and pixel rows start at tile_row_offset·tile_size."""
    tiles_x = (width + tile_size - 1) // tile_size
    y0 = tile_row_offset * tile_size
    if band_height is None:
        band_height = height - y0

    g = inst.gauss_ids                                     # [B]
    mean2d = proj.means2d[g]                               # [B,2]
    conic = proj.conics[g]                                 # [B,3]
    col = colors[g]                                        # [B,3]
    opac = opacities[g]                                    # [B]

    px = jnp.arange(width, dtype=jnp.float32)
    py = jnp.arange(y0, y0 + band_height, dtype=jnp.float32)
    PX, PY = jnp.meshgrid(px, py, indexing="xy")           # [H,W]
    pix_tile = ((PY.astype(jnp.int32) // tile_size - tile_row_offset) * tiles_x
                + PX.astype(jnp.int32) // tile_size)       # [H,W]

    dx = mean2d[:, 0, None, None] - PX[None]               # [B,H,W]
    dy = mean2d[:, 1, None, None] - PY[None]
    power = gaussian_power(dx, dy, conic[:, 0, None, None],
                           conic[:, 1, None, None], conic[:, 2, None, None])
    alpha = alpha_from_power(power, opac[:, None, None])
    in_tile = (inst.tile_ids[:, None, None] == pix_tile[None]) & inst.valid[:, None, None]
    alpha = jnp.where(in_tile, alpha, 0.0)

    # multiplicative transmittance recurrence — the same domain as the Pallas
    # kernels (product-domain thresholds must agree or borderline instances
    # at T≈1e-4 flip inclusion between oracle and kernel)
    one_m = 1.0 - alpha
    cum_incl = jnp.cumprod(one_m, axis=0)                  # T after instance i
    include = cum_incl >= T_EPS                            # early-termination prefix
    alpha = jnp.where(include, alpha, 0.0)
    one_m = 1.0 - alpha
    cum_incl = jnp.cumprod(one_m, axis=0)
    w = alpha * (cum_incl / one_m)                         # [B,H,W]

    image = jnp.einsum("bc,bhw->chw", col, w,
                       precision=jax.lax.Precision.HIGHEST)
    final_t = cum_incl[-1] if w.shape[0] > 0 else jnp.ones_like(PX)
    if bg is not None:
        image = image + final_t[None] * bg[:, None, None]
    return image, final_t
