"""Public differentiable rasterizer API.

`rasterize(...)` is the TPU-native replacement for the reference's CUDA
`GaussianRasterizer` call (ref gaussian_renderer/__init__.py:197-205): static
shapes, projection + instance sort in XLA, tile blending in Pallas with an
analytic custom VJP. Gradients flow to means3d/scales/quats/colors/opacities
through the (differentiable) projection; the per-gaussian scatter-add of
instance gradients is the autodiff transpose of the instance gather.

Backends: "pallas" (TPU, or interpret-mode on CPU) and "reference" (dense
pure-JAX oracle, small scenes only).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from contextgs_tpu.ops.rasterize.projection import (ProjectedGaussians,
                                                    project_gaussians,
                                                    visible_filter)
from contextgs_tpu.ops.rasterize.reference import blend_reference
from contextgs_tpu.ops.rasterize.sorting import TileInstances, expand_and_sort
from contextgs_tpu.ops.rasterize.tile_kernel import (OUTC, PACK, PIX,
                                                     blend_backward_pallas,
                                                     blend_forward_pallas)

__all__ = ["rasterize", "visible_filter", "project_gaussians",
           "expand_and_sort", "RasterOutput"]


class RasterOutput(NamedTuple):
    image: jnp.ndarray        # [3,H,W] composited with background
    final_t: jnp.ndarray      # [H,W] final transmittance
    radii: jnp.ndarray        # [G] int32
    visibility: jnp.ndarray   # [G] bool (radius > 0)
    overflowed: jnp.ndarray   # [] bool — instance budget exceeded
    vis_overflowed: jnp.ndarray  # [] bool — visible gaussians exceeded
                              # vis_cap (deepest splats dropped); False when
                              # vis_cap is None
    n_instances: jnp.ndarray  # [] int32 — tile instances before budget clamp
    n_vis: jnp.ndarray        # [] int32 — gaussians touching >=1 tile


def _float0_like(x):
    return jnp.zeros(x.shape, dtype=jax.dtypes.float0)


def _pack(gauss_rows, order, rank_aligned, vis_cap=None):
    """[G,9] splat rows → component-major [PACK, B_pad] instance table.

    ONE row gather from the small [G+1,·] depth-ordered table: the tile sort
    already delivered the depth rank per aligned slot (`rank_aligned`).
    Sentinel ranks (G) hit the appended zero row, so pad/overflow slots get
    zero opacity with no extra mask multiply. Rows are zero-padded to the
    full PACK width at [G] scale BEFORE either gather: full 64-byte rows are
    the gather's fast path, and a slice/pad fused INTO a gather lowers to
    per-element gathers (~60x slower, measured). (Composing the two gathers
    through the per-slot gaussian id instead costs ~7 ms extra: the [B_pad]
    scalar id gather is far slower than this [G]-scale row gather.) The
    transpose to the kernel's component-major layout fuses into the gather's
    output copy.

    With `vis_cap` = V < G, the depth-ordered table keeps only its first V
    rows: the depth sort puts culled gaussians last, so every instance's
    rank is < n_vis and the slice is lossless while n_vis <= V (the caller
    surfaces `n_vis > V` as vis_overflowed and reacts host-side). A smaller
    gather table stays scoped-VMEM-resident — the row gather degrades ~9x
    once the table outgrows it (measured, scripts/r3_micro.py)."""
    G, w = gauss_rows.shape
    rows16 = jnp.concatenate(
        [gauss_rows, jnp.zeros((G, PACK - w), gauss_rows.dtype)], axis=1)
    if vis_cap is not None and vis_cap < G:
        order = order[:vis_cap]
        rank_aligned = jnp.minimum(rank_aligned, vis_cap)
    rows_rank = jnp.concatenate(
        [rows16[order], jnp.zeros((1, PACK), rows16.dtype)])   # [V+1, PACK]
    packed = rows_rank[rank_aligned]                           # [B_pad, PACK]
    packed = jax.lax.optimization_barrier(packed)
    return packed.T


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def _pack_blend(gauss_rows, order, inv_order, rank_aligned, tile_bounds,
                perm, seg_bounds, n_tiles: int, tiles_x: int, tile_size: int,
                chunk_size: int, interpret: bool, row_offset: int,
                vis_cap):
    """Gather+blend with a segment-sum backward. Returns channel-major
    [OUTC, n_tiles*PIX] (rgb + final T).

    The naive backward of the instance gather is a [B_pad,9]→[G,9] scatter-add
    — index-bound and ~30 ms at 1.5M instances (XLA serializes colliding
    updates). Instead: row-gather the per-instance gradients back into
    depth-slot order via `perm`, where every gaussian's instances are
    contiguous, and reduce with one cumsum + two boundary row-gathers
    (`seg_bounds`).
    """
    out, _ = blend_forward_pallas(_pack(gauss_rows, order, rank_aligned,
                                        vis_cap),
                                  tile_bounds, n_tiles, tiles_x, tile_size,
                                  chunk_size, interpret, row_offset)
    return out[:, :n_tiles * PIX]


def _pack_blend_fwd(gauss_rows, order, inv_order, rank_aligned,
                    tile_bounds, perm, seg_bounds, n_tiles, tiles_x,
                    tile_size, chunk_size, interpret, row_offset, vis_cap):
    packed = _pack(gauss_rows, order, rank_aligned, vis_cap)
    out, wm = blend_forward_pallas(packed, tile_bounds, n_tiles, tiles_x,
                                   tile_size, chunk_size, interpret,
                                   row_offset)
    res = (packed, tile_bounds, out, wm, perm, seg_bounds, inv_order,
           gauss_rows.shape[0])
    return out[:, :n_tiles * PIX], res


def _pack_blend_bwd(n_tiles, tiles_x, tile_size, chunk_size, interpret,
                    row_offset, vis_cap, res, cot):
    packed, tile_bounds, out, wm, perm, seg_bounds, inv_order, G = res
    # every aligned slot `perm` can reference is kernel-written (analytic
    # gradients, in-kernel zeros past the watermark, exact zeros for fillers)
    # — no written-mask pass needed (see tile_kernel.blend_backward_pallas)
    grads = blend_backward_pallas(packed, tile_bounds, out, wm, cot, n_tiles,
                                  tiles_x, tile_size, chunk_size, interpret,
                                  row_offset)                  # [PACK, B_pad]
    # materialize the row-major view behind a barrier: without it XLA fuses
    # the transpose INTO the downstream gather/cumsum, which then run in
    # column-major layout (~6 ms instead of a bandwidth-bound copy).
    # All row ops below stay at the full PACK width: 64-byte rows are the
    # gather fast path (see _pack), rows 9..15 are exact zeros from the
    # kernel, and the cumsum is pass-count-bound, not width-bound (measured
    # equal at 9 vs 16 columns).
    gRM = jax.lax.optimization_barrier(grads.T)                # [B_pad, PACK]
    gT = jnp.concatenate([gRM, jnp.zeros((1, PACK), grads.dtype)])
    g_depth = gT[perm]                   # [B,PACK]; dropped slots → zero row
    B = g_depth.shape[0]
    if vis_cap is not None and vis_cap < G:
        # instances of ranks >= vis_cap blended a sentinel ZERO row (see
        # _pack), whose kernel gradient has a spurious nonzero opacity
        # component (alpha==0 but exp(power)·T·Σcot ≠ 0); ranks are
        # depth-contiguous so those are exactly the slots past
        # seg_bounds[vis_cap] — mask them before the reduce
        lim = jnp.minimum(seg_bounds[vis_cap], B)
        g_depth = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0) < lim,
            g_depth, 0.0)
    cs = jnp.concatenate([jnp.zeros((1, PACK), grads.dtype),
                          jnp.cumsum(g_depth, axis=0)])        # [B+1, PACK]
    # ONE boundary gather (rows G+1) instead of separate cs[hi]/cs[lo]: the
    # bounds are shared endpoints, diff recovers the per-rank segment sums
    cs_b = cs[jnp.clip(seg_bounds, 0, B)]                      # [G+1, PACK]
    per_rank = cs_b[1:] - cs_b[:-1]                            # [G, PACK]
    # gather (not scatter) back to gaussian order: per-gaussian row = its
    # depth rank's segment sum; culled gaussians have empty segments → zero.
    # barrier: a slice FUSED into a gather lowers to per-element gathers
    # (~60x slower, measured) — materialize full rows, then slice.
    d_rows = jax.lax.optimization_barrier(per_rank[inv_order])[:, :9]
    f0 = _float0_like
    b_pad = packed.shape[1]
    ig = f0(jnp.zeros((G,), jnp.int32))
    ib = f0(jnp.zeros((b_pad,), jnp.int32))
    return (d_rows, ig, ig, ib,
            f0(tile_bounds), f0(perm), f0(seg_bounds))


_pack_blend.defvjp(_pack_blend_fwd, _pack_blend_bwd)


def rasterize(
    means3d: jnp.ndarray,       # [G,3]
    scales: jnp.ndarray,        # [G,3]
    quats: jnp.ndarray,         # [G,4] normalized
    colors: jnp.ndarray,        # [G,3]
    opacities: jnp.ndarray,     # [G]
    *,
    world_view: jnp.ndarray,
    full_proj: jnp.ndarray,
    tanfovx,
    tanfovy,
    width: int,
    height: int,
    bg: jnp.ndarray,            # [3]
    tile_size: int = 16,
    budget: int = 1 << 18,
    chunk_size: int = 256,
    backend: str = "pallas",
    interpret: bool | None = None,
    valid: jnp.ndarray | None = None,
    scale_modifier: float = 1.0,
    screen_dummy: jnp.ndarray | None = None,
    tile_band: tuple | None = None,
    slack: int | None = None,
    vis_cap: int | None = None,
    t_eps: float | None = None,
) -> RasterOutput:
    """Differentiable tile rasterization of 3D gaussians.

    width/height/tile_size/budget/chunk_size/backend are static.
    `valid` force-culls padded gaussian slots. With `tile_band=(row0, n_rows)`
    only that horizontal band of tiles is rasterized and `image`/`final_t`
    cover just the band's pixel rows (multi-chip tile sharding).

    `vis_cap` (static) bounds the number of RENDERED gaussians per view: the
    splat-state gather table is sliced to the visible prefix of the depth
    sort, keeping it scoped-VMEM-resident at large G (decoded-path renders
    over padded pools where most slots are dead or culled). If more than
    vis_cap gaussians are actually visible the deepest ones are dropped and
    `vis_overflowed` is set — callers react like a budget overflow (double
    and re-jit, e.g. evaluation.make_decoded_renderer).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tiles_x = (width + tile_size - 1) // tile_size
    tiles_y = (height + tile_size - 1) // tile_size
    row0 = 0 if tile_band is None else tile_band[0]
    # with a band, keep the full requested row count (bands may extend past
    # the image so every shard_map branch has identical shapes); those rows
    # simply render background
    band_rows = tiles_y if tile_band is None else tile_band[1]
    n_tiles = tiles_x * band_rows

    proj = project_gaussians(means3d, scales, quats, world_view, full_proj,
                             tanfovx, tanfovy, width, height, tile_size,
                             scale_modifier, valid=valid,
                             tile_band=tile_band, opacities=opacities)
    if screen_dummy is not None:
        # densification-statistics hook (ref gaussian_renderer/__init__.py:168-173):
        # caller passes zeros and reads the cotangent; the 0.5·W/0.5·H factors
        # reproduce the CUDA backward's NDC-scaled viewspace gradient so the
        # densify_grad_threshold transfers unchanged.
        ndc_scale = jnp.array([0.5 * width, 0.5 * height], means3d.dtype)
        proj = proj._replace(means2d=proj.means2d + screen_dummy * ndc_scale)
    inst = expand_and_sort(proj, tiles_x, band_rows, budget, align=chunk_size,
                           tile_row_offset=row0, slack=slack)

    band_h = (min(height - row0 * tile_size, band_rows * tile_size)
              if tile_band is None else band_rows * tile_size)
    if backend == "reference":
        # t_eps override: golden tests scale the early-termination threshold
        # ±δ on the ORACLE to build a gradient envelope bounding borderline
        # inclusion flips vs the Pallas kernels (see blend_reference)
        ref_kw = {} if t_eps is None else dict(t_eps=t_eps)
        img, final_t = blend_reference(proj, inst, colors, opacities,
                                       width, height, tile_size, bg=None,
                                       tile_row_offset=row0,
                                       band_height=band_h, **ref_kw)
    else:
        # fused row-gathers of all per-gaussian splat state with a
        # segment-sum backward (see _pack_blend); pad slots are neutralized
        # via sentinel-indexed zero rows
        gauss_rows = jnp.concatenate([
            proj.means2d, proj.conics, opacities[:, None], colors],
            axis=1)                                       # [G, 9]
        vcap = (None if vis_cap is None
                else min(int(vis_cap), means3d.shape[0]))
        tiles = _pack_blend(gauss_rows, inst.order, inst.inv_order,
                            inst.rank_aligned, inst.tile_bounds, inst.perm,
                            inst.seg_bounds, n_tiles, tiles_x, tile_size,
                            chunk_size, interpret, row0,
                            vcap)                         # [4, n_tiles*PIX]
        # channel-major kernel output: per-channel tile untiling only (the
        # channel axis is already major — no minor-dim-4 transpose)
        full = tiles.reshape(4, band_rows, tiles_x, tile_size, tile_size)
        full = full.transpose(0, 1, 3, 2, 4).reshape(
            4, band_rows * tile_size, tiles_x * tile_size)
        img = full[0:3, :band_h, :width]
        final_t = full[3, :band_h, :width]

    image = img + final_t[None] * bg[:, None, None]
    # the reference backend blends every instance (no packed table) — the
    # cap only applies to the Pallas path's gather-table slice
    vis_ovf = (jnp.asarray(False)
               if vis_cap is None or backend == "reference"
               else inst.n_vis > min(int(vis_cap), means3d.shape[0]))
    return RasterOutput(image=image, final_t=final_t, radii=proj.radii,
                        visibility=proj.radii > 0, overflowed=inst.overflowed,
                        vis_overflowed=vis_ovf, n_instances=inst.demand,
                        n_vis=inst.n_vis)
