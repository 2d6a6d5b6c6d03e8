"""Gaussian projection: 3D covariance → EWA 2D conic, culling, tile extents.

Pure differentiable JAX (VPU-friendly, batched over all gaussians); the
non-differentiable sort/blend stages consume its stop-gradient outputs.

Behavioral spec: the forward math of the reference CUDA rasterizer
(/root/reference submodule `diff-gaussian-rasterization`, interface at
gaussian_renderer/__init__.py:179-205): view-space z cull at 0.2, frustum
clamp at 1.3*tanfov inside the Jacobian, +0.3 screen-space dilation,
radius = ceil(3*sqrt(max eigenvalue)), ndc2Pix(v) = ((v+1)*S - 1)/2.

Matrix convention: row-vector transforms, `[p,1] @ M` (see scene/cameras.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ProjectedGaussians(NamedTuple):
    """Per-gaussian screen-space quantities, all [G, ...]."""

    means2d: jnp.ndarray    # [G,2] pixel coords
    conics: jnp.ndarray     # [G,3] inverse 2D covariance (a, b, c)
    depths: jnp.ndarray     # [G] view-space z
    radii: jnp.ndarray      # [G] int32 screen radius (0 = culled)
    rect_min: jnp.ndarray   # [G,2] int32 inclusive tile rect min (x, y)
    rect_max: jnp.ndarray   # [G,2] int32 exclusive tile rect max (x, y)
    n_tiles: jnp.ndarray    # [G] int32 tiles touched (0 = culled)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[...,4] (w,x,y,z), assumed normalized → [...,3,3] rotation."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def build_cov3d(scales: jnp.ndarray, quats: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """World-space covariance Σ = R S² Rᵀ (3DGS convention), [G,3,3]."""
    R = quat_to_rotmat(quats)
    s2 = jnp.square(scales * scale_modifier)
    return jnp.einsum("gij,gj,gkj->gik", R, s2, R)


def project_gaussians(
    means3d: jnp.ndarray,       # [G,3]
    scales: jnp.ndarray,        # [G,3]
    quats: jnp.ndarray,         # [G,4] normalized (w,x,y,z)
    world_view: jnp.ndarray,    # [4,4] transposed W2V
    full_proj: jnp.ndarray,     # [4,4] transposed world→clip
    tanfovx: float,
    tanfovy: float,
    width: int,
    height: int,
    tile_size: int = 16,
    scale_modifier: float = 1.0,
    valid: jnp.ndarray | None = None,   # [G] bool; False → force-cull
    tile_band: tuple | None = None,     # (row0, n_rows): clamp rects to a
                                        # horizontal tile band (multi-chip
                                        # tile sharding)
    opacities: jnp.ndarray | None = None,  # [G]; enables the tight
                                        # opacity-aware ellipse-bbox tile rect
) -> ProjectedGaussians:
    """EWA-project all gaussians to screen space.

    width/height/tile_size are static; everything else is traced.
    """
    G = means3d.shape[0]
    ones = jnp.ones((G, 1), means3d.dtype)
    p_hom4 = jnp.concatenate([means3d, ones], axis=1)

    p_view = p_hom4 @ world_view            # [G,4]
    depths = p_view[:, 2]

    p_clip = p_hom4 @ full_proj             # [G,4]
    p_w = 1.0 / (p_clip[:, 3] + 1e-7)
    p_proj = p_clip[:, :3] * p_w[:, None]

    # --- 2D covariance via EWA splatting ---
    focal_x = width / (2.0 * tanfovx)
    focal_y = height / (2.0 * tanfovy)
    lim_x, lim_y = 1.3 * tanfovx, 1.3 * tanfovy
    z = depths
    safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    tx = jnp.clip(p_view[:, 0] / safe_z, -lim_x, lim_x) * z
    ty = jnp.clip(p_view[:, 1] / safe_z, -lim_y, lim_y) * z
    inv_z = 1.0 / safe_z
    inv_z2 = inv_z * inv_z

    # EWA cov2d = T Σ Tᵀ with T = J·Rv, fully flattened to [G]-vector ops:
    # XLA lowers stacked [G,2,3]/[G,3,3] einsums of tiny matrices to
    # transpose-heavy loops that cost ~7 ms at 200k gaussians; the explicit
    # scalar expansion is pure VPU elementwise work (<1 ms).
    Rv = world_view[:3, :3].T               # world→view rotation (constant 3x3)
    fxi = focal_x * inv_z
    fyi = focal_y * inv_z
    gx = -focal_x * tx * inv_z2
    gy = -focal_y * ty * inv_z2
    # T rows: T0k = fxi·Rv[0,k] + gx·Rv[2,k]; T1k = fyi·Rv[1,k] + gy·Rv[2,k]
    T00 = fxi * Rv[0, 0] + gx * Rv[2, 0]
    T01 = fxi * Rv[0, 1] + gx * Rv[2, 1]
    T02 = fxi * Rv[0, 2] + gx * Rv[2, 2]
    T10 = fyi * Rv[1, 0] + gy * Rv[2, 0]
    T11 = fyi * Rv[1, 1] + gy * Rv[2, 1]
    T12 = fyi * Rv[1, 2] + gy * Rv[2, 2]

    # Σ = R S² Rᵀ (3DGS convention), 6 unique entries via M = R·diag(s)
    w, x, y_, zq = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    s0 = scales[:, 0] * scale_modifier
    s1 = scales[:, 1] * scale_modifier
    s2 = scales[:, 2] * scale_modifier
    R00 = 1 - 2 * (y_ * y_ + zq * zq)
    R01 = 2 * (x * y_ - w * zq)
    R02 = 2 * (x * zq + w * y_)
    R10 = 2 * (x * y_ + w * zq)
    R11 = 1 - 2 * (x * x + zq * zq)
    R12 = 2 * (y_ * zq - w * x)
    R20 = 2 * (x * zq - w * y_)
    R21 = 2 * (y_ * zq + w * x)
    R22 = 1 - 2 * (x * x + y_ * y_)
    M00, M01, M02 = R00 * s0, R01 * s1, R02 * s2
    M10, M11, M12 = R10 * s0, R11 * s1, R12 * s2
    M20, M21, M22 = R20 * s0, R21 * s1, R22 * s2
    C00 = M00 * M00 + M01 * M01 + M02 * M02
    C01 = M00 * M10 + M01 * M11 + M02 * M12
    C02 = M00 * M20 + M01 * M21 + M02 * M22
    C11 = M10 * M10 + M11 * M11 + M12 * M12
    C12 = M10 * M20 + M11 * M21 + M12 * M22
    C22 = M20 * M20 + M21 * M21 + M22 * M22

    def quad(Ta0, Ta1, Ta2, Tb0, Tb1, Tb2):
        return (Ta0 * Tb0 * C00 + Ta1 * Tb1 * C11 + Ta2 * Tb2 * C22
                + (Ta0 * Tb1 + Ta1 * Tb0) * C01
                + (Ta0 * Tb2 + Ta2 * Tb0) * C02
                + (Ta1 * Tb2 + Ta2 * Tb1) * C12)

    a = quad(T00, T01, T02, T00, T01, T02) + 0.3
    b = quad(T00, T01, T02, T10, T11, T12)
    c = quad(T10, T11, T12, T10, T11, T12) + 0.3
    det = a * c - b * b
    det_ok = det > 0
    safe_det = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / safe_det
    conics = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam))

    means2d = jnp.stack([
        ((p_proj[:, 0] + 1.0) * width - 1.0) * 0.5,
        ((p_proj[:, 1] + 1.0) * height - 1.0) * 0.5,
    ], axis=-1)

    # --- tile rect (getRect semantics: min inclusive, max exclusive) ---
    tiles_x = (width + tile_size - 1) // tile_size
    tiles_y = (height + tile_size - 1) // tile_size
    row_lo, row_hi = 0, tiles_y
    if tile_band is not None:
        # bands may lie partly/fully outside the image (uniform shapes across
        # shards); clamp keeps lo <= hi, fully-outside bands get empty rects
        row_lo = min(tile_band[0], tiles_y)
        row_hi = min(tile_band[0] + tile_band[1], tiles_y)
    m2i = jax.lax.stop_gradient(means2d)
    r = jax.lax.stop_gradient(radius_f)
    if opacities is not None:
        # Opacity-aware ellipse bbox, rendered-set exact: a pixel survives the
        # blend's skip rule iff alpha = op·exp(power) ≥ 1/255, i.e. its
        # Mahalanobis² ≤ k² = 2·ln(255·op). The axis-aligned bbox of that
        # ellipse has half-extents k·σx, k·σy with σx²=a, σy²=c (the dilated
        # 2D-covariance marginals). min() against the reference 3σ-circle
        # radius r intersects with the CUDA rect, so exactly the pixels the
        # reference renders stay covered (dropped ones have alpha < 1/255 and
        # are zeroed by the skip rule anyway) while anisotropic or
        # low-opacity splats touch far fewer tiles; op < 1/255 culls the
        # gaussian outright.
        op = jax.lax.stop_gradient(opacities)
        k = jnp.sqrt(jnp.maximum(
            2.0 * jnp.log(jnp.maximum(255.0 * op, 1e-30)), 0.0))
        rx = jnp.minimum(jnp.ceil(k * jnp.sqrt(jnp.maximum(a, 0.0))), r)
        ry = jnp.minimum(jnp.ceil(k * jnp.sqrt(jnp.maximum(c, 0.0))), r)
    else:
        rx = ry = r
    rect_min = jnp.stack([
        jnp.clip(((m2i[:, 0] - rx) / tile_size).astype(jnp.int32), 0, tiles_x),
        jnp.clip(((m2i[:, 1] - ry) / tile_size).astype(jnp.int32), row_lo, row_hi),
    ], axis=-1)
    rect_max = jnp.stack([
        jnp.clip(((m2i[:, 0] + rx + tile_size - 1) / tile_size).astype(jnp.int32), 0, tiles_x),
        jnp.clip(((m2i[:, 1] + ry + tile_size - 1) / tile_size).astype(jnp.int32), row_lo, row_hi),
    ], axis=-1)

    keep = det_ok & (depths > 0.2)
    if opacities is not None:
        keep = keep & (jax.lax.stop_gradient(opacities) >= 1.0 / 255.0)
    if valid is not None:
        keep = keep & valid
    n_tiles = jnp.where(
        keep,
        (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1]), 0)
    keep = keep & (n_tiles > 0)
    radii = jnp.where(keep, r, 0.0).astype(jnp.int32)
    n_tiles = jnp.where(keep, n_tiles, 0).astype(jnp.int32)

    return ProjectedGaussians(means2d=means2d, conics=conics, depths=depths,
                              radii=radii, rect_min=rect_min, rect_max=rect_max,
                              n_tiles=n_tiles)


def visible_filter(
    means3d: jnp.ndarray, scales: jnp.ndarray, world_view: jnp.ndarray,
    full_proj: jnp.ndarray, tanfovx: float, tanfovy: float,
    width: int, height: int, valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Anchor frustum-cull mask (ref prefilter_voxel,
    gaussian_renderer/__init__.py:232-287: identity rotation, radius>0 test)."""
    G = means3d.shape[0]
    quats = jnp.zeros((G, 4), means3d.dtype).at[:, 0].set(1.0)
    proj = project_gaussians(means3d, scales, quats, world_view, full_proj,
                             tanfovx, tanfovy, width, height, valid=valid)
    return proj.radii > 0
