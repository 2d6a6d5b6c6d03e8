"""Rasterizer golden tests: projection sanity, pallas-vs-reference forward
equality, analytic-VJP vs autodiff-oracle gradients, finite differences.

Everything is jitted (this environment compiles XLA remotely — eager op-by-op
dispatch costs seconds per primitive) and configurations are shared across
tests to maximize compile-cache reuse.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contextgs_tpu.ops.rasterize import rasterize, visible_filter
from contextgs_tpu.ops.rasterize.projection import project_gaussians
from contextgs_tpu.ops.rasterize.sorting import expand_and_sort

from utils_synthetic import make_random_gaussians, make_test_camera

BUDGET = 1024
CHUNK = 128


def _cam_arrays(cam):
    return dict(world_view=jnp.asarray(cam.world_view),
                full_proj=jnp.asarray(cam.full_proj),
                tanfovx=cam.tanfovx, tanfovy=cam.tanfovy)


@functools.lru_cache(maxsize=16)
def _render_fn(backend, width, height):
    cam = make_test_camera(width=width, height=height)
    kw = _cam_arrays(cam)

    @jax.jit
    def run(means, scales, quats, colors, opac, bg):
        return rasterize(means, scales, quats, colors, opac, width=width,
                         height=height, bg=bg, budget=BUDGET, chunk_size=CHUNK,
                         backend=backend, **kw)

    return run


@functools.lru_cache(maxsize=16)
def _grad_fn(backend, width, height, t_eps=None):
    cam = make_test_camera(width=width, height=height)
    kw = _cam_arrays(cam)

    def loss(means, scales, quats, colors, opac, target):
        qn = quats / jnp.linalg.norm(quats, axis=1, keepdims=True)
        out = rasterize(means, scales, qn, colors, opac, width=width,
                        height=height, bg=jnp.full(3, 0.5), budget=BUDGET,
                        chunk_size=CHUNK, backend=backend, t_eps=t_eps, **kw)
        return jnp.sum((out.image - target) ** 2) + 0.1 * jnp.sum(out.final_t)

    return jax.jit(loss), jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))


@functools.lru_cache(maxsize=4)
def _proj_fn(width, height):
    cam = make_test_camera(width=width, height=height)
    kw = _cam_arrays(cam)

    @jax.jit
    def run(means, scales, quats):
        return project_gaussians(means, scales, quats, kw["world_view"],
                                 kw["full_proj"], kw["tanfovx"], kw["tanfovy"],
                                 width, height)

    return run


@functools.lru_cache(maxsize=4)
def _proj_sort_fn(width, height):
    cam = make_test_camera(width=width, height=height)
    kw = _cam_arrays(cam)
    tiles_x, tiles_y = (width + 15) // 16, (height + 15) // 16

    @jax.jit
    def run(means, scales, quats):
        proj = project_gaussians(means, scales, quats, kw["world_view"],
                                 kw["full_proj"], kw["tanfovx"], kw["tanfovy"],
                                 width, height)
        return proj, expand_and_sort(proj, tiles_x, tiles_y, BUDGET, CHUNK)

    return run


def _scene(rng, n=50, **kw):
    return tuple(map(jnp.asarray, make_random_gaussians(rng, n, **kw)))


_ID_QUAT = [1.0, 0.0, 0.0, 0.0]


def test_projection_center_point(rng):
    proj = _proj_fn(32, 32)(jnp.array([[0.0, 0.0, 2.0]]),
                            jnp.full((1, 3), 0.05), jnp.array([_ID_QUAT]))
    # on-axis point lands at the image center, ndc2Pix((0+1)*32-1)/2 = 15.5
    np.testing.assert_allclose(np.asarray(proj.means2d[0]), [15.5, 15.5], atol=1e-4)
    assert proj.depths[0] == pytest.approx(2.0)
    assert int(proj.radii[0]) > 0


def test_projection_culls_behind_camera(rng):
    proj = _proj_fn(32, 32)(jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 2.0]]),
                            jnp.full((2, 3), 0.05),
                            jnp.array([_ID_QUAT, _ID_QUAT]))
    assert int(proj.radii[0]) == 0 and int(proj.n_tiles[0]) == 0
    assert int(proj.radii[1]) > 0


def test_expand_and_sort_structure(rng):
    scene = _scene(rng, 40)
    proj, inst = _proj_sort_fn(32, 32)(*scene[:3])
    t = np.asarray(inst.tile_ids)
    v = np.asarray(inst.valid)
    b = np.asarray(inst.tile_bounds)
    assert b[0] == 0 and (np.diff(b) >= 0).all() and (b % CHUNK == 0).all()
    d = np.asarray(proj.depths)[np.asarray(inst.gauss_ids)]
    n_valid = 0
    for ti in range(4):
        seg_v = v[b[ti]:b[ti + 1]]
        seg_t = t[b[ti]:b[ti + 1]][seg_v]
        assert (seg_t == ti).all(), "valid slots carry their own tile id"
        seg_d = d[b[ti]:b[ti + 1]][seg_v]
        assert (np.diff(seg_d) >= -1e-6).all(), "depth ascending within tile"
        # pads sit at the segment end
        if seg_v.any():
            last = np.nonzero(seg_v)[0][-1]
            assert seg_v[:last + 1].all()
        n_valid += seg_v.sum()
    assert n_valid == int(inst.total)
    assert not bool(inst.overflowed)


@pytest.mark.tpu
def test_forward_pallas_matches_reference(rng):
    scene = _scene(rng, 80)
    bg = jnp.array([0.1, 0.2, 0.3])
    out_ref = _render_fn("reference", 48, 32)(*scene, bg)
    out_pal = _render_fn("pallas", 48, 32)(*scene, bg)
    np.testing.assert_allclose(np.asarray(out_pal.image),
                               np.asarray(out_ref.image), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_pal.final_t),
                               np.asarray(out_ref.final_t), atol=1e-4)
    assert float(jnp.abs(out_ref.image).sum()) > 1.0
    assert float(out_ref.final_t.min()) < 0.999


@pytest.mark.tpu
def test_forward_with_opaque_occluder(rng):
    """Early termination: a fully opaque near gaussian hides far ones."""
    means = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 3.0]])
    scales = jnp.full((2, 3), 0.5)
    quats = jnp.array([_ID_QUAT, _ID_QUAT])
    colors = jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
    opac = jnp.array([1.0, 1.0])
    bg = jnp.zeros(3)
    out_ref = _render_fn("reference", 32, 32)(means, scales, quats, colors, opac, bg)
    out_pal = _render_fn("pallas", 32, 32)(means, scales, quats, colors, opac, bg)
    np.testing.assert_allclose(np.asarray(out_pal.image),
                               np.asarray(out_ref.image), atol=2e-5)
    img = np.asarray(out_ref.image)
    cx = img[:, 16, 16]
    assert cx[0] > 0.9 and cx[1] < 0.05  # red in front wins


@pytest.mark.tpu
def test_gradients_match_reference_oracle(rng):
    """Pallas analytic VJP vs the autodiff oracle — threshold-envelope form.

    Two deliberate tolerances, both justified by float64 ground truth (CPU
    x64 oracle run, recorded 2026-08-20):
    1. Threshold envelope: instances with T·(1−α) within f32 rounding of
       T_EPS legitimately flip inclusion between any two evaluation orders
       (f32-vs-f64 oracle runs differ by up to 12% of max|grad| on single
       elements from exactly such flips; oracle and kernel agree there).
       The oracle is evaluated at T_EPS·(1±δ), δ=2e-4, and the kernel must
       lie inside the elementwise envelope of the three oracle gradients.
    2. atol 1.5e-3 of max|grad|: mutual f32 rounding between the two
       formulations (one segmented log-scan vs chunk-restarted log prefix
       with multiplicative carry). At the historically worst element
       (means[1,0], 8.9e-4 normalized apart) the PALLAS value is the one
       closer to f64 (−1.35944 vs f64 −1.35637; f32 oracle −1.36658), so
       deltas at this scale are oracle noise, not kernel error."""
    scene = _scene(rng, 30)
    target = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    from contextgs_tpu.ops.rasterize.common import T_EPS
    delta = 2e-4
    atol = 1.5e-3
    g_ref = _grad_fn("reference", 32, 32)[1](*scene, target)
    g_lo = _grad_fn("reference", 32, 32, T_EPS * (1 - delta))[1](*scene, target)
    g_hi = _grad_fn("reference", 32, 32, T_EPS * (1 + delta))[1](*scene, target)
    g_pal = _grad_fn("pallas", 32, 32)[1](*scene, target)
    names = ["means", "scales", "quats", "colors", "opacities"]
    for name, a, lo, hi, b in zip(names, g_ref, g_lo, g_hi, g_pal):
        a, lo, hi, b = map(np.asarray, (a, lo, hi, b))
        scale = np.abs(a).max() + 1e-6
        env_lo = np.minimum(np.minimum(a, lo), hi) / scale - atol
        env_hi = np.maximum(np.maximum(a, lo), hi) / scale + atol
        bn = b / scale
        bad = (bn < env_lo) | (bn > env_hi)
        assert not bad.any(), (
            f"grad outside oracle envelope for {name}: "
            f"{bad.sum()} elements, worst "
            f"{np.max(np.maximum(env_lo - bn, bn - env_hi)):.3e}")
        assert np.abs(a).max() > 0, f"zero grads for {name}"


def test_reference_gradients_vs_finite_differences(rng):
    # colors enter the blend linearly and do not move the alpha/transmittance
    # cutoffs (which make the loss discontinuous in opacity/means — matching
    # the CUDA reference's 1/255 and 1e-4 thresholds), so FD is exact for them
    means, scales, quats, colors, opac = _scene(rng, 8)
    target = jnp.zeros((3, 32, 32))
    loss, grad = _grad_fn("reference", 32, 32)
    g = grad(means, scales, quats, colors, opac, target)[3]
    eps = 1e-2
    for i in range(4):
        c = np.asarray(colors).copy()
        c[i, 0] += eps
        lp = float(loss(means, scales, quats, jnp.asarray(c), opac, target))
        c[i, 0] -= 2 * eps
        lm = float(loss(means, scales, quats, jnp.asarray(c), opac, target))
        fd = (lp - lm) / (2 * eps)
        assert np.isclose(float(g[i, 0]), fd, rtol=2e-2, atol=1e-3), \
            f"color[{i},0]: analytic {float(g[i,0])} vs fd {fd}"
    assert np.abs(np.asarray(g)).max() > 0


def test_visible_filter(rng):
    cam = make_test_camera(width=32, height=32)
    kw = _cam_arrays(cam)

    @jax.jit
    def run(means, scales):
        return visible_filter(means, scales, kw["world_view"], kw["full_proj"],
                              kw["tanfovx"], kw["tanfovy"], 32, 32)

    vis = run(jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, -2.0], [50.0, 0.0, 2.0]]),
              jnp.full((3, 3), 0.05))
    assert bool(vis[0]) and not bool(vis[1]) and not bool(vis[2])


def test_budget_overflow_flag(rng):
    scene = _scene(rng, 200, scale_range=(0.3, 0.6))
    proj, inst = _proj_sort_fn(32, 32)(*scene[:3])
    if int(proj.n_tiles.sum()) > BUDGET:
        assert bool(inst.overflowed)
    else:
        pytest.skip("synthetic scene did not overflow the budget")


def test_tile_bounds_histogram_vs_bruteforce(rng):
    """The matmul-histogram segment lengths (sorting.py) must equal a numpy
    brute-force expansion — including the budget-overflow straddler, whose
    partial rect is row-major-prefix capped exactly like the slot expansion."""
    for n, scale_range in ((60, (0.02, 0.08)), (200, (0.3, 0.6))):
        scene = _scene(rng, n, scale_range=scale_range)
        proj, inst = _proj_sort_fn(32, 32)(*scene[:3])
        rmin = np.asarray(proj.rect_min)
        rmax = np.asarray(proj.rect_max)
        cnt = np.asarray(proj.n_tiles)
        depths = np.where(cnt > 0, np.asarray(proj.depths), np.inf)
        order = np.argsort(depths, kind="stable")
        tiles = []
        for g in order:
            if cnt[g] == 0:
                continue
            for ty in range(rmin[g, 1], rmax[g, 1]):
                for tx in range(rmin[g, 0], rmax[g, 0]):
                    tiles.append(ty * 2 + tx)
        tiles = np.array(tiles[:BUDGET], dtype=np.int64)   # budget cap
        want = np.bincount(tiles, minlength=4)
        tile_ids = np.asarray(inst.tile_ids)
        valid = np.asarray(inst.valid)
        got = np.bincount(tile_ids[valid], minlength=5)[:4]
        np.testing.assert_array_equal(got, want)
        if len(tiles) == BUDGET and int(cnt.sum()) > BUDGET:
            assert bool(inst.overflowed)


@functools.lru_cache(maxsize=8)
def _capped_fns(vis_cap, width, height):
    cam = make_test_camera(width=width, height=height)
    kw = _cam_arrays(cam)

    def loss(means, scales, quats, colors, opac, target):
        qn = quats / jnp.linalg.norm(quats, axis=1, keepdims=True)
        out = rasterize(means, scales, qn, colors, opac, width=width,
                        height=height, bg=jnp.full(3, 0.5), budget=BUDGET,
                        chunk_size=CHUNK, backend="pallas", vis_cap=vis_cap,
                        **kw)
        return (jnp.sum((out.image - target) ** 2)
                + 0.1 * jnp.sum(out.final_t)), out.vis_overflowed

    return (jax.jit(loss),
            jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4), has_aux=True)))


@pytest.mark.tpu
def test_vis_cap_lossless_and_overflow(rng):
    """vis_cap >= n_vis: the visible-prefix gather-table slice is LOSSLESS —
    image and all five analytic gradients bit-match the uncapped path; a cap
    below n_vis sets vis_overflowed (deepest splats dropped, host reacts)."""
    scene = _scene(rng, 80)
    target = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    l_ref, g_ref = _grad_fn("pallas", 32, 32)
    base_loss = l_ref(*scene, target)
    base_grads = g_ref(*scene, target)

    # generous cap (== G): lossless, flag off
    l_cap, g_cap = _capped_fns(80, 32, 32)
    loss_v, ovf = l_cap(*scene, target)
    np.testing.assert_array_equal(np.asarray(loss_v), np.asarray(base_loss))
    assert not bool(ovf)
    grads_v, _ = g_cap(*scene, target)
    for a, b in zip(base_grads, grads_v):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # tight cap: must flag, and capped grads must stay finite
    l_t, g_t = _capped_fns(4, 32, 32)
    _, ovf_t = l_t(*scene, target)
    assert bool(ovf_t)
    grads_t, _ = g_t(*scene, target)
    for g in grads_t:
        assert np.isfinite(np.asarray(g)).all()
