"""Pallas TPU kernels: per-tile front-to-back alpha blending, fwd + analytic bwd.

Replaces the CUDA reference's tile rasterizer (forward: renderCUDA; backward:
back-to-front gradient replay; ref submodules/diff-gaussian-rasterization,
interface reconstructed in SURVEY.md §2.9). TPU-first design:

- Grid = one program per 16x16 tile (TILES_PER_STEP tiles per grid step). The
  tile's 256 pixels live on the *sublane* axis; instances stream through VMEM
  on the *lane* axis in chunks of C, DMA'd from a component-major [16, B_pad]
  HBM table at the tile's segment offset. Segments are pre-aligned to C
  (sorting.py), so every DMA is lane-aligned and chunks never cross tiles —
  no masking, no overlap. (Mosaic requires DMA slices aligned to the 128-lane
  tiling, which rules out streaming a row-major [B_pad, 16] table directly.)
- The sequential front-to-back transmittance recurrence is restated as an
  exclusive prefix sum of log(1-alpha) along the chunk axis, computed with a
  triangular matmul on the MXU; color accumulation is a [3,C]@[C,PIX] matmul
  emitting CHANNEL-MAJOR pixels. No atomics, no per-pixel scalar loops.
- Outputs are channel-major [4, n_tiles*PIX]: an output row uses all 128
  lanes and the per-step output DMA is dense. (The previous [*, PIX, 8]
  layout put the 8 channels on the lane axis — 8/128 lanes live in every
  epilogue vreg and 32-byte strided output DMAs; measured ~0.6 us/tile of
  pure epilogue floor.) The per-tile chunk watermark is a separate scalar
  output, not an image channel.
- Chunk DMA is v4-style (scripts/kvariants.py): chunk 0 is issued and awaited
  inside the loop body, the next chunk double-buffers behind compute. A
  step-level cross-tile prefetch stage was measured SLOWER than this (~4 ms
  at 3600 one-chunk tiles): its extra bounds reads, conditional DMA starts
  and VMEM->VMEM landing copies cost more than the HBM latency it hides.
- Backward replays chunks front-to-back (not back-to-front like CUDA): the
  suffix color sum S_i needed for dL/dalpha is recovered from the saved final
  accumulated color minus an inclusive prefix — forward residuals are just
  the forward outputs.
- Per-instance gradients go to disjoint lane segments of a [16, B_pad] HBM
  buffer through an NG-deep DMA ring, then reach per-gaussian form via the
  autodiff transpose of the instance gather (an XLA segment-sum over
  depth-contiguous rows). Chunks the forward early-terminated away (past the
  watermark) are zeroed IN-KERNEL by DMAs from a zero buffer, so the XLA side
  needs no written-mask pass: every aligned slot the gradient reduce can
  reference is kernel-written.

Component row layout (16 rows; Mosaic DMA slices must be sublane-aligned to 8,
and the kernel is chunk-overhead/VPU-bound, not DMA-bandwidth-bound, so the pad
rows are free): [mean_x, mean_y, conic_a, conic_b, conic_c, opacity, r, g, b,
pad...]. Gradient rows use the same layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from contextgs_tpu.ops.rasterize.common import (ALPHA_EPS, LOG_T_EPS,  # noqa: F401
                                                MAX_ALPHA, T_EPS)

PACK = 16          # instance component rows (sublane-tiling multiple of 8)
PIX = 256          # pixels per 16x16 tile
OUTC = 4           # output channels per pixel: rgb + final T (channel-major)
ET_MIN_CHUNKS = 2  # segments at most this long skip the early-term check
NG = 4             # backward gradient out-DMA ring depth
TILES_PER_STEP = 8  # grid steps carry fixed overhead (~30 us); batch tiles


def _pixel_basis(tile_size: int):
    """Quadratic pixel basis for MXU power evaluation — TILE-INDEPENDENT.

    The per-(pixel,instance) gaussian exponent is a quadratic form in pixel
    coordinates, so for a whole tile it factors as one [PIX,8]·[8,C] matmul:
    power = P @ coef with P rows [1, px', py', px'², py'², px'·py', 0, 0] in
    TILE-CENTERED coordinates (px' = px - cx). Centering keeps every term
    O(conic·radius²) ~ O(10) so f32 matmul accumulates no worse error than
    the CUDA reference's dx-first evaluation; in global coordinates the
    px²-scale terms (~1e5-1e6) would swamp the O(1) exponent. Centering also
    makes P identical for every tile (px' = p%ts − (ts−1)/2), so it is built
    ONCE per kernel invocation and shared by all tiles of all grid steps.
    """
    p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    half = (tile_size - 1) * 0.5
    px = (p % tile_size).astype(jnp.float32) - half
    py = (p // tile_size).astype(jnp.float32) - half
    one = jnp.ones((PIX, 1), jnp.float32)
    zero = jnp.zeros((PIX, 2), jnp.float32)
    return jnp.concatenate([one, px, py, px * px, py * py, px * py, zero],
                           axis=1)


def _tile_center(t, tiles_x: int, tile_size: int, row_offset: int = 0):
    """(cx, cy) pixel-space center scalars of tile `t` (band-local rows)."""
    tile_y = t // tiles_x + row_offset
    tile_x = t - (t // tiles_x) * tiles_x
    cx = (tile_x * tile_size + (tile_size - 1) * 0.5).astype(jnp.float32)
    cy = (tile_y * tile_size + (tile_size - 1) * 0.5).astype(jnp.float32)
    return cx, cy


def _tri(c: int, strict: bool) -> jnp.ndarray:
    """[C,C] bf16 upper-triangular ones: x @ _tri gives a lane prefix sum.

    Lane scans are the kernels' hottest VPU block: a Hillis-Steele roll scan
    costs ~3·log2(C) full [PIX,C] passes, while one [PIX,C]@[C,C] matmul rides
    the MXU — 35% faster fwd at C=128. The transmittance recurrence therefore
    runs in log space (log1p/exp at ~1e-6 relative error; sums are bounded by
    log(T_EPS)≈-9 in the included region, so no precision compounding)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return ((i < j) if strict else (i <= j)).astype(jnp.bfloat16)


def _eye_bf16(n: int) -> jnp.ndarray:
    """[n,n] bf16 identity for MXU transposes of narrow columns."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (i == j).astype(jnp.bfloat16)


def _split3(x: jnp.ndarray):
    """f32 → (hi, mid, lo) bf16 with hi+mid+lo == x to ~2^-27 relative.

    Manual bf16x3 operand split: XLA's HIGHEST f32 matmul spends 6 MXU passes
    (both operands split ×3, low-order cross terms dropped); every matmul in
    these kernels has ONE operand that is exactly bf16-representable (the 0/1
    triangular scan mask; the pixel basis P, whose entries are quarter-integer
    |v| ≤ 57 ⊂ bf16), so splitting just the other operand gives the same f32
    accuracy in 3 passes — the kernels' dominant MXU work, halved."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot3(a, b, dims, split: str):
    """dot_general with the `split` operand ('a'|'b') decomposed bf16x3; the
    other operand must be exactly bf16-representable. f32 accumulation."""
    kw = dict(preferred_element_type=jnp.float32)
    if split == "a":
        h, m, l = _split3(a)
        b = b.astype(jnp.bfloat16)
        return (jax.lax.dot_general(h, b, dims, **kw)
                + (jax.lax.dot_general(m, b, dims, **kw)
                   + jax.lax.dot_general(l, b, dims, **kw)))
    h, m, l = _split3(b)
    a = a.astype(jnp.bfloat16)
    return (jax.lax.dot_general(a, h, dims, **kw)
            + (jax.lax.dot_general(a, m, dims, **kw)
               + jax.lax.dot_general(a, l, dims, **kw)))


def _scan_matmul(x: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """Lane prefix sum of [PIX,C] via the MXU: x @ tri (bf16x3 passes)."""
    return _dot3(x, tri, (((1,), (0,)), ((), ())), split="a")


def _col2row(x: jnp.ndarray, eye: jnp.ndarray) -> jnp.ndarray:
    """[N,k] → [k,N] exact transpose via the MXU (x split bf16x3 against the
    0/1 identity). A [N,1] f32 column occupies N/8 vregs at 1/128 lane use;
    Mosaic's generic relayout of that shape is a long shuffle ladder, while
    this is 3 skinny MXU passes."""
    return _dot3(x, eye, (((0,), (0,)), ((), ())), split="a")


def _chunk_coef(data, cx, cy):
    """Per-instance quadratic coefficients in tile-centered coordinates.

    data [PACK,C] component-major → (coef [8,C] for the P@coef power matmul,
    dict of centered per-instance rows for the backward chain). The exact
    power≤0 guard of the scalar evaluation becomes a clamp min(power,0):
    matmul rounding can push a near-center power to +1e-6 and a hard guard
    would zero an alpha≈opacity pixel, a large pointwise error; the clamp is
    within fp noise of the reference everywhere.
    """
    mx = data[0:1, :] - cx
    my = data[1:2, :] - cy
    ca, cb, cc = data[2:3, :], data[3:4, :], data[4:5, :]
    op = data[5:6, :]
    c0 = -0.5 * (ca * mx * mx + cc * my * my) - cb * mx * my
    c1 = ca * mx + cb * my
    c2 = cc * my + cb * mx
    zeros = jnp.zeros_like(c0)
    coef = jnp.concatenate(
        [c0, c1, c2, -0.5 * ca, -0.5 * cc, -cb, zeros, zeros], axis=0)
    return coef, dict(mx=mx, my=my, ca=ca, cb=cb, cc=cc, op=op)


def _power_alpha(P, coef, op, exact_p: bool = True):
    """power = clamp(P@coef, ≤0) on the MXU; alpha with CUDA skip rules."""
    dims = (((1,), (0,)), ((), ()))
    if exact_p:     # tile_size ≤ 16: P is exactly bf16 → 3-pass (see _dot3)
        power = _dot3(P, coef, dims, split="b")           # [PIX,C]
    else:
        power = jax.lax.dot_general(
            P, coef, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)           # [PIX,C]
    power = jnp.minimum(power, 0.0)
    gauss = jnp.exp(power)
    raw = op * gauss
    alpha = jnp.minimum(MAX_ALPHA, raw)
    alpha = jnp.where(alpha >= ALPHA_EPS, alpha, 0.0)
    return power, gauss, raw, alpha


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(bounds_ref, packed_hbm, out_ref, wm_ref, chunk, sem, *,
                chunk_size: int, tiles_x: int, tile_size: int,
                row_offset: int, tiles_per_step: int):
    step = pl.program_id(0)
    C = chunk_size
    tri = _tri(C, strict=True)
    P = _pixel_basis(tile_size)
    eye = _eye_bf16(PIX)
    for j in range(tiles_per_step):
        t = step * tiles_per_step + j
        _fwd_one_tile(bounds_ref, packed_hbm, out_ref, wm_ref, chunk, sem,
                      t, j, C, tiles_x, tile_size, row_offset, tri, P, eye)


def _fwd_one_tile(bounds_ref, packed_hbm, out_ref, wm_ref, chunk, sem,
                  t, j, C, tiles_x, tile_size, row_offset, tri, P, eye):
    start = bounds_ref[t]
    nchunks = (bounds_ref[t + 1] - start) // C   # segments are multiples of C
    cx, cy = _tile_center(t, tiles_x, tile_size, row_offset)

    def dma(slot, ci):
        off = pl.multiple_of(start + ci * C, 128)
        return pltpu.make_async_copy(packed_hbm.at[:, pl.ds(off, C)],
                                     chunk.at[slot], sem.at[slot])

    def cond(state):
        ci, t_run, _ = state
        # CUDA-style early termination, chunk-granular: BREAK the stream once
        # every pixel of the tile is saturated — skips the remaining chunks'
        # DMAs entirely, not just their compute. The jnp.max is a
        # vector→scalar sync on the loop's critical path, which is why short
        # segments take the fori_loop path below instead.
        return (ci < nchunks) & (jnp.max(t_run) >= T_EPS)

    def body(state):
        ci, t_run, rgb = state
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci == 0)
        def _():
            dma(0, 0).start()

        # prefetch the next chunk while this one computes (double buffering)
        @pl.when(ci + 1 < nchunks)
        def _():
            dma(1 - slot, ci + 1).start()
        dma(slot, ci).wait()

        coef, row = _chunk_coef(chunk[slot], cx, cy)
        _, _, _, alpha = _power_alpha(P, coef, row["op"],
                                      exact_p=tile_size <= 16)
        one_m = 1.0 - alpha
        # log-domain transmittance on the MXU (see _tri): T before instance i
        # = t_run · exp(Σ_{j<i} log(1-α_j)). Early-termination semantics are
        # unchanged: `include` is monotone along lanes (tcum non-increasing),
        # so for included i the prefix over all j<i equals the prefix over
        # included j, and the carry-out is the last included tcum.
        s_excl = _scan_matmul(jnp.log1p(-alpha), tri)
        t_before = t_run * jnp.exp(s_excl)   # T before instance i
        tcum = t_before * one_m              # T after instance i
        include = tcum >= T_EPS
        w = jnp.where(include, alpha, 0.0) * t_before      # [PIX,C]
        col = chunk[slot, 6:9, :]                          # [3,C]
        # channel-major accumulation: [3,C] x [PIX,C] contracting C → [3,PIX]
        rgb = rgb + jax.lax.dot_general(
            col, w, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)            # [3,PIX]
        t_run = jnp.min(jnp.where(include, tcum, t_run), axis=1,
                        keepdims=True)
        return ci + 1, t_run, rgb

    t0 = jnp.ones((PIX, 1), jnp.float32)
    rgb0 = jnp.zeros((3, PIX), jnp.float32)

    def epilogue(ci_end, t_run, rgb):
        # the backward replays exactly ci_end chunks (fori, no per-chunk
        # sync) and zeroes the gradient region past it in-kernel
        wm_ref[t] = ci_end
        t_row = _col2row(t_run, eye)                       # [1,PIX]
        out_ref[:, j * PIX:(j + 1) * PIX] = jnp.concatenate([rgb, t_row],
                                                            axis=0)

    # Short segments (the common case: segments average 1-2 chunks) run a
    # fori_loop with no early-termination check — the check's vector→scalar
    # sync costs about as much as blending another chunk. Long segments keep
    # the early-breaking while_loop, where the sync amortizes and the skipped
    # tail dominates. pl.when branches (not lax.cond) so only one loop
    # executes.
    @pl.when(nchunks <= ET_MIN_CHUNKS)
    def _():
        t_run, rgb = jax.lax.fori_loop(
            0, nchunks, lambda ci, st: body((ci,) + st)[1:], (t0, rgb0))
        epilogue(nchunks, t_run, rgb)

    @pl.when(nchunks > ET_MIN_CHUNKS)
    def _():
        ci_end, t_run, rgb = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t0, rgb0))

        # drain the prefetched-but-unconsumed chunk after an early break
        @pl.when(ci_end < nchunks)
        def _():
            dma(jax.lax.rem(ci_end, 2), ci_end).wait()

        epilogue(ci_end, t_run, rgb)


def blend_forward_pallas(packed: jnp.ndarray, tile_bounds: jnp.ndarray,
                         n_tiles: int, tiles_x: int, tile_size: int,
                         chunk_size: int, interpret: bool,
                         row_offset: int = 0):
    """packed [PACK, B_pad] f32, tile_bounds [n_tiles_pad+1] i32 →
    (out [OUTC, n_tiles_pad*PIX] f32, watermark [n_tiles_pad] i32)
    with n_tiles_pad = ceil(n_tiles/TILES_PER_STEP)·TILES_PER_STEP.

    Output rows: 0-2 accumulated RGB (no background), 3 final T — pixels
    channel-major (tile-major within a row). The watermark is the per-tile
    processed-chunk count (early termination).
    """
    tb = TILES_PER_STEP
    n_steps = -(-n_tiles // tb)
    n_pad = n_steps * tb
    # padded tiles get empty segments
    tile_bounds = jnp.concatenate(
        [tile_bounds,
         jnp.broadcast_to(tile_bounds[-1:], (n_pad - n_tiles,))])
    kernel = functools.partial(_fwd_kernel, chunk_size=chunk_size,
                               tiles_x=tiles_x, tile_size=tile_size,
                               row_offset=row_offset, tiles_per_step=tb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec((OUTC, tb * PIX), lambda i, b: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, PACK, chunk_size), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((OUTC, n_pad * PIX), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad,), jnp.int32)],
        interpret=interpret,
    )(tile_bounds, packed)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(bounds_ref, wm_ref, packed_hbm, fwd_ref, cot_ref, grad_hbm,
                chunk, gchunk, zbuf, sem_in, sem_out, *,
                chunk_size: int, tiles_x: int, tile_size: int,
                row_offset: int, tiles_per_step: int):
    C = chunk_size
    step = pl.program_id(0)
    # zero source for the post-watermark region; rewritten every step (cheap)
    # so no cross-step scratch-persistence assumption is needed
    zbuf[...] = jnp.zeros_like(zbuf)
    tri_s = _tri(C, strict=True)
    tri_i = _tri(C, strict=False)
    P = _pixel_basis(tile_size)
    eye = _eye_bf16(PIX)
    # the only two pixel-COLUMN quantities the chunk math needs per tile:
    # q_p = (C_total·dL/dC)_p and (dL/dT_final·T_final)_p. Compute the rows
    # channel-major for ALL tiles of the step, then ONE skinny MXU transpose
    # of the [2·tb, PIX] stack — per-TILE [2,PIX] transposes cost nearly the
    # same each (the [PIX,PIX] operand load dominates the pass), measured
    # +1.3 ms at 3600 tiles.
    q_rows = jnp.sum(cot_ref[:3, :] * fwd_ref[:3, :], axis=0, keepdims=True)
    gt_rows = cot_ref[3:4, :] * fwd_ref[3:4, :]          # [1, tb*PIX]
    qg = jnp.concatenate(
        [jnp.concatenate([q_rows[:, j * PIX:(j + 1) * PIX],
                          gt_rows[:, j * PIX:(j + 1) * PIX]], axis=0)
         for j in range(tiles_per_step)], axis=0)        # [2·tb, PIX]
    qg_cols = _dot3(eye, qg, (((1,), (1,)), ((), ())), split="b")  # [PIX,2tb]
    # STEP-GLOBAL gradient out-DMA ring: one running chunk counter across all
    # tiles of the step, wait-before-overwrite keyed on it, ONE drain at step
    # end — per-tile drains cost up to 2·NG semaphore waits per tile. Zero
    # fills (early-terminated chunks) ride the same ring with zbuf as source:
    # same transfer shape, so the slot's wait-before-reuse is uniform. zbuf is
    # rewritten at step START, safely after the previous step's drain.
    oc = jnp.int32(0)
    for j in range(tiles_per_step):
        t = step * tiles_per_step + j
        oc = _bwd_one_tile(bounds_ref, wm_ref, packed_hbm, fwd_ref, cot_ref,
                           grad_hbm, chunk, gchunk, zbuf, sem_in, sem_out,
                           t, j, C, tiles_x, tile_size, row_offset,
                           tri_s, tri_i, P, qg_cols[:, 2 * j:2 * j + 2], oc)
    for k in range(NG):
        @pl.when(oc > k)
        def _(k=k):
            s = jax.lax.rem(oc - 1 - k, NG)
            pltpu.make_async_copy(zbuf, zbuf, sem_out.at[s]).wait()


def _bwd_one_tile(bounds_ref, wm_ref, packed_hbm, fwd_ref, cot_ref, grad_hbm,
                  chunk, gchunk, zbuf, sem_in, sem_out,
                  t, j, C, tiles_x, tile_size, row_offset, tri_s, tri_i, P,
                  qg_col, oc):
    start = bounds_ref[t]
    nchunks = (bounds_ref[t + 1] - start) // C
    cx, cy = _tile_center(t, tiles_x, tile_size, row_offset)

    # channel-major residuals/cotangents (the forward's native layout —
    # consuming them directly kills the XLA [OUTC,n*PIX] → [n,PIX,OUTC]
    # relayout fusions, ~2.8 ms at 3600 tiles):
    d_rgb_cm = cot_ref[:3, j * PIX:(j + 1) * PIX]    # [3,PIX] dL/d accum rgb
    q = qg_col[:, 0:1]                               # [PIX,1]
    gtf = qg_col[:, 1:2]                             # [PIX,1] g_t·T_final

    def dma_in(slot, ci):
        off = pl.multiple_of(start + ci * C, 128)
        return pltpu.make_async_copy(packed_hbm.at[:, pl.ds(off, C)],
                                     chunk.at[slot], sem_in.at[slot])

    # the forward recorded how many chunks it processed (the watermark,
    # prefetched SMEM scalars); replay exactly that many chunks with a
    # fori_loop — no per-chunk vector→scalar early-termination sync, no
    # wasted chunks past saturation. Chunks past the watermark hold excluded
    # instances (true gradient zero): zeroed by zbuf DMAs below.
    wm = wm_ref[t]

    def body(state):
        ci, t_run, pref_u = state
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci == 0)
        def _():
            dma_in(0, 0).start()

        @pl.when(ci + 1 < wm)
        def _():
            dma_in(1 - slot, ci + 1).start()
        dma_in(slot, ci).wait()

        coef, row = _chunk_coef(chunk[slot], cx, cy)
        power, _, raw, alpha0 = _power_alpha(P, coef, row["op"],
                                             exact_p=tile_size <= 16)
        one_m = 1.0 - alpha0
        # log-domain transmittance on the MXU, identical to the forward
        T_i = t_run * jnp.exp(_scan_matmul(jnp.log1p(-alpha0), tri_s))
        tcum = T_i * one_m
        include = tcum >= T_EPS                  # single scan (see fwd)
        alpha = jnp.where(include, alpha0, 0.0)
        w = alpha * T_i                          # 0 for excluded [PIX,C]

        col = chunk[slot, 6:9, :]                # [3,C]
        u = jax.lax.dot_general(
            d_rgb_cm, col, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)              # [PIX,C]
        uw = u * w
        prefix = pref_u + _scan_matmul(uw, tri_i)
        s_dot = q - prefix                       # (S_i · dL/dC) per (p,i)
        inv_1m = 1.0 / (1.0 - alpha)
        d_alpha = T_i * u - s_dot * inv_1m - gtf * inv_1m

        active = (alpha > 0.0) & (raw < MAX_ALPHA) & (power < 0.0)
        d_alpha = jnp.where(active, d_alpha, 0.0)
        d_power = d_alpha * raw                  # = d_alpha·op·gauss

        # per-instance gradients through the quadratic coefficients: one
        # [PIX,8]ᵀ@[PIX,C] matmul replaces six sublane reductions
        dims_pc = (((0,), (0,)), ((), ()))
        if tile_size <= 16:          # P exactly bf16 → 3-pass (see _dot3)
            d_coef = _dot3(P, d_power, dims_pc, split="b")
        else:
            d_coef = jax.lax.dot_general(
                P, d_power, dims_pc,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)  # [8,C]
        d_c0, d_c1, d_c2 = d_coef[0:1], d_coef[1:2], d_coef[2:3]
        d_c3, d_c4, d_c5 = d_coef[3:4], d_coef[4:5], d_coef[5:6]
        mx, my = row["mx"], row["my"]
        ca, cb, cc, op = row["ca"], row["cb"], row["cc"], row["op"]
        rows = [
            -d_c0 * (ca * mx + cb * my) + d_c1 * ca + d_c2 * cb,
            -d_c0 * (cc * my + cb * mx) + d_c1 * cb + d_c2 * cc,
            d_c0 * (-0.5 * mx * mx) + d_c1 * mx - 0.5 * d_c3,
            d_c0 * (-mx * my) + d_c1 * my + d_c2 * mx - d_c5,
            d_c0 * (-0.5 * my * my) + d_c2 * my - 0.5 * d_c4,
            jnp.where(op > 0.0, d_c0 / jnp.maximum(op, ALPHA_EPS), 0.0),
        ]
        d_col = jax.lax.dot_general(
            d_rgb_cm, w, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # [3,C]
        gvals = jnp.concatenate(
            rows + [d_col, jnp.zeros((PACK - 9, C), jnp.float32)], axis=0)
        t_run = jnp.min(jnp.where(include, tcum, t_run), axis=1,
                        keepdims=True)
        pref_u = pref_u + jnp.sum(uw, axis=1, keepdims=True)

        # step-global NG-deep output DMA ring: wait for this slot's transfer
        # from NG writes ago (possibly a previous tile's) before overwriting
        myoc = oc + ci
        gs = jax.lax.rem(myoc, NG)

        @pl.when(myoc >= NG)
        def _():
            pltpu.make_async_copy(gchunk.at[gs], gchunk.at[gs],
                                  sem_out.at[gs]).wait()
        gchunk[gs] = gvals
        off = pl.multiple_of(start + ci * C, 128)
        pltpu.make_async_copy(gchunk.at[gs], grad_hbm.at[:, pl.ds(off, C)],
                              sem_out.at[gs]).start()
        return ci + 1, t_run, pref_u

    init = (jnp.ones((PIX, 1), jnp.float32), jnp.zeros((PIX, 1), jnp.float32))
    jax.lax.fori_loop(0, wm, lambda ci, st: body((ci,) + st)[1:], init)

    # zero the early-terminated region [wm·C, nchunks·C): excluded instances'
    # true gradient. zbuf is the read-only source; rides the same ring.
    nz = nchunks - wm

    def zbody(zi, _):
        myoc = oc + wm + zi
        zs = jax.lax.rem(myoc, NG)

        @pl.when(myoc >= NG)
        def _():
            pltpu.make_async_copy(zbuf, zbuf, sem_out.at[zs]).wait()
        off = pl.multiple_of(start + (wm + zi) * C, 128)
        pltpu.make_async_copy(zbuf, grad_hbm.at[:, pl.ds(off, C)],
                              sem_out.at[zs]).start()
        return 0

    jax.lax.fori_loop(0, nz, zbody, 0)
    return oc + nchunks


def blend_backward_pallas(packed: jnp.ndarray, tile_bounds: jnp.ndarray,
                          fwd_out: jnp.ndarray, watermarks: jnp.ndarray,
                          cotangent: jnp.ndarray,
                          n_tiles: int, tiles_x: int, tile_size: int,
                          chunk_size: int, interpret: bool,
                          row_offset: int = 0) -> jnp.ndarray:
    """Per-instance gradient table [PACK, B_pad] (same layout as packed).

    fwd_out/cotangent arrive channel-major [OUTC, n*PIX] (the forward's
    layout) and are consumed channel-major per-tile blocks directly — the
    only pixel-column quantities the chunk math needs (q and g_t·T_final)
    are produced by one skinny MXU transpose per tile, which is far cheaper
    than the XLA [OUTC,n·PIX]→[n,PIX,OUTC] relayout it replaces (~2.8 ms at
    3600 tiles, measured round 3). Every aligned slot reachable through
    `perm` is written: processed chunks get analytic gradients,
    early-terminated chunks get explicit zeros (in-kernel DMA), alignment
    fillers inside chunks get exact zeros from the math (zero rows → zero
    opacity → zero gradient).
    """
    tb = TILES_PER_STEP
    n_steps = -(-n_tiles // tb)
    n_pad = n_steps * tb
    tile_bounds = jnp.concatenate(
        [tile_bounds,
         jnp.broadcast_to(tile_bounds[-1:], (n_pad - n_tiles,))])

    def pad_cm(x):  # [OUTC, n*PIX] → [OUTC, n_pad*PIX]
        n = x.shape[1] // PIX
        if n < n_pad:   # padded tiles are never read (watermark 0)
            x = jnp.pad(x, ((0, 0), (0, (n_pad - n) * PIX)))
        return x

    fwd_cm = pad_cm(fwd_out)
    cot_cm = pad_cm(cotangent)
    kernel = functools.partial(_bwd_kernel, chunk_size=chunk_size,
                               tiles_x=tiles_x, tile_size=tile_size,
                               row_offset=row_offset, tiles_per_step=tb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((OUTC, tb * PIX), lambda i, b, w: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((OUTC, tb * PIX), lambda i, b, w: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, PACK, chunk_size), jnp.float32),
            pltpu.VMEM((NG, PACK, chunk_size), jnp.float32),
            pltpu.VMEM((PACK, chunk_size), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((NG,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(packed.shape, jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_bounds, watermarks, packed, fwd_cm, cot_cm)
