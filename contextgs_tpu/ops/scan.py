"""Pallas lane-major prefix sums: streaming cumsum kernels for the rasterizer.

XLA's `jnp.cumsum` on instance-table-sized operands (~1M elements) lowers to a
multi-kilocycle loop costing 1.5-3 ms per call on this chip (measured,
scripts/r3_micro.py); the rasterizer pipeline runs several per step (tile-sort
forward fills, gradient segment reduce). These kernels stream the array
through VMEM in lane-major blocks, scan each block with a Hillis-Steele
shift-add ladder on the VPU, and carry the running total across the
sequential grid — ~0.15-0.3 ms at the same sizes.

Exactness: integer rows are exact (i32 adds); float rows match XLA's cumsum
up to reassociation (prefix-sum reorderings within fp tolerance, same as the
oracle-vs-analytic gradient contract in tests/test_rasterize.py).

Layout notes: the scan axis is the LAST (lane) axis of a [R, N] array with R
a multiple of 8 sublanes — full VPU width at any R. Callers with 1-D or
row-major data reshape/transpose at [G]-scale, never at instance scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_BLOCK = 4096


def _block_scan(x, lb: int):
    """Inclusive Hillis-Steele scan along the last axis of [R, lb]."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < lb:
        x = x + jnp.where(lanes >= shift,
                          pltpu.roll(x, shift, 1), jnp.zeros_like(x))
        shift *= 2
    return x


def _cumsum_kernel(x_ref, out_ref, carry, *, lb: int, exclusive: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    inc = _block_scan(x_ref[...], lb)
    if exclusive:
        lanes = jax.lax.broadcasted_iota(jnp.int32, inc.shape, 1)
        exc = jnp.where(lanes >= 1, pltpu.roll(inc, 1, 1),
                        jnp.zeros_like(inc))
        out_ref[...] = exc + carry[...]
    else:
        out_ref[...] = inc + carry[...]
    carry[...] = carry[...] + inc[:, -1:]


def lane_cumsum(x: jnp.ndarray, exclusive: bool = False) -> jnp.ndarray:
    """Cumsum along the last axis of [R, N] (or [N]), any dtype with exact
    vector adds (i32/u32/f32). N is padded to the lane block internally."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    R, N = x.shape
    lb = min(LANE_BLOCK, max(512, 1 << (N - 1).bit_length()))
    n_blocks = -(-N // lb)
    n_pad = n_blocks * lb
    if n_pad != N:
        x = jnp.pad(x, ((0, 0), (0, n_pad - N)))
    kernel = functools.partial(_cumsum_kernel, lb=lb, exclusive=exclusive)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((R, lb), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, lb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, 1), x.dtype)],
        out_shape=jax.ShapeDtypeStruct((R, n_pad), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x)
    out = out[:, :N]
    return out[0] if squeeze else out
