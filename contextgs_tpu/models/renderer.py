"""Scene rendering: prefilter → neural gaussian decode → tile rasterization.

Behavioral spec: /root/reference/gaussian_renderer/__init__.py:155-287
(render + prefilter_voxel). One fused jittable function; the screenspace
gradient needed by densification is exposed through a zero-valued `screen_dummy`
input added to the projected means (the reference uses the same dummy-tensor
trick, ref :168-173), scaled to the reference's NDC convention (×0.5·W) so the
densify_grad_threshold transfers unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from contextgs_tpu.config import ModelConfig, OptimizationConfig, PipelineConfig
from contextgs_tpu.models import state as st
from contextgs_tpu.models.decode import DecodeAux, NeuralGaussians, \
    generate_neural_gaussians
from contextgs_tpu.models.levels import LevelMaps
from contextgs_tpu.ops import rasterize as rz


class RenderOutput(NamedTuple):
    image: jnp.ndarray           # [3,H,W]
    final_t: jnp.ndarray         # [H,W]
    gaussians: NeuralGaussians
    radii: jnp.ndarray           # [NK] int32
    visibility: jnp.ndarray      # [NK] bool (radius>0)
    aux: DecodeAux
    overflowed: jnp.ndarray
    vis_overflowed: jnp.ndarray  # [] bool — vis_cap exceeded (False if off)
    n_instances: jnp.ndarray     # [] int32 — true tile-instance count
    n_vis: jnp.ndarray           # [] int32 — gaussians touching >=1 tile


def prefilter_voxel(params: st.Params, buffers: st.Buffers, cam: dict,
                    width: int, height: int) -> jnp.ndarray:
    """Anchor frustum culling (ref prefilter_voxel, :232-287): anchors tested
    with their first-3 scaling and identity rotation."""
    anchor_q = st.get_anchor(params, buffers)
    scales = st.get_scaling(params)[:, :3]
    vis = rz.visible_filter(anchor_q, scales, cam["world_view"],
                            cam["full_proj"], cam["tanfovx"], cam["tanfovy"],
                            width, height, valid=buffers.alive)
    return vis & buffers.alive


def render(params: st.Params, buffers: st.Buffers, cfg: ModelConfig,
           opt: OptimizationConfig, pipe: PipelineConfig, cam: dict,
           width: int, height: int, bg: jnp.ndarray, key: jax.Array,
           *, phase: str, training: bool, maps: LevelMaps | None = None,
           visible_mask: jnp.ndarray | None = None,
           screen_dummy: jnp.ndarray | None = None,
           budget: int = 1 << 18, scale_modifier=1.0,
           vis_cap: int | None = None) -> RenderOutput:
    if visible_mask is None:
        visible_mask = prefilter_voxel(params, buffers, cam, width, height)

    ng, aux = generate_neural_gaussians(
        params, buffers, cfg, opt, cam["camera_center"], visible_mask, key,
        phase=phase, training=training, maps=maps)

    quats = ng.rot
    out = rz.rasterize(
        ng.xyz, ng.scaling, quats, ng.color, ng.opacity,
        world_view=cam["world_view"], full_proj=cam["full_proj"],
        tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
        width=width, height=height, bg=bg,
        tile_size=pipe.tile_size, budget=budget, chunk_size=pipe.chunk_size,
        backend=pipe.backend if pipe.backend != "auto" else "pallas",
        valid=ng.gauss_valid, screen_dummy=screen_dummy,
        scale_modifier=scale_modifier, vis_cap=vis_cap)

    return RenderOutput(image=out.image, final_t=out.final_t, gaussians=ng,
                        radii=out.radii, visibility=out.visibility, aux=aux,
                        overflowed=out.overflowed,
                        vis_overflowed=out.vis_overflowed,
                        n_instances=out.n_instances, n_vis=out.n_vis)
