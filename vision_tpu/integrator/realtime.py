"""Real-time integrator: G-buffer + ReSTIR DI + 1spp GI + SVGF.

Equivalent of the reference `rt` integrator
(`/root/reference/src/render_core/integrator/rt.cpp` render flow, SURVEY.md
§3.3): compute_GBuffer -> ReSTIR DI dispatch -> indirect pass -> SVGF
reproject/filter. State (reservoirs, SVGF history, previous G-buffer) is an
explicit pytree carried across frames — the functional analog of the
reference's persistent device buffers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core import rng
from ..core.math import coordinate_system, to_local, to_world
from ..core.types import Ray
from ..post import svgf as svgf_mod
from ..sensor.gbuffer import compute_gbuffer
from ..shading import bsdf as ub
from ..shading.materials import gather_params
from . import pt, restir


@struct.dataclass
class RealTimeState:
    reservoir: object     # restir.Reservoir
    gbuffer: object       # GBuffer (previous frame)
    svgf: object          # SVGFState
    frame: jnp.ndarray    # scalar int

    @classmethod
    def initial(cls, resolution):
        W, H = resolution
        return cls(reservoir=restir.Reservoir.empty(W * H),
                   gbuffer=None, svgf=svgf_mod.init_state(H, W),
                   frame=jnp.zeros((), jnp.int32))


def indirect_bounce(scene, gb, state, max_depth=3):
    """1-sample indirect illumination continuing from the G-buffer surface
    (ReSTIR GI initial-sample stand-in; full GI reservoirs in a later round)."""
    params, _ = gather_params(scene.materials, scene.atlas, gb.mat_id, gb.uv)
    t, b = coordinate_system(gb.normal)
    wo_l = to_local(t, b, gb.normal, gb.wo)
    state, bs = ub.sample(params, wo_l, state)
    wi = to_world(t, b, gb.normal, bs.wi)
    f_cos = bs.ev.f * jnp.abs(bs.wi[..., 2])[..., None]
    thr = jnp.where((bs.valid & gb.valid)[..., None],
                    f_cos / jnp.maximum(bs.ev.pdf, 1e-9)[..., None], 0.0)
    ray = Ray.make(pt.spawn_origin(gb.pos, gb.normal, wi), wi)
    L, _ = pt.radiance(scene, ray, state, max_depth=max_depth)
    return state, L * thr


def render_realtime(scene, camera, rt_state, m_light=8, spatial_taps=2,
                    svgf_passes=3, gi=True, prev_camera=None):
    """One real-time frame. Returns (display image [H, W, 3], new state).
    Pass prev_camera when the camera moved so motion vectors reproject
    correctly (sensor.cpp store_prev_data analog)."""
    W, H = camera.resolution
    frame = rt_state.frame
    prev_cam = prev_camera if prev_camera is not None else camera

    gb = compute_gbuffer(scene, camera, frame, prev_camera=prev_cam)
    n = W * H
    st = rng.seed(jnp.arange(n, dtype=jnp.uint32) ^ jnp.uint32(0x9e3779b9),
                  frame.astype(jnp.uint32))

    prev = None
    if rt_state.gbuffer is not None:
        prev = (rt_state.reservoir, rt_state.gbuffer)
    st, L_direct, new_res = restir.restir_di(
        scene, gb, st, prev=prev, frame_index=frame, m_light=m_light,
        spatial_taps=spatial_taps, resolution=(W, H))

    if gi:
        st, L_ind = indirect_bounce(scene, gb, st)
        L = L_direct + L_ind
    else:
        L = L_direct

    # env for primary misses
    from ..lights import lights as lt
    env = lt.env_radiance(scene.lights, scene.atlas, -gb.wo)
    L = jnp.where(gb.valid[..., None], L, env)

    img = L.reshape(H, W, 3)
    filtered, new_svgf = svgf_mod.svgf_filter(
        img, gb.albedo.reshape(H, W, 3), gb.normal.reshape(H, W, 3),
        gb.depth.reshape(H, W), gb.motion.reshape(H, W, 2),
        rt_state.svgf, n_passes=svgf_passes)

    new_state = RealTimeState(reservoir=new_res, gbuffer=gb, svgf=new_svgf,
                              frame=frame + 1)
    return filtered, new_state
