"""Profile the per-bounce cost components of the PT integrator at 512^2.

Times each stage in isolation (jitted, warmed) so we know where the
~100 ms/pass goes before optimizing. Not a test; a diagnostic tool.
"""
import copy
import time

import jax
import jax.numpy as jnp

from tests.fixtures import CBOX_JSON
from vision_tpu.scene.scene import Scene
from vision_tpu.integrator import pt
from vision_tpu.core import rng, warp
from vision_tpu.core.types import Ray
from vision_tpu.core.math import coordinate_system, to_local
from vision_tpu.shading import bsdf as ub
from vision_tpu.shading.materials import gather_params
from vision_tpu.lights import lights as lt

RES = 512


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:34s} {dt:8.3f} ms")
    return out


def main():
    s = copy.deepcopy(CBOX_JSON)
    s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = [RES, RES]
    sc = Scene(s)
    scene = sc.data
    camera = sc.camera
    n = RES * RES
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % RES).astype(jnp.float32)
    py = (pix // RES).astype(jnp.float32)
    st = rng.seed(pix, jnp.uint32(7))
    st, u_film = rng.next_2d(st)
    p_film = jnp.stack([px + 0.5, py + 0.5], -1)
    st, u_lens = rng.next_2d(st)
    ray = camera.generate_ray(p_film, u_lens)

    spectrum = scene.spectrum
    st2, swl = spectrum.sample_wavelengths(st)

    f_trace = jax.jit(lambda r: pt.trace_closest(scene, r))
    hit = timeit("trace_closest", f_trace, ray)

    f_occ = jax.jit(lambda r: pt.trace_occluded(scene, r))
    timeit("trace_occluded", f_occ, ray)

    f_int = jax.jit(lambda r, h: pt.compute_interaction(scene, r, h))
    pos, ng, ns, uv, inst, mat_id, light_id = timeit(
        "compute_interaction", f_int, ray, hit)

    f_env = jax.jit(lambda d: (lt.env_radiance(scene.lights, scene.atlas, d,
                                               spectrum, swl),
                               lt.env_pdf_wi(scene.lights, d)))
    timeit("env_radiance+pdf", f_env, ray.direction)

    f_hit_area = jax.jit(lambda: lt.eval_hit_area(
        scene.lights, light_id, hit.prim_id, None, ray.origin, pos, ng, uv,
        scene.atlas, spectrum, swl))
    timeit("eval_hit_area", f_hit_area)

    f_gp = jax.jit(lambda m, u: gather_params(scene.materials, scene.atlas,
                                              m, u, spectrum, swl))
    params, disp = timeit("gather_params", f_gp, mat_id, uv)

    t, b = coordinate_system(ns)
    wo_l = to_local(t, b, ns, -ray.direction)

    f_alb = jax.jit(lambda p, w: ub.albedo(p, w))
    timeit("ub.albedo", f_alb, params, wo_l)

    f_nee_sample = jax.jit(lambda u1, u2: lt.sample_wi(
        scene.lights, scene.atlas, scene.tri_pack, pos, ns, u1, u2,
        scene.world_radius, spectrum, swl))
    stx, u_sel = rng.next_1d(st2)
    stx, u_l2 = rng.next_2d(stx)
    ls = timeit("lt.sample_wi", f_nee_sample, u_sel, u_l2)

    wi_l = to_local(t, b, ns, ls.wi)
    f_eval = jax.jit(lambda p, wo, wi: ub.evaluate(p, wo, wi))
    timeit("ub.evaluate (NEE)", f_eval, params, wo_l, wi_l)

    f_sample = jax.jit(lambda p, wo, s: ub.sample(p, wo, s))
    timeit("ub.sample", f_sample, params, wo_l, stx)

    # full bounce + full pass for reference
    f_pass = jax.jit(lambda fr: pt.render_sample(scene, camera, sc.filter, fr,
                                                 max_depth=8))
    timeit("render_sample d8 (full pass)", f_pass, jnp.uint32(3), iters=5)
    f_pass1 = jax.jit(lambda fr: pt.render_sample(scene, camera, sc.filter, fr,
                                                  max_depth=1))
    timeit("render_sample d1", f_pass1, jnp.uint32(3), iters=5)


if __name__ == "__main__":
    main()
