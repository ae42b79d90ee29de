"""Profile the per-bounce sub-stages of the PT integrator on the chip.

Times each jitted stage at the bench resolution so optimization effort goes
where the milliseconds are. Also micro-tests the [R,3] vs component-form
VPU-lane-utilization hypothesis.
"""
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    import copy
    from tests.fixtures import CBOX_JSON
    from vision_tpu.scene.scene import Scene
    from vision_tpu.integrator import pt
    from vision_tpu.core import rng
    from vision_tpu.core.types import Ray
    from vision_tpu.core.math import coordinate_system, to_local
    from vision_tpu.shading import bsdf as ub
    from vision_tpu.shading.materials import gather_params
    from vision_tpu.lights import lights as lt

    RES = 512
    s = copy.deepcopy(CBOX_JSON)
    s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = [RES, RES]
    sc = Scene(s)
    scene = sc.data
    cam = sc.camera

    R = RES * RES
    pix = jnp.arange(R, dtype=jnp.uint32)
    px = (pix % RES).astype(jnp.float32)
    py = (pix // RES).astype(jnp.float32)
    st = rng.seed(pix, jnp.uint32(7))
    p_film = jnp.stack([px + 0.5, py + 0.5], -1)
    ray = cam.generate_ray(p_film, jnp.zeros((R, 2)))

    spectrum = scene.spectrum
    st2, swl = spectrum.sample_wavelengths(st)

    f_closest = jax.jit(lambda r: pt.trace_closest(scene, r))
    f_occ = jax.jit(lambda r: pt.trace_occluded(scene, r))
    hit = f_closest(ray)

    f_inter = jax.jit(lambda r, h: pt.compute_interaction(scene, r, h))
    pos, ng, ns, uv, inst, mat_id, light_id = f_inter(ray, hit)

    f_gather = jax.jit(lambda mid, uv_: gather_params(
        scene.materials, scene.atlas, mid, uv_, spectrum, swl))
    params, _ = f_gather(mat_id, uv)

    t, b = coordinate_system(ns)
    wo = -ray.direction
    wo_l = to_local(t, b, ns, wo)
    wi_l = jnp.roll(wo_l, 1, axis=0)

    f_eval = jax.jit(lambda p, a, c: ub.evaluate(p, a, c))
    f_sample = jax.jit(lambda p, a, s_: ub.sample(p, a, s_))
    f_albedo = jax.jit(lambda p, a: ub.albedo(p, a))

    def nee(pos_, ns_, st_):
        st_, u_sel = rng.next_1d(st_)
        st_, u_l2 = rng.next_2d(st_)
        return lt.sample_wi(scene.lights, scene.atlas, scene.tri_pack,
                            pos_, ns_, u_sel, u_l2, scene.world_radius,
                            spectrum, swl)
    f_nee = jax.jit(nee)

    def full_bounce(c):
        return pt._bounce(scene, spectrum, swl, False, 1.0, 0, 1.0,
                          jnp.zeros((), jnp.int32), c)
    carry = pt._init_carry(scene, spectrum, ray, st2, swl)
    f_bounce = jax.jit(full_bounce)

    def sample_pass(frame):
        img, aovs = pt.render_sample(scene, cam, sc.filter, frame, max_depth=8)
        return img, aovs["nrays"]
    f_pass = jax.jit(sample_pass)

    print(f"R = {R}, tris = {scene.tri_p0.shape[0]}")
    print(f"trace_closest      {timeit(f_closest, ray):8.3f} ms")
    print(f"trace_occluded     {timeit(f_occ, ray):8.3f} ms")
    print(f"compute_interact   {timeit(f_inter, ray, hit):8.3f} ms")
    print(f"gather_params      {timeit(f_gather, mat_id, uv):8.3f} ms")
    print(f"bsdf.evaluate      {timeit(f_eval, params, wo_l, wi_l):8.3f} ms")
    print(f"bsdf.sample        {timeit(f_sample, params, wo_l, st):8.3f} ms")
    print(f"bsdf.albedo        {timeit(f_albedo, params, wo_l):8.3f} ms")
    print(f"nee sample_wi      {timeit(f_nee, pos, ns, st):8.3f} ms")
    print(f"FULL _bounce       {timeit(f_bounce, carry):8.3f} ms")
    print(f"render_sample d8   {timeit(f_pass, jnp.uint32(3), iters=8):8.3f} ms")

    # ---- layout micro-test: [R,3] vs component-form elementwise math ----
    a3 = jnp.ones((R, 3)); b3 = jnp.ones((R, 3))
    ac = tuple(jnp.ones((R,)) for _ in range(3))
    def vec_math(a, b):
        c = a * b + a
        for _ in range(8):
            c = c * b + a
        return c
    def comp_math(a, b):
        cs = []
        for ai, bi in zip(a, b):
            c = ai * bi + ai
            for _ in range(8):
                c = c * bi + ai
            cs.append(c)
        return cs
    fv = jax.jit(vec_math); fc = jax.jit(comp_math)
    print(f"[R,3] chain        {timeit(fv, a3, b3, iters=50):8.3f} ms")
    print(f"[R]x3 comp chain   {timeit(fc, ac, ac, iters=50):8.3f} ms")


if __name__ == "__main__":
    main()
