"""Isolate the Pallas intersect kernel cost vs its layout-wrapper overhead."""
import time

import jax
import jax.numpy as jnp
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import copy
from tests.fixtures import CBOX_JSON
from vision_tpu.scene.scene import Scene
from vision_tpu.accel import pallas_isect as pi
from vision_tpu.core.types import Ray
from vision_tpu.core import rng

RES = 512
R = RES * RES


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:8.3f} ms")
    return out


def main():
    s = copy.deepcopy(CBOX_JSON)
    s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = [RES, RES]
    sc = Scene(s)
    scene = sc.data
    n = R
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % RES).astype(jnp.float32)
    py = (pix // RES).astype(jnp.float32)
    st = rng.seed(pix, jnp.uint32(7))
    st, u_lens = rng.next_2d(st)
    p_film = jnp.stack([px + 0.5, py + 0.5], -1)
    ray = sc.camera.generate_ray(p_film, u_lens)

    # full wrapper
    f_full = jax.jit(lambda r: pi.intersect_pallas(
        r, scene.tri_p0, scene.tri_e1, scene.tri_e2))
    timeit("intersect_pallas (wrapper+kernel)", f_full, ray)

    # pre-laid-out rays plane -> kernel only
    T = scene.tri_p0.shape[0]
    Tp = pi._round_up(max(T, 1), pi.TSUB)
    n_chunks = Tp // pi.TSUB
    tris = jnp.zeros((Tp, 16), jnp.float32)
    tris = tris.at[:T, 0:3].set(scene.tri_p0)
    tris = tris.at[:T, 3:6].set(scene.tri_e1)
    tris = tris.at[:T, 6:9].set(scene.tri_e2)
    Rp = pi._round_up(R, pi.RT)
    rays_plane = jnp.zeros((8, Rp), jnp.float32)
    rays_plane = rays_plane.at[0:3, :R].set(ray.origin.T)
    rays_plane = rays_plane.at[3:6, :R].set(ray.direction.T)
    rays_plane = rays_plane.at[6, :R].set(ray.t_max)

    def kernel_only(rays, tris):
        return pl.pallas_call(
            functools.partial(pi._closest_kernel, n_chunks),
            out_shape=jax.ShapeDtypeStruct((8, Rp), jnp.float32),
            grid=(Rp // pi.RT,),
            in_specs=[
                pl.BlockSpec((8, pi.RT), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, pi.RT), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(rays, tris)

    f_k = jax.jit(kernel_only)
    timeit("kernel only (pre-laid rays)", f_k, rays_plane, tris)

    # layout assembly alone
    def assemble(r):
        rays = jnp.zeros((8, Rp), jnp.float32)
        rays = rays.at[0:3, :R].set(r.origin.T)
        rays = rays.at[3:6, :R].set(r.direction.T)
        rays = rays.at[6, :R].set(r.t_max)
        return rays
    f_a = jax.jit(assemble)
    timeit("rays-plane assembly", f_a, ray)

    # post-processing alone
    out = f_k(rays_plane, tris)
    def post(out, r):
        t = out[0, :R]
        pid = out[1, :R].astype(jnp.int32)
        miss = (pid < 0) | (t >= r.t_max)
        uv = jnp.where(miss[:, None], 0.0, out[2:4, :R].T)
        return t, pid, uv
    f_p = jax.jit(post)
    timeit("hit post-processing", f_p, out, ray)

    # d2/d4 slope check on full pass
    from vision_tpu.integrator import pt
    for d in (2, 4):
        f_pass = jax.jit(functools.partial(
            pt.render_sample, scene, sc.camera, sc.filter, max_depth=d))
        timeit(f"render_sample d{d}", f_pass, jnp.uint32(3), iters=5)


if __name__ == "__main__":
    main()
