"""Validate + time the Pallas packet BVH on a real mesh scene against brute
force: correctness (hit agreement on a subsample) and Mrays/s for coherent
(tile-ordered primary) and incoherent rays, with the kernel's own
steps/leaves-per-block counters.

Usage: python tools/profile_packet.py [scene.json] [res] [iters]
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from vision_tpu.scene.scene import Scene
    from vision_tpu.accel import intersect as isect
    from vision_tpu.accel.packet_bvh import intersect_packet, _run, RT
    from vision_tpu.integrator.pt import _tile_order
    from vision_tpu.core.types import Ray
    from vision_tpu.core import rng

    scene_path = (sys.argv[1] if len(sys.argv) > 1 else
                  "/root/reference/res/render_scene/staircase/"
                  "vision_scene.json")
    RES = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    t0 = time.time()
    sc = Scene(scene_path)
    pb = sc.data.pbvh
    T = sc.data.tri_p0.shape[0]
    print(f"scene load {time.time()-t0:.1f}s, tris={T}, "
          f"nodes={pb.n_nodes}, bricks={int(jnp.max(pb.brick))+1}")

    R = RES * RES
    order = _tile_order(RES, RES)
    pix = jnp.asarray(order)
    px = (pix % RES).astype(jnp.float32)
    py = (pix // RES).astype(jnp.float32)
    p_film = jnp.stack([px + 0.5, py + 0.5], -1)
    ray = sc.camera.generate_ray(p_film, jnp.zeros((R, 2)))

    def counters(r):
        Rp = (R + RT - 1) // RT * RT
        rays = jnp.zeros((8, Rp), jnp.float32)
        rays = rays.at[0:3, :R].set(r.origin.T)
        rays = rays.at[3:6, :R].set(r.direction.T)
        rays = rays.at[6, :R].set(r.t_max)
        out = _run(pb.skip, pb.brick, pb.lo_x, pb.lo_y, pb.lo_z, pb.hi_x,
                   pb.hi_y, pb.hi_z, pb.tri, rays, False, False)
        return (np.asarray(out[4, ::RT]).mean(),
                np.asarray(out[5, ::RT]).mean())

    f_pk = lambda r: intersect_packet(r, pb)
    f_pk_any = lambda r: intersect_packet(r, pb, any_hit=True)

    t0 = time.time()
    hit_pk = f_pk(ray)
    jax.block_until_ready(hit_pk)
    print(f"first compile+run {time.time()-t0:.1f}s")

    # correctness vs brute force on a subsample
    NS = 4096
    sub = Ray(origin=ray.origin[:NS], direction=ray.direction[:NS],
              t_max=ray.t_max[:NS])
    hit_ref = jax.jit(lambda r: isect.intersect_brute(
        r, sc.data.tri_p0, sc.data.tri_e1, sc.data.tri_e2))(sub)
    t_ok = np.allclose(np.asarray(hit_pk.t[:NS]), np.asarray(hit_ref.t),
                       rtol=1e-3, atol=1e-4)
    agree = ((np.asarray(hit_pk.prim_id[:NS]) >= 0)
             == (np.asarray(hit_ref.prim_id) >= 0))
    print(f"correctness vs brute: t allclose={t_ok}, "
          f"hit-mask agree={agree.mean()*100:.2f}%")

    st_m, lv_m = counters(ray)
    t_pri = timeit(f_pk, ray, iters=iters)
    print(f"closest, tiled primary:  {t_pri:9.2f} ms "
          f"({R/t_pri/1e3:7.2f} Mrays/s)  steps/blk={st_m:.0f} "
          f"leaves/blk={lv_m:.0f}")

    st = rng.seed(pix, jnp.uint32(5))
    st, u1 = rng.next_2d(st)
    st, u2 = rng.next_2d(st)
    st, u3 = rng.next_2d(st)
    lo = jnp.min(sc.data.tri_p0, 0)
    hi = jnp.max(sc.data.tri_p0, 0)
    o = lo + jnp.concatenate([u1, u2[:, :1]], -1) * (hi - lo)
    z = u2[:, 1] * 2 - 1
    phi = u3[:, 0] * 2 * np.pi
    s = jnp.sqrt(jnp.maximum(1 - z * z, 0))
    d = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], -1)
    iray = Ray.make(o, d)
    st_m, lv_m = counters(iray)
    t_inc = timeit(f_pk, iray, iters=max(iters // 2, 2))
    print(f"closest, incoherent:     {t_inc:9.2f} ms "
          f"({R/t_inc/1e3:7.2f} Mrays/s)  steps/blk={st_m:.0f} "
          f"leaves/blk={lv_m:.0f}")
    t_any = timeit(f_pk_any, iray, iters=max(iters // 2, 2))
    print(f"any-hit, incoherent:     {t_any:9.2f} ms "
          f"({R/t_any/1e3:7.2f} Mrays/s)")


if __name__ == "__main__":
    main()
