"""Validate + time the Pallas packet BVH on the staircase mesh (262k tris)
against the XLA skip-link walk: correctness (hit agreement) and Mrays/s for
primary and incoherent rays."""
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
    from vision_tpu.accel.packet_bvh import build_packet_bvh, intersect_packet
    from vision_tpu.core.types import Ray
    from vision_tpu.core import rng

    scene_path = "/root/reference/res/render_scene/staircase/vision_scene.json"
    t0 = time.time()
    sc = Scene(scene_path)
    T = sc.data.tri_p0.shape[0]
    print(f"scene load {time.time()-t0:.1f}s, tris={T}")

    t0 = time.time()
    p0 = np.asarray(sc.data.tri_p0)
    pb = build_packet_bvh(p0, p0 + np.asarray(sc.data.tri_e1),
                          p0 + np.asarray(sc.data.tri_e2))
    print(f"packet build {time.time()-t0:.1f}s, nodes={pb.n_nodes}, "
          f"bricks={pb.n_nodes - pb.first_leaf}")

    RES = 512
    R = RES * RES
    cam = sc.camera
    pix = jnp.arange(R, dtype=jnp.uint32)
    px = (pix % RES).astype(jnp.float32)
    py = (pix // RES).astype(jnp.float32)
    p_film = jnp.stack([px + 0.5, py + 0.5], -1)
    ray = cam.generate_ray(p_film, jnp.zeros((R, 2)))

    # no outer jit: closing over the BVH arrays would bake them into the
    # HLO as constants (intersect_packet's inner jit takes them as args)
    f_pk = lambda r: intersect_packet(r, pb)
    f_pk_any = lambda r: intersect_packet(r, pb, any_hit=True)

    t0 = time.time()
    hit_pk = f_pk(ray)
    jax.block_until_ready(hit_pk)
    print(f"packet first compile+run {time.time()-t0:.1f}s")

    # correctness vs XLA BVH on a subsample (XLA walk is slow)
    NS = 4096
    sub = Ray(origin=ray.origin[:NS], direction=ray.direction[:NS],
              t_max=ray.t_max[:NS])
    bvh = sc.data.bvh
    hit_ref = jax.jit(lambda r: isect.intersect_bvh(r, bvh))(sub)
    t_ok = np.allclose(np.asarray(hit_pk.t[:NS]), np.asarray(hit_ref.t),
                       rtol=1e-3, atol=1e-4)
    both_hit = (np.asarray(hit_pk.prim_id[:NS]) >= 0) == (
        np.asarray(hit_ref.prim_id) >= 0)
    print(f"correctness vs XLA walk: t allclose={t_ok}, "
          f"hit-mask agree={both_hit.mean()*100:.2f}%")

    t_pri = timeit(f_pk, ray, iters=5)
    n_hit = int(jnp.sum(hit_pk.prim_id >= 0))
    print(f"packet closest, primary:    {t_pri:9.2f} ms "
          f"({R/t_pri/1e3:.2f} Mrays/s)  hits={n_hit}/{R}")

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
    t_inc = timeit(f_pk, iray, iters=3)
    print(f"packet closest, incoherent: {t_inc:9.2f} ms "
          f"({R/t_inc/1e3:.2f} Mrays/s)")
    t_any = timeit(f_pk_any, iray, iters=3)
    print(f"packet any-hit, incoherent: {t_any:9.2f} ms "
          f"({R/t_any/1e3:.2f} Mrays/s)")


if __name__ == "__main__":
    main()
