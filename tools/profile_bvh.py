"""Measure the BVH traversal path on a real mesh scene (staircase, ~262k
tris): XLA skip-link walk timing for primary + incoherent rays, plus raw
gather bandwidth, to drive the big-scene traversal design."""
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
    from vision_tpu.core.types import Ray
    from vision_tpu.core import rng

    scene_path = "/root/reference/res/render_scene/staircase/vision_scene.json"
    t0 = time.time()
    sc = Scene(scene_path)
    print(f"scene load {time.time()-t0:.1f}s, tris={sc.data.tri_p0.shape[0]}, "
          f"bvh nodes={sc.data.bvh.node_min.shape[0] if sc.data.bvh else 0}")

    RES = 512
    R = RES * RES
    cam = sc.camera
    pix = jnp.arange(R, dtype=jnp.uint32)
    px = (pix % RES).astype(jnp.float32)
    py = (pix // RES).astype(jnp.float32)
    p_film = jnp.stack([px + 0.5, py + 0.5], -1)
    ray = cam.generate_ray(p_film, jnp.zeros((R, 2)))

    bvh = sc.data.bvh
    f_bvh = jax.jit(lambda r: isect.intersect_bvh(r, bvh))
    f_bvh_any = jax.jit(lambda r: isect.intersect_bvh(r, bvh, any_hit=True))

    t_pri = timeit(f_bvh, ray, iters=3)
    hit = f_bvh(ray)
    n_hit = int(jnp.sum(hit.prim_id >= 0))
    print(f"BVH closest, primary rays:    {t_pri:9.2f} ms "
          f"({R/t_pri/1e3:.2f} Mrays/s)  hits={n_hit}/{R}")

    # incoherent rays: random origins inside scene bbox, random dirs
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
    t_inc = timeit(f_bvh, iray, iters=3)
    print(f"BVH closest, incoherent rays: {t_inc:9.2f} ms "
          f"({R/t_inc/1e3:.2f} Mrays/s)")
    t_any = timeit(f_bvh_any, iray, iters=3)
    print(f"BVH any-hit, incoherent rays: {t_any:9.2f} ms")

    # raw gather bandwidth: [R] lanes gathering rows from a [N, 8] table
    for N in (2048, 131072, 1 << 20):
        tbl = jnp.ones((N, 8), jnp.float32)
        idx = (jnp.arange(R) * 2654435761 % N).astype(jnp.int32)
        f_g = jax.jit(lambda t_, i_: jnp.sum(t_[i_], -1))
        ms = timeit(f_g, tbl, idx, iters=10)
        gb = R * 8 * 4 / ms * 1e3 / 1e9
        print(f"gather [R]<-[{N},8]:  {ms:7.3f} ms  ({gb:6.1f} GB/s)")


if __name__ == "__main__":
    main()
