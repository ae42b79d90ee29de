"""Per-bounce packet-traversal profile on a real PT wavefront.

Steps the integrator host-side (no regeneration) on a BVH scene and, for
each bounce's closest-ray batch, records the packet kernel's steps/leaves
per block and wall time under different re-bin key layouts. This is the
data that tunes pt._rebin_perm (position-vs-direction bit split).

Usage: python tools/profile_iters.py [scene.json] [res] [depth]
"""
import functools
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from vision_tpu.scene.scene import Scene
    from vision_tpu.accel.packet_bvh import intersect_packet, _run, RT
    from vision_tpu.integrator import pt
    from vision_tpu.core.types import Ray
    from vision_tpu.core import rng

    scene_path = (sys.argv[1] if len(sys.argv) > 1 else
                  "/root/reference/res/render_scene/staircase/"
                  "vision_scene.json")
    RES = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    DEPTH = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    sc = Scene(scene_path)
    sc.raw["camera"]["param"]["radiance_collector"]["param"]["resolution"] \
        = [RES, RES]
    sc = Scene(sc.raw, scene_dir=sc.scene_dir)
    data = sc.data
    pb = data.pbvh
    print(f"tris={data.tri_p0.shape[0]} nodes={pb.n_nodes} "
          f"bricks={int(jnp.max(pb.brick))+1}", flush=True)

    R = RES * RES
    order = pt._tile_order(RES, RES)
    pix = jnp.asarray(order)
    px = (pix % RES).astype(jnp.float32)
    py = (pix // RES).astype(jnp.float32)
    p_film = jnp.stack([px + 0.5, py + 0.5], -1)
    ray = sc.camera.generate_ray(p_film, jnp.zeros((R, 2)))
    st = rng.seed(pix, jnp.uint32(3))
    st, swl = data.spectrum.sample_wavelengths(st)
    c = pt._init_carry(data, data.spectrum, ray, st, swl)

    def key_perm(o, d, act, pos_bits, dir_bits):
        p = (o - data.world_lo) * data.world_inv_extent
        qp = jnp.clip(p * (1 << pos_bits), 0.0,
                      (1 << pos_bits) - 1).astype(jnp.uint32)
        mp = pt._morton3(qp, pos_bits)
        qd = jnp.clip((d * 0.5 + 0.5) * (1 << dir_bits), 0.0,
                      (1 << dir_bits) - 1).astype(jnp.uint32)
        md = pt._morton3(qd, dir_bits)
        key = (mp << (3 * dir_bits)) | md
        key = jnp.where(act, key, jnp.uint32(1) << 31)
        return jnp.argsort(key)

    kp = jax.jit(key_perm, static_argnames=("pos_bits", "dir_bits"))

    def counters(o, d, tmax):
        Rp = (R + RT - 1) // RT * RT
        rays = jnp.zeros((8, Rp), jnp.float32)
        rays = rays.at[0:3, :R].set(o)
        rays = rays.at[3:6, :R].set(d)
        rays = rays.at[6, :R].set(tmax)
        out = _run(pb.skip, pb.brick, pb.lo_x, pb.lo_y, pb.lo_z, pb.hi_x,
                   pb.hi_y, pb.hi_z, pb.tri, rays, False, False)
        live = np.asarray(out[4, ::RT] + out[5, ::RT]) > 1
        return (np.asarray(out[4, ::RT]),
                np.asarray(out[5, ::RT]), live)

    # pass big pytrees as ARGUMENTS: closure-captured arrays serialize as
    # HLO constants and blow the axon remote-compile request size limit
    f_trace = jax.jit(lambda pb_, r: intersect_packet(r, pb_).t)
    f_trace = functools.partial(f_trace, pb)

    configs = [(5, 4), (6, 3), (6, 4), (4, 4), (7, 3), (3, 5)]
    bounce_ = jax.jit(lambda data_, c, d: pt._bounce(
        data_, data_.spectrum, swl, data.has_media, 1.0, 0, 1.0, d, c))
    bounce = functools.partial(bounce_, data)

    for it in range(DEPTH):
        o, d, act = c["o"], c["d"], c["act"]
        n_act = int(jnp.sum(act))
        tmax = jnp.where(act, 3e38, 0.0)
        line = f"it{it} act={n_act/R*100:5.1f}%"
        for (pb_, db_) in configs:
            perm = kp(o, d, act, pb_, db_)
            os_, ds_ = o[perm].T, d[perm].T
            stp, lvs, live = counters(os_, ds_, tmax[perm])
            ray_s = Ray(origin=o[perm], direction=d[perm], t_max=tmax[perm])
            t_ms = 1e3 * _time(f_trace, ray_s)
            line += (f" | p{pb_}d{db_}: lv={lvs[live].mean():5.0f} "
                     f"st={stp[live].mean():4.0f} {t_ms:6.1f}ms")
        print(line, flush=True)
        c = bounce(c, jnp.full((R,), it, jnp.int32))
        c = jax.block_until_ready(c)


def _time(fn, *args, iters=2):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    main()
