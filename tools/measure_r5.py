"""Round-5 TPU measurement batch: packet-BVH v2 (ordered stack walk +
double-buffered DMA + wavefront re-binning).

One process, everything batched (axon claim latency makes many small runs
expensive). Prints timing lines as it goes; run under nohup and poll.

Usage: python tools/measure_r5.py [sections...]
  sections: packet wave prism cbox grad   (default: all)
"""
import os
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

REF = "/root/reference/res/render_scene"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timeit(fn, *args, iters=4, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def wave_mrays(sc, spp, depth, iters=2, warmup=1, label=""):
    from vision_tpu.integrator import pt

    @jax.jit
    def pass_fn(scene, camera, filt, frame0):
        img, aovs = pt.render_wave(scene, camera, filt, frame0,
                                   spp=spp, max_depth=depth)
        return img, aovs["nrays"], aovs["iters"]

    t0 = time.perf_counter()
    img, nr, it = pass_fn(sc.data, sc.camera, sc.filter, jnp.uint32(0))
    img.block_until_ready()
    log(f"  {label}: first compile+run {time.perf_counter()-t0:.1f}s "
        f"iters={int(it)}")
    for i in range(warmup):
        img, nr, it = pass_fn(sc.data, sc.camera, sc.filter, jnp.uint32(7))
    img.block_until_ready()
    nrays = 0.0
    t0 = time.perf_counter()
    for i in range(iters):
        img, nr, it = pass_fn(sc.data, sc.camera, sc.filter,
                              jnp.uint32(100 + i * spp))
        nrays += float(nr)
    img.block_until_ready()
    dt = time.perf_counter() - t0
    mr = nrays / dt / 1e6
    log(f"  {label}: {mr:.3f} Mrays/s  ({dt/iters*1e3:.0f} ms/pass, "
        f"{nrays/iters/1e6:.2f} Mrays/pass)")
    return mr


def sec_packet():
    from vision_tpu.scene.scene import Scene
    from vision_tpu.accel.packet_bvh import intersect_packet, _run, RT
    from vision_tpu.integrator.pt import _tile_order
    from vision_tpu.core.types import Ray
    from vision_tpu.core import rng
    from vision_tpu.accel import intersect as isect

    log("== packet kernel microbench (staircase) ==")
    t0 = time.time()
    sc = Scene(f"{REF}/staircase/vision_scene.json")
    pb = sc.data.pbvh
    log(f"scene load {time.time()-t0:.1f}s tris={sc.data.tri_p0.shape[0]} "
        f"nodes={pb.n_nodes} bricks={int(jnp.max(pb.brick))+1}")

    RES = 512
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

    f_pk = jax.jit(lambda r: intersect_packet(r, pb))
    f_any = jax.jit(lambda r: intersect_packet(r, pb, any_hit=True))

    t0 = time.time()
    hit = f_pk(ray)
    jax.block_until_ready(hit)
    log(f"first compile+run {time.time()-t0:.1f}s")

    # correctness vs brute on a subsample
    NS = 4096
    sub = Ray(origin=ray.origin[:NS], direction=ray.direction[:NS],
              t_max=ray.t_max[:NS])
    hit_ref = jax.jit(lambda r: isect.intersect_brute(
        r, sc.data.tri_p0, sc.data.tri_e1, sc.data.tri_e2))(sub)
    t_ok = np.allclose(np.asarray(hit.t[:NS]), np.asarray(hit_ref.t),
                       rtol=1e-3, atol=1e-4)
    agree = ((np.asarray(hit.prim_id[:NS]) >= 0)
             == (np.asarray(hit_ref.prim_id) >= 0)).mean()
    log(f"correctness vs brute: t allclose={t_ok} hit-agree={agree*100:.2f}%")

    st_m, lv_m = counters(ray)
    t_pri = timeit(f_pk, ray)
    log(f"closest tiled primary: {t_pri:8.2f} ms ({R/t_pri/1e3:7.2f} Mrays/s)"
        f" steps/blk={st_m:.0f} leaves/blk={lv_m:.0f}")

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
    t_inc = timeit(f_pk, iray, iters=2)
    log(f"closest incoherent:    {t_inc:8.2f} ms ({R/t_inc/1e3:7.2f} Mrays/s)"
        f" steps/blk={st_m:.0f} leaves/blk={lv_m:.0f}")

    # incoherent but re-binned (what the integrator actually traces)
    from vision_tpu.integrator.pt import _rebin_perm
    perm = _rebin_perm(sc.data, iray, jnp.ones((R,), bool))
    sray = Ray(origin=iray.origin[perm], direction=iray.direction[perm],
               t_max=iray.t_max[perm])
    sray = jax.block_until_ready(jax.tree.map(jnp.asarray, sray))
    st_m, lv_m = counters(sray)
    t_srt = timeit(f_pk, sray, iters=2)
    log(f"closest rebinned:      {t_srt:8.2f} ms ({R/t_srt/1e3:7.2f} Mrays/s)"
        f" steps/blk={st_m:.0f} leaves/blk={lv_m:.0f}")
    t_any = timeit(f_any, sray, iters=2)
    log(f"anyhit rebinned:       {t_any:8.2f} ms ({R/t_any/1e3:7.2f} Mrays/s)")

    # argsort + gather/scatter overhead at wavefront scale
    from vision_tpu.integrator.pt import _trace_packet
    f_full = jax.jit(lambda r: _trace_packet(sc.data, r,
                                             jnp.ones((R,), bool), False,
                                             False).t)
    t_full = timeit(f_full, iray, iters=2)
    log(f"closest rebin-inline:  {t_full:8.2f} ms ({R/t_full/1e3:7.2f} "
        f"Mrays/s) [incl. sort+scatter]")
    return sc


def sec_wave(sc=None):
    from vision_tpu.scene.scene import Scene
    log("== staircase render_wave (full PT) ==")
    if sc is None:
        sc = Scene(f"{REF}/staircase/vision_scene.json")
    sc.raw["camera"]["param"]["radiance_collector"]["param"]["resolution"] \
        = [512, 512]
    sc2 = Scene(sc.raw, scene_dir=sc.scene_dir)
    os.environ["VT_REBIN"] = "0"
    wave_mrays(sc2, 2, 4, label="rebin OFF")
    os.environ["VT_REBIN"] = "1"
    wave_mrays(sc2, 2, 4, label="rebin ON ")


def sec_prism():
    from vision_tpu.scene.scene import Scene
    log("== prism render_wave ==")
    sc = Scene(f"{REF}/cbox/cbox-prism.json")
    sc.raw["camera"]["param"]["radiance_collector"]["param"]["resolution"] \
        = [256, 256]
    sc = Scene(sc.raw, scene_dir=sc.scene_dir)
    log(f"prism tris={sc.data.tri_p0.shape[0]} pbvh={sc.data.pbvh is not None}")
    os.environ["VT_REBIN"] = "1"
    wave_mrays(sc, 16, 6, iters=2, label="prism rebin ON ")
    os.environ["VT_REBIN"] = "0"
    wave_mrays(sc, 16, 6, iters=2, label="prism rebin OFF")
    os.environ["VT_REBIN"] = "1"


def sec_cbox():
    import copy
    from tests.fixtures import CBOX_JSON
    from vision_tpu.scene.scene import Scene
    log("== cbox headline ==")
    s = copy.deepcopy(CBOX_JSON)
    s["camera"]["param"]["radiance_collector"]["param"]["resolution"] \
        = [512, 512]
    sc = Scene(s)
    wave_mrays(sc, 16, 8, iters=8, warmup=2, label="cbox 512 d8")


def main():
    secs = sys.argv[1:] or ["packet", "wave", "prism", "cbox"]
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    sc = None
    if "packet" in secs:
        sc = sec_packet()
    if "wave" in secs:
        sec_wave(sc)
    if "prism" in secs:
        sec_prism()
    if "cbox" in secs:
        sec_cbox()
    log("DONE")


if __name__ == "__main__":
    main()
