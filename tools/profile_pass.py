"""Breakdown timing of one cbox 512^2 d8 pass: trace vs shade vs full."""
import copy, time
import jax, jax.numpy as jnp
from tests.fixtures import CBOX_JSON
from vision_tpu.scene.scene import Scene
from vision_tpu.integrator import pt
from vision_tpu.core import rng
from vision_tpu.core.types import Ray

RES = 512
s = copy.deepcopy(CBOX_JSON)
s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = [RES, RES]
sc = Scene(s)
print("bvh:", sc.data.bvh is not None, "ntris:", sc.data.tri_p0.shape[0])

W = H = RES
n = W * H
pix = jnp.arange(n, dtype=jnp.uint32)
px = (pix % W).astype(jnp.float32)
py = (pix // W).astype(jnp.float32)
st = rng.seed(pix, jnp.uint32(7))
st, u_film = rng.next_2d(st)
p_film = jnp.stack([px + 0.5, py + 0.5], -1)
st, u_lens = rng.next_2d(st)
ray = sc.camera.generate_ray(p_film, u_lens)


def bench(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.2f} ms")
    return dt


@jax.jit
def closest(scene, r):
    return pt.trace_closest(scene, r)

@jax.jit
def occl(scene, r):
    return pt.trace_occluded(scene, r)

@jax.jit
def full(scene, camera, filt, fi):
    img, aovs = pt.render_sample(scene, camera, filt, fi, max_depth=8)
    return img

@jax.jit
def depth1(scene, camera, filt, fi):
    img, aovs = pt.render_sample(scene, camera, filt, fi, max_depth=1)
    return img

t_c = bench("trace_closest (262k rays)", closest, sc.data, ray)
t_o = bench("trace_occluded", occl, sc.data, ray)
t_1 = bench("full pass depth=1", depth1, sc.data, sc.camera, sc.filter, jnp.uint32(3))
t_8 = bench("full pass depth=8", full, sc.data, sc.camera, sc.filter, jnp.uint32(3))
print(f"per-bounce marginal: {(t_8 - t_1) / 7 * 1e3:.2f} ms")
print(f"trace share/bounce:  {(t_c + t_o) * 1e3:.2f} ms")
