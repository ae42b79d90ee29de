"""Packet-BVH product path: SAH build + Pallas traversal (interpret mode on
CPU) vs brute force, and integrator wiring through VT_PACKET=1."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vision_tpu.accel.packet_bvh import build_packet_bvh, intersect_packet
from vision_tpu.accel import intersect as isect
from vision_tpu.core.types import Ray
from vision_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native builder unavailable")


def _soup(n, seed=1, scale=4.0):
    rs = np.random.RandomState(seed)
    p0 = rs.rand(n, 3).astype(np.float32) * scale
    p1 = p0 + rs.rand(n, 3).astype(np.float32) * 0.4
    p2 = p0 + rs.rand(n, 3).astype(np.float32) * 0.4
    return p0, p1, p2


def _rays(R, seed=2, scale=4.0):
    rs = np.random.RandomState(seed)
    o = rs.rand(R, 3).astype(np.float32) * scale
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Ray.make(jnp.asarray(o), jnp.asarray(d))


def test_packet_closest_matches_brute():
    p0, p1, p2 = _soup(900)
    pb = build_packet_bvh(p0, p1, p2)
    assert pb is not None
    ray = _rays(1024)
    h1 = intersect_packet(ray, pb, interpret=True)
    h2 = isect.intersect_brute(ray, jnp.asarray(p0), jnp.asarray(p1 - p0),
                               jnp.asarray(p2 - p0))
    assert np.allclose(np.asarray(h1.t), np.asarray(h2.t),
                       rtol=1e-4, atol=1e-5)
    assert (np.asarray(h1.prim_id) == np.asarray(h2.prim_id)).all()
    hit = np.asarray(h1.prim_id) >= 0
    assert hit.any() and (~hit).any()
    assert np.allclose(np.asarray(h1.bary)[hit], np.asarray(h2.bary)[hit],
                       rtol=1e-3, atol=1e-4)


def test_packet_anyhit_matches_brute():
    p0, p1, p2 = _soup(700, seed=3)
    pb = build_packet_bvh(p0, p1, p2)
    ray0 = _rays(1024, seed=4)
    ray = Ray(origin=ray0.origin, direction=ray0.direction,
              t_max=jnp.full((1024,), 1.5))
    h1 = intersect_packet(ray, pb, any_hit=True, interpret=True)
    occ = isect.occluded_brute(ray, jnp.asarray(p0), jnp.asarray(p1 - p0),
                               jnp.asarray(p2 - p0))
    assert ((np.asarray(h1.prim_id) >= 0) == np.asarray(occ)).all()


def test_scene_builds_packet_and_renders_through_it():
    """A >2048-tri scene must carry a PacketBVH, and radiance() through the
    packet path (VT_PACKET=1, interpret) must match the XLA skip-link walk."""
    from vision_tpu.scene.scene import Scene
    from vision_tpu.integrator import pt
    from tests.fixtures import CBOX_JSON
    import copy

    s = copy.deepcopy(CBOX_JSON)
    # subdivide the tall box into a dense grid of quads to cross the
    # BVH threshold (shape type 'cube' subdiv param if supported; else
    # add many quads)
    quads = []
    G = 33
    for i in range(G):
        for j in range(G):
            quads.append({
                "type": "quad",
                "param": {
                    "width": 0.4, "height": 0.4, "material": "white",
                    # row-vector convention: from_json transposes, so the
                    # translation lives in the 4th ROW (core/transform.py)
                    "transform": {"type": "matrix4x4", "param": {"matrix4x4": [
                        [1, 0, 0, 0],
                        [0, 1, 0, 0],
                        [0, 0, 1, 0],
                        [-3.0 + i * 0.25, 0.2 + j * 0.22,
                         2.0 + 0.002 * (i * G + j), 1]]}},
                },
            })
    s["shapes"] = s["shapes"] + quads
    s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = [16, 16]
    sc = Scene(s, scene_dir=os.path.dirname(__file__))
    assert sc.data.tri_p0.shape[0] > 2048
    assert sc.data.pbvh is not None
    assert sc.data.bvh is not None

    from vision_tpu.core import rng
    R = 256
    pix = jnp.arange(R, dtype=jnp.uint32)
    px = (pix % 16).astype(jnp.float32)
    py = (pix // 16).astype(jnp.float32)
    p_film = jnp.stack([px + 0.5, py + 0.5], -1)
    ray = sc.camera.generate_ray(p_film, jnp.zeros((R, 2)))
    st = rng.seed(pix, jnp.uint32(0))

    old = os.environ.get("VT_PACKET")
    try:
        os.environ["VT_PACKET"] = "1"
        L1, _ = pt.radiance(sc.data, ray, st, max_depth=2)
        os.environ["VT_PACKET"] = "0"
        L2, _ = pt.radiance(sc.data, ray, st, max_depth=2)
    finally:
        if old is None:
            os.environ.pop("VT_PACKET", None)
        else:
            os.environ["VT_PACKET"] = old
    # the cbox fixture contains coincident coplanar quads (light/ceiling);
    # exact-t ties between traversal orders legitimately pick different
    # prims there, so compare lane-wise with a small disagreement budget.
    a, b = np.asarray(L1), np.asarray(L2)
    lane_bad = (np.abs(a - b) > 1e-3 + 1e-3 * np.abs(b)).any(-1)
    assert lane_bad.mean() < 0.02, f"{lane_bad.sum()} lanes disagree"
    assert np.allclose(a.mean(0), b.mean(0), rtol=0.02, atol=1e-3)
