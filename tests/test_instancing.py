"""Mesh instancing / BLAS reuse: repeated heavy meshes store triangles once
(object space) and render through the TLAS packet path.

Reference: MeshRegistry hash-dedup (`mgr/mesh_registry.h:12-38`), instances
with per-instance o2w (`base/shape.h:21-33`, `geometry.cpp:36-53`)."""
import copy
import os

import numpy as np
import pytest
import jax.numpy as jnp

from tests.fixtures import CBOX_JSON
from vision_tpu.scene.scene import Scene
from vision_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native builder unavailable")


def _instanced_scene(n=3, sub_div=16, rotate=False):
    s = copy.deepcopy(CBOX_JSON)
    spheres = []
    for i in range(n):
        tf = {"type": "matrix4x4", "param": {"matrix4x4": [
            [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0],
            [-2.0 + i * 1.4, 0.8, 1.0 + 0.2 * i, 1]]}}
        if rotate and i % 2:
            c, sn = np.cos(0.6), np.sin(0.6)
            tf["param"]["matrix4x4"] = [
                [c, 0, -sn, 0], [0, 1, 0, 0], [sn, 0, c, 0],
                [-2.0 + i * 1.4, 0.8, 1.0 + 0.2 * i, 1]]
        spheres.append({"type": "sphere", "param": {
            "radius": 0.6, "sub_div": sub_div, "material": "white",
            "transform": tf}})
    s["shapes"] = s["shapes"] + spheres
    s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = \
        [24, 24]
    return s


def test_dedup_stores_triangles_once():
    s = _instanced_scene(n=4)
    sc = Scene(s, scene_dir=os.path.dirname(__file__))
    assert sc.data.ipbvh is not None
    sphere_tris = 2 * 16 * 15 + 2 * 16  # whatever make_sphere emits
    n_sphere = sc._dedup_meshes[0].num_triangles
    assert len(sc._dedup_meshes) == 1
    assert len(sc._dedup_instances) == 4
    # tri_pack holds ONE object-space copy + the residual cbox quads
    residual = sc.tri_arrays["p0"].shape[0]
    assert sc.data.tri_pack.shape[0] == n_sphere + residual
    # vs 4 copies in a flat build
    os.environ["VT_INSTANCING"] = "0"
    try:
        sc_flat = Scene(s, scene_dir=os.path.dirname(__file__))
    finally:
        os.environ.pop("VT_INSTANCING")
    assert sc_flat.data.ipbvh is None
    assert sc_flat.data.tri_pack.shape[0] == 4 * n_sphere + residual


def test_instanced_render_matches_flat():
    """radiance() through the TLAS path must match the flattened scene
    (same geometry, same RNG) — including rotated instances."""
    from vision_tpu.integrator import pt
    from vision_tpu.core import rng

    s = _instanced_scene(n=3, rotate=True)
    sc_i = Scene(s, scene_dir=os.path.dirname(__file__))
    assert sc_i.data.ipbvh is not None
    os.environ["VT_INSTANCING"] = "0"
    try:
        sc_f = Scene(s, scene_dir=os.path.dirname(__file__))
    finally:
        os.environ.pop("VT_INSTANCING")

    R = 24 * 24
    pix = jnp.arange(R, dtype=jnp.uint32)
    px = (pix % 24).astype(jnp.float32) + 0.5
    py = (pix // 24).astype(jnp.float32) + 0.5
    p_film = jnp.stack([px, py], -1)
    ray = sc_i.camera.generate_ray(p_film, jnp.zeros((R, 2)))
    st = rng.seed(pix, jnp.uint32(0))

    L1, _ = pt.radiance(sc_i.data, ray, st, max_depth=3)
    old = os.environ.get("VT_PACKET")
    os.environ["VT_PACKET"] = "0"  # flat scene: XLA walk (exact reference)
    try:
        L2, _ = pt.radiance(sc_f.data, ray, st, max_depth=3)
    finally:
        if old is None:
            os.environ.pop("VT_PACKET", None)
        else:
            os.environ["VT_PACKET"] = old
    a, b = np.asarray(L1), np.asarray(L2)
    lane_bad = (np.abs(a - b) > 1e-3 + 1e-3 * np.abs(b)).any(-1)
    assert lane_bad.mean() < 0.02, f"{lane_bad.sum()} lanes disagree"
    assert np.allclose(a.mean(0), b.mean(0), rtol=0.02, atol=1e-3)


def test_emissive_meshes_stay_in_residual():
    # an instanced mesh with emission must NOT dedup (area-light sampling
    # reads world-space triangles from tri_pack)
    s = _instanced_scene(n=3)
    for sp in s["shapes"][-3:]:
        sp["param"]["emission"] = {"param": {"color": [1, 1, 1],
                                             "scale": 2.0}}
    sc = Scene(s, scene_dir=os.path.dirname(__file__))
    assert sc.data.ipbvh is None  # nothing left to dedup


def test_expansion_fallback_matches_instanced(monkeypatch):
    """When the native builder is unavailable, dedup instances must
    materialize back into the flat soup with identical geometry and
    light-table numbering (scene._expand_instances_into_soup)."""
    import vision_tpu.scene.scene as scene_mod

    s = _instanced_scene(n=3, rotate=True)
    sc_i = Scene(s, scene_dir=os.path.dirname(__file__))
    assert sc_i.data.ipbvh is not None

    monkeypatch.setattr(scene_mod.Scene, "_build_instanced",
                        lambda self: None)
    sc_f = Scene(s, scene_dir=os.path.dirname(__file__))
    assert sc_f.data.ipbvh is None

    # flat-reference build for comparison
    os.environ["VT_INSTANCING"] = "0"
    try:
        sc_r = Scene(s, scene_dir=os.path.dirname(__file__))
    finally:
        os.environ.pop("VT_INSTANCING")

    # same triangles (order may differ: [dedup][residual] vs scene order)
    a = np.sort(np.asarray(sc_f.data.tri_p0), axis=0)
    b = np.sort(np.asarray(sc_r.data.tri_p0), axis=0)
    assert a.shape == b.shape
    assert np.allclose(a, b, atol=1e-5)
    # light table intact (area light tri ids must hit emissive world tris)
    lt = sc_f.data.lights
    tb = int(np.asarray(lt.tri_base)[0])
    row = np.asarray(sc_f.data.tri_pack)[tb]
    assert row[26] >= 0  # light id present on the referenced triangle
