"""b2v exporter (python/b2v counterpart of the reference's Blender
add-on): the bpy-free core must emit a scene JSON that vision_tpu loads
and renders round-trip."""
import math
import os
import sys
import tempfile
from types import SimpleNamespace as NS

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "python"))
from b2v import exporter  # noqa: E402
from vision_tpu.scene.scene import Scene  # noqa: E402


def _blender_like_scene():
    ident = [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]]

    def translate(x, y, z):
        return [[1, 0, 0, x], [0, 1, 0, y], [0, 0, 1, z], [0, 0, 0, 1]]

    cube = NS(name="cube",
              vertices=[(-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0)],
              faces=[(0, 1, 2), (0, 2, 3)],
              matrix_world=translate(0, 0, -2),
              material_name="mat")
    mat = NS(name="mat", principled={"base_color": (0.6, 0.2, 0.1, 1.0),
                                     "metallic": 0.0, "roughness": 0.4,
                                     "ior": 1.45, "transmission": 0.0})
    light = NS(name="sun", light_type="POINT", color=(1.0, 0.9, 0.8),
               energy=100.0, matrix_world=translate(0, 2, 1))
    # blender camera at origin looking down -Z: vision must see it at the
    # same spot looking toward the cube at z=-2
    cam = NS(matrix_world=ident, angle_y=math.radians(40.0), lens=50.0,
             dof_enabled=False, fstop=2.8, focus_distance=3.0)
    return NS(meshes=[cube], materials=[mat], lights=[light], camera=cam,
              render_res=(32, 32), world_hdri=None)


def test_export_scene_roundtrip_renders():
    tmp = tempfile.mkdtemp()
    out = os.path.join(tmp, "scene.json")
    doc = exporter.export_scene(_blender_like_scene(), out, spp=4)
    assert os.path.exists(out)
    assert os.path.exists(os.path.join(tmp, "cube.obj"))
    assert doc["materials"][0]["type"] == "principled_bsdf"
    assert doc["light_sampler"]["param"]["lights"][0]["type"] == "point"

    sc = Scene(out)
    assert sc.data.tri_p0.shape[0] == 2
    mid = sc.mat_compiler.get("mat")
    assert mid >= 0
    assert abs(float(sc.data.materials.kd[mid][0]) - 0.6) < 1e-5
    # camera looks toward -z (blender convention mapped)
    fwd = np.asarray(sc.camera.c2w[:3, 2])
    assert np.allclose(fwd, [0, 0, -1], atol=1e-6)
    # renders
    import jax.numpy as jnp
    from vision_tpu.integrator import pt
    img, _ = pt.render_sample(sc.data, sc.camera, sc.filter, jnp.uint32(0),
                              max_depth=2)
    a = np.asarray(img)
    assert np.isfinite(a).all() and a.mean() > 0


def test_export_light_types():
    t = [[1, 0, 0, 0], [0, 1, 0, 5], [0, 0, 1, 0], [0, 0, 0, 1]]
    spot = NS(name="s", light_type="SPOT", color=(1, 1, 1), energy=50.0,
              matrix_world=t, spot_size=math.radians(60), spot_blend=0.2)
    sun = NS(name="d", light_type="SUN", color=(1, 1, 1), energy=3.0,
             matrix_world=t)
    sj = exporter.export_light(spot)
    assert sj["type"] == "spot" and abs(sj["param"]["angle"] - 30.0) < 1e-4
    dj = exporter.export_light(sun)
    assert dj["type"] == "directional"
    # blender lights point -Z
    assert np.allclose(dj["param"]["direction"], [0, 0, -1], atol=1e-6)


def test_addon_loads_headless():
    import b2v
    assert b2v.bl_info["category"] == "Import-Export"
