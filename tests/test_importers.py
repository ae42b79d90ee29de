"""Importer breadth: glTF full-scene mapping (materials/lights/cameras)
and PLY meshes — the format coverage the reference gets from assimp
(`assimp_parser.h:36-60`)."""
import base64
import json
import os
import struct
import tempfile

import numpy as np

from vision_tpu.scene.scene import Scene
from vision_tpu.scene.shapes import load_ply


def _tri_gltf(tmp):
    """Minimal .gltf: one triangle, a metallic-red material, a point light
    (KHR_lights_punctual), and a perspective camera."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    blob = pos.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1, 2]}],
        "nodes": [
            {"mesh": 0, "translation": [0, 0, -3]},
            {"extensions": {"KHR_lights_punctual": {"light": 0}},
             "translation": [0, 2, 0]},
            {"camera": 0, "translation": [0, 0, 5]},
        ],
        "cameras": [{"type": "perspective",
                     "perspective": {"yfov": 0.5, "znear": 0.01}}],
        "extensions": {"KHR_lights_punctual": {"lights": [
            {"type": "point", "color": [1, 0.8, 0.6], "intensity": 5.0}]}},
        "materials": [{"name": "redmetal", "pbrMetallicRoughness": {
            "baseColorFactor": [0.8, 0.1, 0.1, 1.0],
            "metallicFactor": 1.0, "roughnessFactor": 0.3}}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1, "material": 0}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
        ],
        "buffers": [{
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode()}],
    }
    fn = os.path.join(tmp, "scene.gltf")
    json.dump(doc, open(fn, "w"))
    return fn


def test_gltf_scene_maps_materials_lights_camera():
    tmp = tempfile.mkdtemp()
    fn = _tri_gltf(tmp)
    sc = Scene(fn)
    assert sc.data.tri_p0.shape[0] == 1
    # material mapped to a metal-like principled row
    mid = sc.mat_compiler.get("redmetal")
    assert mid >= 0
    assert float(sc.data.materials.metallic[mid]) > 0.9
    # punctual light mapped (point, candela -> W/sr via 683 lm/W)
    lt = sc.data.lights
    assert lt.n_lights == 1
    assert np.allclose(np.asarray(lt.color[0]),
                       np.array([5.0, 4.0, 3.0]) / 683.0, atol=1e-7)
    assert np.allclose(np.asarray(lt.position[0]), [0, 2, 0], atol=1e-6)
    # camera mapped: position and -z viewing direction
    assert np.allclose(np.asarray(sc.camera.c2w[:3, 3]), [0, 0, 5],
                       atol=1e-6)
    fwd = np.asarray(sc.camera.c2w[:3, 2])
    assert np.allclose(fwd, [0, 0, -1], atol=1e-6)
    # renders without error
    from vision_tpu.integrator import pt
    import jax.numpy as jnp
    img, _ = pt.render_sample(sc.data, sc.camera.replace(resolution=(8, 8)),
                              sc.filter, jnp.uint32(0), max_depth=2)
    assert np.isfinite(np.asarray(img)).all()


def _write_ply_ascii(fn):
    with open(fn, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                "element vertex 4\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property float nx\nproperty float ny\nproperty float nz\n"
                "element face 2\n"
                "property list uchar int vertex_indices\n"
                "end_header\n"
                "0 0 0 0 0 1\n1 0 0 0 0 1\n1 1 0 0 0 1\n0 1 0 0 0 1\n"
                "3 0 1 2\n4 0 1 2 3\n")  # tri + quad (fan-triangulated)


def _write_ply_binary(fn):
    with open(fn, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n"
                b"element vertex 3\n"
                b"property float x\nproperty float y\nproperty float z\n"
                b"element face 1\n"
                b"property list uchar int vertex_indices\n"
                b"end_header\n")
        for v in [(0, 0, 0), (2, 0, 0), (0, 2, 0)]:
            f.write(struct.pack("<3f", *v))
        f.write(struct.pack("<B3i", 3, 0, 1, 2))


def test_ply_ascii_and_binary():
    tmp = tempfile.mkdtemp()
    fa = os.path.join(tmp, "a.ply")
    _write_ply_ascii(fa)
    m = load_ply(fa)
    assert m.positions.shape == (4, 3)
    assert m.triangles.shape == (3, 3)  # 1 tri + quad fan = 3
    assert np.allclose(m.normals[:, 2], 1.0)

    fb = os.path.join(tmp, "b.ply")
    _write_ply_binary(fb)
    m = load_ply(fb)
    assert m.positions.shape == (3, 3)
    assert m.triangles.shape == (1, 3)
    # face normals synthesized when absent
    assert np.allclose(np.abs(m.normals[:, 2]), 1.0)


def test_ply_through_scene():
    tmp = tempfile.mkdtemp()
    fa = os.path.join(tmp, "m.ply")
    _write_ply_ascii(fa)
    s = {"materials": [{"type": "diffuse", "name": "w",
                        "param": {"color": [0.5, 0.5, 0.5]}}],
         "shapes": [{"type": "model", "name": "m",
                     "param": {"fn": "m.ply", "material": "w"}}],
         "camera": {"type": "pinhole", "param": {
             "radiance_collector": {"param": {"resolution": [8, 8]}}}}}
    sc = Scene(s, scene_dir=tmp)
    assert sc.data.tri_p0.shape[0] == 3


def test_stl_binary_and_ascii():
    """STL importer (binary + ascii), welded to an indexed mesh with
    smooth normals (assimp-breadth item)."""
    import struct as st
    import tempfile, os
    from vision_tpu.scene import shapes as shp

    tmp = tempfile.mkdtemp()
    # one unit quad = 2 triangles sharing an edge
    tris = [
        [(0, 0, 0), (1, 0, 0), (1, 1, 0)],
        [(0, 0, 0), (1, 1, 0), (0, 1, 0)],
    ]
    # binary
    bp = os.path.join(tmp, "q.stl")
    with open(bp, "wb") as f:
        f.write(b"\0" * 80)
        f.write(st.pack("<I", len(tris)))
        for t in tris:
            f.write(st.pack("<3f", 0, 0, 1))
            for v in t:
                f.write(st.pack("<3f", *v))
            f.write(st.pack("<H", 0))
    m = shp.load_stl(bp)
    assert m.num_triangles == 2
    assert m.positions.shape[0] == 4  # welded shared vertices
    assert np.allclose(np.abs(m.normals[:, 2]), 1.0, atol=1e-5)
    # ascii
    ap = os.path.join(tmp, "qa.stl")
    with open(ap, "w") as f:
        f.write("solid q\n")
        for t in tris:
            f.write(" facet normal 0 0 1\n  outer loop\n")
            for v in t:
                f.write(f"   vertex {v[0]} {v[1]} {v[2]}\n")
            f.write("  endloop\n endfacet\n")
        f.write("endsolid q\n")
    m2 = shp.load_stl(ap)
    assert m2.num_triangles == 2
    assert np.allclose(np.sort(m.positions, 0), np.sort(m2.positions, 0))
    # reachable through the model shape type
    m3 = shp.make_shape("model", {"fn": "q.stl"}, tmp)
    assert m3.num_triangles == 2
