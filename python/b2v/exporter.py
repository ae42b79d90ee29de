"""b2v core: convert a Blender scene graph to a vision scene JSON.

Counterpart of the reference's `python/b2v` add-on (exporter/importer/ui).
This module is bpy-free: it walks duck-typed objects (the thin wrappers in
__init__.py adapt real bpy data, tests drive it with mocks), so the JSON
generation is unit-testable headless.

Mapping:
  MESH objects          -> {"type": "model"} shapes (OBJ written next to
                           the JSON) with row-vector matrix transforms
  Principled BSDF nodes -> principled_bsdf materials (base color/metallic/
                           roughness/ior/transmission; image textures by
                           relative path)
  POINT/SPOT/SUN/AREA   -> point/spot/directional lights + emissive quads
  active camera         -> pinhole/thin_lens (dof -> lens_radius/focal)
  world background      -> spherical env (HDRI path) or constant color
"""
from __future__ import annotations

import json
import os

import numpy as np


def _matrix_rows(m):
    """Blender 4x4 (column-vector convention) -> vision row-vector rows:
    vision parses matrix4x4 with the translation in the 4TH ROW and
    transposes (core/transform.from_json), so emit m^T rows."""
    a = np.asarray([[m[i][j] for j in range(4)] for i in range(4)],
                   np.float64)
    return a.T.tolist()


def export_material(mat):
    """mat: duck-typed material with .name and optional .principled dict
    (base_color [4], metallic, roughness, ior, transmission, base_tex)."""
    pr = getattr(mat, "principled", None) or {}
    param = {
        "color": list(pr.get("base_color", (0.8, 0.8, 0.8, 1.0)))[:3],
        "metallic": float(pr.get("metallic", 0.0)),
        "roughness": float(pr.get("roughness", 0.5)),
        "ior": float(pr.get("ior", 1.45)),
        "spec_trans": float(pr.get("transmission", 0.0)),
    }
    tex = pr.get("base_tex")
    if tex:
        param["color"] = {"fn": tex, "color_space": "srgb"}
    return {"type": "principled_bsdf", "name": mat.name, "param": param}


def export_light(ob):
    lt = ob.light_type
    color = [c * ob.energy for c in ob.color]
    m = np.asarray(_matrix_rows(ob.matrix_world))
    pos = m[3, :3].tolist()
    fwd = (-m[2, :3]).tolist()  # blender lights point -Z
    if lt == "POINT":
        # blender watts -> radiant intensity W/sr
        c = [v / (4.0 * np.pi) for v in color]
        return {"type": "point", "param": {"color": c, "position": pos}}
    if lt == "SUN":
        return {"type": "directional",
                "param": {"color": color, "direction": fwd}}
    if lt == "SPOT":
        ang = np.rad2deg(getattr(ob, "spot_size", 0.785)) / 2.0
        blend = getattr(ob, "spot_blend", 0.15)
        c = [v / (2.0 * np.pi) for v in color]
        return {"type": "spot", "param": {
            "color": c, "position": pos, "direction": fwd,
            "angle": float(ang), "falloff": float(ang * blend)}}
    if lt == "AREA":
        size = getattr(ob, "size", 1.0)
        return {"type": "area", "param": {
            "color": color, "width": float(size), "height": float(size),
            "o2w": {"type": "matrix4x4",
                    "param": {"matrix4x4": _matrix_rows(ob.matrix_world)}}}}
    return None


def export_camera(ob, render_res=(512, 512)):
    m = _matrix_rows(ob.matrix_world)
    # blender cameras look down -Z; vision forward is +z: rotate pi about
    # the local Y axis (negate rows 0 and 2 of the row-vector matrix)
    m = np.asarray(m)
    m[0, :3] *= -1.0
    m[2, :3] *= -1.0
    param = {
        "fov_y": float(np.rad2deg(getattr(ob, "angle_y", 0.6911))),
        "transform": {"type": "matrix4x4",
                      "param": {"matrix4x4": m.tolist()}},
        "radiance_collector": {"type": "normal",
                               "param": {"resolution": list(render_res)}},
        "filter": {"type": "gaussian", "param": {"radius": [1.5, 1.5]}},
    }
    cam_type = "pinhole"
    if getattr(ob, "dof_enabled", False):
        cam_type = "thin_lens"
        fl = getattr(ob, "lens", 50.0)          # mm
        fstop = max(getattr(ob, "fstop", 2.8), 1e-3)
        param["lens_radius"] = float(fl / (2.0 * fstop) / 1000.0)
        param["focal_distance"] = float(getattr(ob, "focus_distance", 3.0))
    return {"type": cam_type, "param": param}


def write_mesh_obj(ob, out_dir):
    """Write a duck-typed mesh (verts [V,3], faces [[i...]], optional
    normals/uvs) as OBJ; returns the relative filename."""
    fn = f"{ob.name}.obj"
    path = os.path.join(out_dir, fn)
    with open(path, "w") as f:
        f.write(f"# b2v export: {ob.name}\n")
        for v in ob.vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        uvs = getattr(ob, "uvs", None)
        if uvs is not None:
            for t in uvs:
                f.write(f"vt {t[0]} {t[1]}\n")
        for face in ob.faces:
            if uvs is not None:
                f.write("f " + " ".join(f"{i + 1}/{i + 1}"
                                        for i in face) + "\n")
            else:
                f.write("f " + " ".join(str(i + 1) for i in face) + "\n")
    return fn


def export_scene(scene, out_path, spp=64):
    """scene: duck-typed {meshes, materials, lights, camera, world_color,
    world_hdri, render_res}. Writes the JSON + OBJ/asset files under
    out_path's directory; returns the scene dict."""
    out_dir = os.path.dirname(os.path.abspath(out_path))
    os.makedirs(out_dir, exist_ok=True)
    doc = {"materials": [], "shapes": [],
           "light_sampler": {"type": "power", "param": {"lights": []}},
           "sampler": {"type": "independent", "param": {"spp": 1}},
           "integrator": {"type": "pt", "param": {"max_depth": 8}},
           "spectrum": {"type": "srgb", "param": {"dimension": 3}},
           "output": {"spp": spp,
                      "fn": os.path.splitext(
                          os.path.basename(out_path))[0] + ".png"}}
    for mat in scene.materials:
        doc["materials"].append(export_material(mat))
    for ob in scene.meshes:
        fn = write_mesh_obj(ob, out_dir)
        doc["shapes"].append({
            "type": "model", "name": ob.name,
            "param": {"fn": fn,
                      "material": getattr(ob, "material_name", None),
                      "transform": {"type": "matrix4x4", "param": {
                          "matrix4x4": _matrix_rows(ob.matrix_world)}}}})
    for ob in scene.lights:
        lj = export_light(ob)
        if lj is not None:
            doc["light_sampler"]["param"]["lights"].append(lj)
    hdri = getattr(scene, "world_hdri", None)
    if hdri:
        doc["light_sampler"]["param"]["lights"].append(
            {"type": "spherical",
             "param": {"color": {"fn": hdri, "color_space": "linear"},
                       "scale": float(getattr(scene, "world_strength",
                                              1.0))}})
    if scene.camera is not None:
        doc["camera"] = export_camera(
            scene.camera, getattr(scene, "render_res", (512, 512)))
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    return doc
