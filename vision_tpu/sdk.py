"""Embedding SDK: programmatic scene construction + rendering.

Equivalent of the reference C++ SDK (`/root/reference/src/sdk/vision.h:64-80`
VisionRenderer: init/add_instance/build_accel/render/download_radiance and
the pyexporter pybind stub): a host application (e.g. a DCC exporter like
the reference's Blender add-on) feeds raw mesh/material/light data without
going through a scene file.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class VisionRenderer:
    """Immediate-mode scene assembly -> render (sdk/vision.h protocol)."""

    def __init__(self, resolution=(512, 512)):
        self._meshes = []       # (positions, normals, uvs, triangles, mat_id, emission)
        self._materials = []
        self._lights = []
        self._camera = None
        self._resolution = tuple(resolution)
        self._scene = None
        self._accum = None
        self._frame = 0

    # ---- scene assembly (add_instance / set_* of the C++ SDK) ----

    def add_material(self, desc):
        """desc: reference-style material JSON dict. Returns material name."""
        name = desc.get("name") or f"_sdk_mat_{len(self._materials)}"
        desc = dict(desc, name=name)
        self._materials.append(desc)
        return name

    def add_instance(self, positions, triangles, normals=None, uvs=None,
                     material=None, o2w=None, emission=None):
        """Add a triangle mesh instance (SDK add_instance)."""
        positions = np.asarray(positions, np.float32)
        triangles = np.asarray(triangles, np.int32)
        if normals is None:
            normals = np.zeros_like(positions)
        if uvs is None:
            uvs = np.zeros((len(positions), 2), np.float32)
        self._meshes.append(dict(
            positions=positions, triangles=triangles,
            normals=np.asarray(normals, np.float32),
            uvs=np.asarray(uvs, np.float32),
            material=material, o2w=o2w, emission=emission))
        return len(self._meshes) - 1

    def add_light(self, desc):
        self._lights.append(desc)

    def set_camera(self, position, target, up=(0, 1, 0), fov_y=35.0,
                   lens_radius=0.0, focal_distance=5.0):
        self._camera = dict(position=list(position), target=list(target),
                            up=list(up), fov_y=fov_y,
                            lens_radius=lens_radius,
                            focal_distance=focal_distance)

    # ---- build (build_accel) ----

    def build_accel(self, **scene_overrides):
        from .scene.scene import Scene
        from .scene.shapes import TriMesh
        from .core import transform as xf

        shapes = []
        # meshes are injected post-parse; use a scene dict for everything else
        cam = self._camera or dict(position=[0, 1, 5], target=[0, 1, 0],
                                   up=[0, 1, 0], fov_y=35.0,
                                   lens_radius=0.0, focal_distance=5.0)
        raw = {
            "shapes": [],
            "materials": self._materials,
            "camera": {"type": "thin_lens", "param": {
                "fov_y": cam["fov_y"],
                "lens_radius": cam["lens_radius"],
                "focal_distance": cam["focal_distance"],
                "transform": {"type": "look_at", "param": {
                    "position": cam["position"], "target_pos": cam["target"],
                    "up": cam["up"]}},
                "radiance_collector": {"type": "normal", "param": {
                    "resolution": list(self._resolution)}},
                "filter": {"type": "box", "param": {"radius": [0.5, 0.5]}},
            }},
            "integrator": {"type": "pt", "param": {"max_depth": 8}},
            "light_sampler": {"type": "uniform",
                              "param": {"lights": self._lights}},
            "sampler": {"type": "independent", "param": {"spp": 1}},
            "output": {"spp": 64, "fn": "sdk_out.png"},
        }
        raw.update(scene_overrides)

        scene = Scene.__new__(Scene)
        scene.scene_dir = "."
        scene.raw = raw
        # patch the shape loop: temporarily register SDK meshes as shapes
        sdk_meshes = self._meshes

        import vision_tpu.scene.shapes as shp
        orig = shp.make_shape

        counter = {"i": 0}

        def patched(stype, params, scene_dir="."):
            if stype == "__sdk__":
                m = sdk_meshes[counter["i"]]
                counter["i"] += 1
                return TriMesh(m["positions"], m["normals"], m["uvs"],
                               m["triangles"])
            return orig(stype, params, scene_dir)

        for m in self._meshes:
            entry = {"type": "__sdk__", "param": {}}
            if m["material"]:
                entry["param"]["material"] = m["material"]
            if m["o2w"] is not None:
                entry["param"]["transform"] = {
                    "type": "matrix4x4",
                    "param": {"matrix4x4": np.asarray(m["o2w"]).T.tolist()}}
            if m["emission"] is not None:
                entry["param"]["emission"] = {
                    "type": "area",
                    "param": {"color": list(m["emission"]), "scale": 1}}
            raw["shapes"].append(entry)

        shp.make_shape = patched
        try:
            scene._build()
        finally:
            shp.make_shape = orig
        self._scene = scene
        self._accum = None
        self._frame = 0
        return self

    # ---- render / download (render_frame + download_radiance) ----

    def render(self, spp=1):
        """Advance the progressive render by `spp` samples."""
        assert self._scene is not None, "call build_accel() first"
        from .render import _render_pass
        from .sensor import film
        sc = self._scene
        for _ in range(spp):
            img, _ = _render_pass(sc.data, sc.camera, sc.filter,
                                  jnp.uint32(self._frame), sc.max_depth,
                                  sc.min_depth, jnp.float32(sc.rr_threshold))
            self._accum = img if self._accum is None else film.accumulate(
                self._accum, img, jnp.float32(self._frame))
            self._frame += 1
        return self

    def download_radiance(self):
        """Linear HDR accumulation buffer [H, W, 3] (download_radiance)."""
        assert self._accum is not None, "render() first"
        return np.asarray(self._accum)

    def download_image(self):
        """Tonemapped display image."""
        from .render import postprocess
        return postprocess(self._scene, self.download_radiance())
