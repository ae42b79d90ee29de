"""Shader-graph calculation nodes (reference shader_node.h:48-106,
render_core/shadernode/{math,mix}.cpp): host fold & bake tests."""
import numpy as np
import pytest

from vision_tpu.shading import shader_graph as sg


class _Atlas:
    def __init__(self):
        self.arrays = []

    def add_array(self, a):
        self.arrays.append(np.asarray(a))
        return len(self.arrays) - 1


def _img(tmp_path, name, arr):
    from PIL import Image
    Image.fromarray(arr.astype(np.uint8)).save(tmp_path / name)
    return name


def test_const_fold_multiply():
    v = sg.fold_slot({"type": "multiply",
                      "param": {"lhs": [2.0, 4.0, 8.0], "rhs": 0.5}})
    assert v.is_const
    np.testing.assert_allclose(v.const, [1.0, 2.0, 4.0])


def test_const_fold_add_sub_div():
    v = sg.fold_slot({"type": "add", "param": {"lhs": [1, 2], "rhs": [3, 4]}})
    np.testing.assert_allclose(v.const, [4, 6])
    v = sg.fold_slot({"type": "subtract", "param": {"lhs": 5.0, "rhs": 2.0}})
    np.testing.assert_allclose(v.const, [3.0])
    v = sg.fold_slot({"type": "divide", "param": {"lhs": 8.0, "rhs": 2.0}})
    np.testing.assert_allclose(v.const, [4.0])


def test_lerp_fold():
    v = sg.fold_slot({"type": "lerp",
                      "param": {"t": 0.25, "A": [0, 0, 0], "B": [4, 8, 12]}})
    np.testing.assert_allclose(v.const, [1, 2, 3])


def test_swizzle():
    v = sg.fold_slot({"channels": "zx", "node": [1.0, 2.0, 3.0]})
    np.testing.assert_allclose(v.const, [3.0, 1.0])


def test_image_times_number_bakes(tmp_path):
    arr = np.zeros((4, 4, 3), np.uint8)
    arr[:2] = 255
    fn = _img(tmp_path, "t.png", arr)
    v = sg.fold_slot({"type": "multiply",
                      "param": {
                          "lhs": {"fn": fn, "color_space": "linear"},
                          "rhs": {"type": "number",
                                  "param": {"value": [0.5, 1.0, 0.25]}}}},
                     scene_dir=str(tmp_path))
    assert not v.is_const
    np.testing.assert_allclose(v.image[0, 0], [0.5, 1.0, 0.25], atol=1e-6)
    np.testing.assert_allclose(v.image[3, 0], [0.0, 0.0, 0.0], atol=1e-6)


def test_mixed_resolution_bake(tmp_path):
    a = np.full((2, 2, 3), 255, np.uint8)
    b = np.full((4, 4, 3), 128, np.uint8)
    fa, fb = _img(tmp_path, "a.png", a), _img(tmp_path, "b.png", b)
    v = sg.fold_slot({"type": "multiply",
                      "param": {"lhs": {"fn": fa, "color_space": "linear"},
                                "rhs": {"fn": fb, "color_space": "linear"}}},
                     scene_dir=str(tmp_path))
    assert v.image.shape == (4, 4, 3)
    np.testing.assert_allclose(v.image[0, 0], 128 / 255.0, atol=1e-3)


def test_resolve_rgb_bakes_to_atlas(tmp_path):
    arr = np.full((4, 4, 3), 255, np.uint8)
    fn = _img(tmp_path, "w.png", arr)
    at = _Atlas()
    rgb, tex = sg.resolve_rgb({"type": "scale",
                               "param": {"value": {"fn": fn,
                                                   "color_space": "linear"},
                                         "scale": 0.5}},
                              at, scene_dir=str(tmp_path))
    assert tex == 0
    np.testing.assert_allclose(rgb, [1, 1, 1])
    np.testing.assert_allclose(at.arrays[0], 0.5, atol=1e-3)


def test_scene_with_calc_node_renders_nonwhite(tmp_path):
    """A multiplied texture must not render as white (r1 silent-wrong case)."""
    from PIL import Image
    arr = np.full((4, 4, 3), 255, np.uint8)
    Image.fromarray(arr).save(tmp_path / "white.png")
    import jax
    import jax.numpy as jnp
    from vision_tpu.scene.scene import Scene
    from vision_tpu.integrator import pt

    scene = {
        "shapes": [{"type": "quad", "name": "floor",
                    "param": {"width": 2.0, "height": 2.0,
                              "material": "M"}}],
        "materials": [
            {"type": "diffuse", "name": "M",
             "param": {"color": {
                 "type": "multiply",
                 "param": {"lhs": {"fn": "white.png",
                                   "color_space": "linear"},
                           "rhs": {"type": "number",
                                   "param": {"value": [0.5, 0.25, 0.125]}}}}}}],
        "camera": {"type": "thin_lens",
                   "param": {"fov_y": 40,
                             "transform": {"type": "look_at",
                                           "param": {"position": [0, 2, 0.01],
                                                     "up": [0, 0, 1],
                                                     "target_pos": [0, 0, 0]}},
                             "radiance_collector": {
                                 "type": "normal",
                                 "param": {"resolution": [16, 16]}},
                             "filter": {"type": "box",
                                        "param": {"radius": [0.5, 0.5]}}}},
        "integrator": {"type": "pt", "param": {"max_depth": 2}},
        "spectrum": {"type": "srgb", "param": {"dimension": 3}},
        "light_sampler": {
            "type": "uniform",
            "param": {"lights": [
                {"type": "directional",
                 "param": {"color": [np.pi, np.pi, np.pi],
                           "direction": [0, -1, 0]}}]}},
        "output": {"spp": 1, "fn": "t.png"},
    }
    sc = Scene(scene, scene_dir=str(tmp_path))
    img, _ = jax.jit(lambda s, c, f, i: pt.render_sample(s, c, f, i,
                                                         max_depth=2))(
        sc.data, sc.camera, sc.filter, jnp.uint32(0))
    c = np.asarray(img)[6:10, 6:10].mean(axis=(0, 1))
    # directional E = pi => L_out = albedo (texture * number)
    np.testing.assert_allclose(c, [0.5, 0.25, 0.125], rtol=0.05)


class TestNormalMapping:
    def test_bump_slot_perturbs_shading_normals(self):
        """material.h bump slot -> shade-time normal mapping
        (converter.cpp normal_map): G-buffer normals on a flat wall must
        vary with the map, and the render must differ from the unbumped
        scene."""
        import copy
        import os
        import tempfile
        import numpy as np
        import jax.numpy as jnp
        from tests.fixtures import CBOX_JSON
        from vision_tpu.scene.scene import Scene
        from vision_tpu.sensor.gbuffer import compute_gbuffer
        from vision_tpu.sensor import film
        from vision_tpu.render import render

        # tangent-space normal map: tilted normals varying across x
        H = W = 16
        nm = np.zeros((H, W, 3), np.float32)
        ang = np.linspace(-0.9, 0.9, W)[None, :]
        nm[..., 0] = np.broadcast_to(np.sin(ang), (H, W))
        nm[..., 2] = np.broadcast_to(np.cos(ang), (H, W))
        nm01 = (nm * 0.5 + 0.5)
        d = tempfile.mkdtemp()
        film.to_png(nm01, os.path.join(d, "bump.png"))

        s = copy.deepcopy(CBOX_JSON)
        s["camera"]["param"]["radiance_collector"]["param"][
            "resolution"] = [24, 24]
        s2 = copy.deepcopy(s)
        s2["materials"] = list(s2["materials"]) + [{
            "type": "diffuse", "name": "bumpy",
            "param": {"color": [0.7, 0.7, 0.7],
                      "bump": {"fn": "bump.png", "color_space": "linear"},
                      "bump_scale": 1.0}}]
        for sh in s2["shapes"]:
            if sh.get("name") == "back":
                sh["param"]["material"] = "bumpy"
        sc_plain = Scene(s, scene_dir=d)
        sc_bump = Scene(s2, scene_dir=d)
        assert "nmap" in sc_bump.data.materials.feats
        assert "nmap" not in sc_plain.data.materials.feats

        gb = compute_gbuffer(sc_bump.data, sc_bump.camera, 0)
        n = np.asarray(gb.normal)
        mid = np.asarray(gb.mat_id)
        bumpy_id = sc_bump.mat_compiler.get("bumpy")
        wall = mid == bumpy_id
        assert wall.sum() > 20
        # normals across the wall must not all agree (flat wall otherwise)
        spread = n[wall].std(axis=0).max()
        assert spread > 0.05, spread

        img_a = render(sc_plain, spp=4)
        img_b = render(sc_bump, spp=4)
        assert not np.allclose(img_a, img_b, atol=5e-3)


class TestShadeTimeNodes:
    """Context-dependent converter.cpp nodes evaluated at shade time:
    fresnel-driven mixes and vector_mapping uv TRS."""

    def _render(self, scene_dict, res=24, scene_dir="."):
        import jax.numpy as jnp
        from vision_tpu.scene.scene import Scene
        from vision_tpu.integrator import pt
        from vision_tpu.core import rng
        sc = Scene(scene_dict, scene_dir=scene_dir)
        R = res * res
        pix = jnp.arange(R, dtype=jnp.uint32)
        p_film = jnp.stack([(pix % res).astype(jnp.float32) + 0.5,
                            (pix // res).astype(jnp.float32) + 0.5], -1)
        ray = sc.camera.generate_ray(p_film, jnp.zeros((R, 2)))
        st = rng.seed(pix, jnp.uint32(1))
        L, _ = pt.radiance(sc.data, ray, st, max_depth=2)
        return np.asarray(L).reshape(res, res, 3), sc

    def test_fresnel_mix_differs_from_baked_average(self):
        import copy
        from tests.fixtures import CBOX_JSON
        s = copy.deepcopy(CBOX_JSON)
        s["camera"]["param"]["radiance_collector"]["param"][
            "resolution"] = [24, 24]
        # floor material: fresnel-driven mix red<->blue. Grazing pixels
        # (far floor) must look different from near-normal ones.
        fres_color = {"type": "mix", "param": {
            "t": {"type": "fresnel", "param": {"ior": 1.5}},
            "A": [0.8, 0.1, 0.1], "B": [0.1, 0.1, 0.8]}}
        s["materials"][2] = {"type": "diffuse", "name": "White",
                             "param": {"color": fres_color}}
        img_dyn, sc = self._render(s)
        assert "fresmix" in sc.data.materials.feats
        # baked-average version: the static stand-in color
        s2 = copy.deepcopy(s)
        s2["materials"][2] = {"type": "diffuse", "name": "White",
                              "param": {"color": [0.45, 0.1, 0.45]}}
        img_avg, sc2 = self._render(s2)
        assert "fresmix" not in sc2.data.materials.feats
        d = np.abs(img_dyn - img_avg).mean()
        assert d > 1e-3, f"fresnel mix renders identical to baked ({d})"
        # view dependence: red/blue balance must vary across the floor
        rb = img_dyn[..., 0] - img_dyn[..., 2]
        lit = img_dyn.sum(-1) > 1e-4
        assert rb[lit].std() > 1e-3

    def test_vector_mapping_scales_texture_lookup(self):
        import copy, os, tempfile
        import numpy as np_
        from tests.fixtures import CBOX_JSON
        from vision_tpu.sensor import film
        tmp = tempfile.mkdtemp(prefix="vt_uvmap_")
        # 2x2 checker texture
        img = np_.zeros((8, 8, 3), np_.float32)
        img[:4, :4] = img[4:, 4:] = [1.0, 1.0, 1.0]
        film.to_png(img, os.path.join(tmp, "checker.png"))
        s = copy.deepcopy(CBOX_JSON)
        s["camera"]["param"]["radiance_collector"]["param"][
            "resolution"] = [24, 24]
        base = {"fn": "checker.png", "color_space": "srgb"}
        s["materials"][2] = {"type": "diffuse", "name": "White",
                             "param": {"color": {
                                 "type": "vector_mapping",
                                 "param": {"node": base,
                                           "scale": [4.0, 4.0, 1.0]}}}}
        img_map, sc = self._render(s, scene_dir=tmp)
        assert "uvmap" in sc.data.materials.feats
        s2 = copy.deepcopy(s)
        s2["materials"][2] = {"type": "diffuse", "name": "White",
                              "param": {"color": base}}
        img_plain, _ = self._render(s2, scene_dir=tmp)
        # 4x tiling changes the pattern
        assert np.abs(img_map - img_plain).mean() > 1e-3
