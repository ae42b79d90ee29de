"""Per-light-type unit tests (VERDICT r1: directional was broken & untested;
textured area emission; mix env; scene-scaled ray offset).

Reference behaviors:
  directional.cpp — delta light, wi = -direction, L = color*scale, PDF_wi=-1
  area.cpp + light.h color slot — emission evaluated at the surface uv
  environments/mix.cpp — weighted blend of two environments
  interaction.h custom_offset_ray_origin — ray_offset_factor render setting
"""
import copy
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vision_tpu.lights import lights as lt
from vision_tpu.scene.scene import Scene


def _floor_scene(extra_lights, size=64):
    """A single diffuse floor quad (y=0 plane, 2x2) seen from above."""
    return {
        "shapes": [
            {"type": "quad", "name": "floor",
             "param": {"width": 2.0, "height": 2.0, "material": "White"}},
        ],
        "materials": [
            {"type": "diffuse", "name": "White", "param": {"color": [0.8, 0.8, 0.8]}},
        ],
        "camera": {
            "type": "thin_lens",
            "param": {
                "fov_y": 40,
                "transform": {"type": "look_at",
                              "param": {"position": [0, 2.0, 0.01],
                                        "up": [0, 0, 1],
                                        "target_pos": [0, 0, 0]}},
                "radiance_collector": {
                    "type": "normal",
                    "param": {"resolution": [size, size]}},
                "filter": {"type": "box", "param": {"radius": [0.5, 0.5]}},
            },
        },
        "integrator": {"type": "pt", "param": {"max_depth": 2}},
        "spectrum": {"type": "srgb", "param": {"dimension": 3}},
        "light_sampler": {"type": "uniform",
                          "param": {"lights": extra_lights}},
        "output": {"spp": 4, "fn": "t.png"},
    }


def _render(scene_json, scene_dir=".", spp=8, max_depth=2):
    from vision_tpu.integrator import pt
    sc = Scene(scene_json, scene_dir=scene_dir)
    img = None
    fn = jax.jit(lambda s, c, f, i: pt.render_sample(s, c, f, i,
                                                     max_depth=max_depth)[0])
    acc = 0.0
    for i in range(spp):
        acc = acc + fn(sc.data, sc.camera, sc.filter, jnp.uint32(i))
    return np.asarray(acc / spp), sc


class TestDirectional:
    def test_sample_wi_is_delta_and_correct(self):
        b = lt.LightBuilder()
        b.add_directional([2.0, 3.0, 4.0], direction=[0.0, -1.0, 0.0])
        table = b.build()

        class _NoAtlas:
            has_textures = False

            def sample(self, tid, uv):
                return jnp.ones(uv.shape[:-1] + (3,))
        ref = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.5, -1.0]])
        ng = jnp.asarray([[0.0, 1.0, 0.0]] * 2)
        tri_pack = jnp.zeros((1, 32))
        u = jnp.asarray([0.3, 0.7])
        u2 = jnp.asarray([[0.1, 0.9]] * 2)
        ls = lt.sample_wi(table, _NoAtlas(), tri_pack, ref, ng, u, u2,
                          jnp.asarray(10.0))
        # delta: pdf negative
        assert np.all(np.asarray(ls.pdf) < 0.0)
        # wi points TOWARD the light = -direction
        np.testing.assert_allclose(np.asarray(ls.wi),
                                   np.tile([0.0, 1.0, 0.0], (2, 1)), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ls.L),
                                   np.tile([2.0, 3.0, 4.0], (2, 1)), atol=1e-6)
        # occlusion distance spans the scene
        assert np.all(np.asarray(ls.dist) >= 10.0)

    def test_directional_renders_analytic_floor(self):
        # L_out = albedo/pi * E, E = |cos| * L = 1 * 1 (straight down)
        img, _ = _render(_floor_scene([
            {"type": "directional",
             "param": {"color": [1, 1, 1], "direction": [0, -1, 0]}}]),
            spp=4)
        c = img[24:40, 24:40].mean(axis=(0, 1))
        expect = 0.8 / np.pi
        np.testing.assert_allclose(c, expect, rtol=0.05)


class TestTexturedAreaEmission:
    def test_emission_texture_modulates(self, tmp_path):
        # checker: left half black, right half white
        from PIL import Image
        arr = np.zeros((8, 8, 3), np.uint8)
        arr[:, 4:] = 255
        p = tmp_path / "emit.png"
        Image.fromarray(arr).save(p)

        scene = {
            "shapes": [
                {"type": "quad", "name": "panel",
                 "param": {"width": 2.0, "height": 2.0,
                           "emission": {"type": "area",
                                        "param": {"color": {"fn": "emit.png",
                                                            "color_space": "srgb"},
                                                  "scale": 1.0,
                                                  "two_sided": True}}}},
            ],
            "materials": [],
            "camera": {
                "type": "thin_lens",
                "param": {
                    "fov_y": 45,
                    "transform": {"type": "look_at",
                                  "param": {"position": [0, 2.0, 0.01],
                                            "up": [0, 0, 1],
                                            "target_pos": [0, 0, 0]}},
                    "radiance_collector": {"type": "normal",
                                           "param": {"resolution": [32, 32]}},
                    "filter": {"type": "box", "param": {"radius": [0.5, 0.5]}},
                },
            },
            "integrator": {"type": "pt", "param": {"max_depth": 1}},
            "spectrum": {"type": "srgb", "param": {"dimension": 3}},
            "light_sampler": {"type": "uniform", "param": {"lights": []}},
            "output": {"spp": 1, "fn": "t.png"},
        }
        img, _ = _render(scene, scene_dir=str(tmp_path), spp=1, max_depth=1)
        left = img[8:24, 2:14].mean()
        right = img[8:24, 18:30].mean()
        # one side dark, other bright (orientation depends on uv handedness)
        lo, hi = min(left, right), max(left, right)
        assert hi > 0.5
        assert lo < 0.1 * hi

    def test_nee_sees_texture(self, tmp_path):
        # emissive panel above a floor: NEE radiance must average the texture
        # (half black half white => half of the uniform-white answer)
        from PIL import Image
        arr = np.zeros((8, 8, 3), np.uint8)
        arr[:, 4:] = 255
        p = tmp_path / "emit.png"
        Image.fromarray(arr).save(p)

        def scene_json(color):
            s = _floor_scene([])
            # small downward-facing panel above the floor (y-flip turns the
            # +Y quad normal down)
            s["shapes"].append(
                {"type": "quad", "name": "panel",
                 "param": {"width": 0.3, "height": 0.3,
                           "transform": {"type": "matrix4x4",
                                         "param": {"matrix4x4":
                                                   [[-1, 0, 0, 0],
                                                    [0, -1, 0, 0],
                                                    [0, 0, 1, 0],
                                                    [0, 1.0, 0, 1]]}},
                           "emission": {"type": "area",
                                        "param": {"color": color,
                                                  "scale": 1.0}}}})
            return s

        img_tex, _ = _render(scene_json({"fn": "emit.png",
                                         "color_space": "srgb"}),
                             scene_dir=str(tmp_path), spp=32)
        img_wht, _ = _render(scene_json([1.0, 1.0, 1.0]),
                             scene_dir=str(tmp_path), spp=32)
        # outer floor pixels (panel silhouette stays in the image center)
        cols = np.r_[0:12, 52:64]
        m_tex = img_tex[:, cols].mean()
        m_wht = img_wht[:, cols].mean()
        assert m_wht > 1e-4
        assert 0.3 < m_tex / m_wht < 0.7


class TestMixEnv:
    def test_mix_combines_two_envs(self, tmp_path):
        import cv2
        a = np.full((4, 8, 3), 2.0, np.float32)
        b = np.full((8, 16, 3), 3.0, np.float32)
        cv2.imwrite(str(tmp_path / "a.hdr"), a[..., ::-1])
        cv2.imwrite(str(tmp_path / "b.hdr"), b[..., ::-1])

        def env(fn):
            return {"type": "spherical",
                    "param": {"color": {"fn": fn, "color_space": "linear"}}}

        s = _floor_scene([
            {"type": "mix",
             "param": {"env0": env("a.hdr"), "scale0": 0.5,
                       "env1": env("b.hdr"), "scale1": 2.0}}])
        sc = Scene(s, scene_dir=str(tmp_path))
        table = sc.data.lights
        assert table.env_index >= 0
        d = jnp.asarray([[0.3, 0.8, 0.5]])
        d = d / jnp.linalg.norm(d)
        Lr = np.asarray(lt.env_radiance(table, sc.data.atlas, d))
        np.testing.assert_allclose(Lr, 0.5 * 2.0 + 2.0 * 3.0, rtol=1e-5)


class TestRayOffset:
    def test_factor_parsed_and_scaled(self):
        s = _floor_scene([])
        s["render_setting"] = {"ray_offset_factor": 3.0}
        sc = Scene(s)
        assert float(sc.data.ray_offset) == 3.0

        from vision_tpu.integrator.pt import spawn_origin, RAY_OFFSET
        pos = jnp.asarray([[1000.0, 0.0, 0.0]])
        ng = jnp.asarray([[0.0, 1.0, 0.0]])
        w = jnp.asarray([[0.0, 1.0, 0.0]])
        o = np.asarray(spawn_origin(pos, ng, w, 3.0))
        # offset scales with |p| and the factor
        np.testing.assert_allclose(o[0, 1], RAY_OFFSET * 3.0 * 1000.0,
                                   rtol=1e-5)


def test_ies_profile_masks_spot():
    """An IES profile wired to a spot light shapes its angular output
    (the reference only parses IES files — ies.cpp — and never consumes
    them; here the profile is a runtime spot/projector mask)."""
    import copy
    import tempfile, os
    import jax.numpy as jnp
    from tests.fixtures import CBOX_JSON
    from vision_tpu.scene.scene import Scene
    from vision_tpu.lights import lights as lt
    from vision_tpu.core import rng

    # narrow IES: full intensity on axis, zero beyond 20 degrees
    ies_txt = """IESNA:LM-63-1995
TILT=NONE
1 1000 1 5 1 1 2 0 0 0
1 1 0
0 10 20 45 90
0
1000 800 0 0 0
"""
    tmp = tempfile.mkdtemp()
    fn = os.path.join(tmp, "narrow.ies")
    open(fn, "w").write(ies_txt)

    def build(with_ies):
        s = copy.deepcopy(CBOX_JSON)
        s["camera"]["param"]["radiance_collector"]["param"][
            "resolution"] = [16, 16]
        spot = {"type": "spot", "param": {
            "color": [50, 50, 50], "position": [0, 1.9, 0],
            "direction": [0, -1, 0], "angle": 80.0, "falloff": 5.0}}
        if with_ies:
            spot["param"]["ies"] = "narrow.ies"
        s["light_sampler"]["param"]["lights"] = [spot]
        s["shapes"] = [sh for sh in s["shapes"] if sh.get("name") != "light"]
        return Scene(s, scene_dir=tmp)

    sc_i = build(True)
    sc_p = build(False)
    assert "ies" in sc_i.data.lights.feats
    assert "ies" not in sc_p.data.lights.feats

    # sample the spot from points directly below (on-axis) vs to the side
    ref = jnp.asarray([[0.0, 0.3, 0.0], [-0.95, 1.6, 0.0]])
    ns = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    u = jnp.asarray([0.1, 0.1])
    u2 = jnp.zeros((2, 2))
    for sc, name in ((sc_i, "ies"), (sc_p, "plain")):
        ls = lt.sample_wi(sc.data.lights, sc.data.atlas, sc.data.tri_pack,
                          ref, ns, u, u2, sc.data.world_radius)
        if name == "ies":
            L_ies = np.asarray(ls.L)
        else:
            L_plain = np.asarray(ls.L)
    # on-axis: IES keeps most energy; off-axis (~35deg+): IES kills it
    assert L_ies[0].mean() > 0.5 * L_plain[0].mean()
    assert L_ies[1].mean() < 0.2 * L_plain[1].mean()
