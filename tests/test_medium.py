"""Participating media: HG phase properties + fog render behavior."""
import copy

import jax.numpy as jnp
import numpy as np

from tests.fixtures import CBOX_JSON
from vision_tpu.core import rng
from vision_tpu.core.math import normalize, vec3, dot
from vision_tpu.shading import medium as md


class TestHG:
    def test_phase_normalized(self):
        # integral of p over sphere = 1 (uniform MC)
        n = 200_000
        st = rng.seed(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(2))
        from vision_tpu.core import warp
        st, u = rng.next_2d(st)
        w = warp.square_to_sphere(u)
        wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        for g in (0.0, 0.5, -0.7):
            p = md.hg_phase(dot(wo, w), jnp.full((n,), g))
            est = float(jnp.mean(p)) * 4 * np.pi
            assert abs(est - 1.0) < 0.01, (g, est)

    def test_sample_matches_pdf(self):
        n = 100_000
        st = rng.seed(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(3))
        st, u2 = rng.next_2d(st)
        wo = jnp.broadcast_to(normalize(vec3(0.2, -0.4, 0.89)), (n, 3))
        g = jnp.full((n,), 0.6)
        wi, pdf = md.hg_sample(wo, g, u2)
        # forward-peaked: mean cos(theta) between -wo and wi approx g
        c = np.asarray(dot(-wo, wi))
        assert abs(c.mean() - 0.6) < 0.02
        p_eval = np.asarray(md.hg_phase(dot(wo, wi), g))
        np.testing.assert_allclose(np.asarray(pdf), p_eval, rtol=1e-4)

    def test_measured_presets(self):
        ss, sa = md.measured_ss("Skin1")
        assert ss.shape == (3,) and (ss > 0).all()
        ss2, _ = md.measured_ss("NoSuchThing")
        assert ss2.shape == (3,)  # falls back to first entry


def fog_cbox(res=40, sigma_s=0.3, sigma_a=0.01):
    s = copy.deepcopy(CBOX_JSON)
    s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = [res, res]
    s["mediums"] = {
        "process": True,
        "global": "fog",
        "list": [{"type": "homogeneous", "name": "fog",
                  "param": {"g": 0.0, "sigma_s": [sigma_s] * 3,
                            "sigma_a": [sigma_a] * 3, "scale": 1.0}}],
    }
    return s


class TestFogRender:
    def test_fog_scene_runs(self):
        from vision_tpu.scene.scene import Scene
        from vision_tpu.render import render
        sc = Scene(fog_cbox())
        assert sc.data.has_media
        img = render(sc, spp=8)
        assert np.isfinite(img).all()
        assert img.mean() > 0.01

    def test_absorbing_fog_darker(self):
        from vision_tpu.scene.scene import Scene
        from vision_tpu.render import render
        clear = render(Scene(copy.deepcopy(
            fog_cbox(sigma_s=0.0, sigma_a=1e-5))), spp=6)
        thick = render(Scene(fog_cbox(sigma_s=0.0, sigma_a=1.0)), spp=6)
        assert thick.mean() < clear.mean() * 0.6
