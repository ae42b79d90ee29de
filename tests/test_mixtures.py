"""True LobeSet mixtures (lobe.h:277-330 create_mix/create_add) + subsurface
wiring (subsurface.cpp -> dielectric interface + interior medium).

r1 collapsed mix/add into one parameter-lerped row; these tests pin the
two-row mixture semantics: f = wa f_a + wb f_b, one-sample-MIS pdf.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_bsdf import make_params, furnace
from vision_tpu.core import rng
from vision_tpu.core.math import normalize, vec3
from vision_tpu.shading import bsdf as ub
from vision_tpu.shading import fresnel as frs


def mix_params(pa, pb, wa, wb):
    n = pa.kd.shape[0]
    return pa.replace(mix_b=pb, mix_wa=jnp.full(n, wa),
                      mix_wb=jnp.full(n, wb),
                      feats=pa.feats + ("mix2",))


class TestMixtureBSDF:
    def test_mix_of_identical_diffuse_is_identity(self):
        def mk(n):
            pa = make_params(n, diffuse_weight=1.0, kd=jnp.full((n, 3), 0.6))
            pb = make_params(n, diffuse_weight=1.0, kd=jnp.full((n, 3), 0.6))
            return mix_params(pa, pb, 0.3, 0.7)
        e = furnace(mk)
        assert abs(e - 0.6) < 0.01

    def test_mix_weights_blend_albedo(self):
        # 0.25*white + 0.75*black diffuse -> reflectance 0.25
        def mk(n):
            pa = make_params(n, diffuse_weight=1.0, kd=jnp.ones((n, 3)))
            pb = make_params(n, diffuse_weight=1.0, kd=jnp.zeros((n, 3)))
            return mix_params(pa, pb, 0.25, 0.75)
        e = furnace(mk)
        assert abs(e - 0.25) < 0.02

    def test_add_energy_conserving_halves(self):
        # add(0.5-white, 0.5-white) at weight 1+1 -> reflectance 1.0
        def mk(n):
            pa = make_params(n, diffuse_weight=1.0, kd=jnp.full((n, 3), 0.5))
            pb = make_params(n, diffuse_weight=1.0, kd=jnp.full((n, 3), 0.5))
            return mix_params(pa, pb, 1.0, 1.0)
        e = furnace(mk)
        assert abs(e - 1.0) < 0.01

    def test_mix_glass_diffuse_not_param_lerp(self):
        """Half glass + half diffuse must keep a true transmission component
        AND a true lambert component (a parameter-lerp produces neither)."""
        n = 100_000
        pa = make_params(n, spec_weight=1.0, trans_weight=1.0,
                         fr_mode=frs.FR_DIELECTRIC,
                         eta=jnp.full((n, 1), 1.5),
                         ax=0.01, ay=0.01)
        pb = make_params(n, diffuse_weight=1.0, kd=jnp.ones((n, 3)))
        p = mix_params(pa, pb, 0.5, 0.5)
        wo = jnp.broadcast_to(normalize(vec3(0.4, 0.0, 0.9)), (n, 3))
        st = rng.seed(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(7))
        st, bs = ub.sample(p, wo, st)
        below = bs.valid & (bs.wi[..., 2] < 0.0)
        above = bs.valid & (bs.wi[..., 2] > 0.0)
        frac_below = float(jnp.mean(below))
        assert 0.2 < frac_below < 0.5       # transmission really sampled
        assert float(jnp.mean(above)) > 0.4  # reflection+diffuse sampled
        # mixture eval at a diffuse-ish direction has the lambert term:
        wi = jnp.broadcast_to(normalize(vec3(-0.3, 0.5, 0.8)), (n, 3))
        ev = ub.evaluate(p, wo, wi)
        lam = 0.5 * 1.0 / np.pi
        f = float(ev.f[0, 0])
        assert abs(f - lam) / lam < 0.15   # glass adds ~0 at this direction

    def test_mixture_pdf_matches_sampling(self):
        """Histogram check: pdf returned by evaluate() integrates to ~1 over
        the sphere for the mixture (one-sample MIS consistency)."""
        n = 200_000
        pa = make_params(n, diffuse_weight=1.0, kd=jnp.ones((n, 3)))
        pb = make_params(n, spec_weight=1.0, fr_mode=frs.FR_CONSTANT,
                         ax=0.2, ay=0.2)
        p = mix_params(pa, pb, 0.5, 0.5)
        wo = jnp.broadcast_to(normalize(vec3(0.3, 0.0, 0.95)), (n, 3))
        st = rng.seed(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(11))
        st, bs = ub.sample(p, wo, st)
        # E[1/pdf] over sampled dirs = measure of sampled support <= 4pi
        inv = jnp.where(bs.valid, 1.0 / jnp.maximum(bs.ev.pdf, 1e-9), 0.0)
        est = float(jnp.mean(inv))
        assert 2.0 * np.pi * 0.5 < est < 4.0 * np.pi


class TestMixtureCompile:
    def test_mix_material_rows(self):
        from vision_tpu.shading.materials import MaterialCompiler

        class _A:
            def add_array(self, a):
                return 0
        mc = MaterialCompiler(_A())
        mid = mc.compile({"type": "mix", "name": "m", "param": {
            "frac": 0.3,
            "mat0": {"type": "diffuse", "param": {"color": [1, 0, 0]}},
            "mat1": {"type": "mirror", "param": {"roughness": 0.01}},
        }})
        t = mc.build()
        assert "mix2" in t.feats
        b = int(t.mix_b[mid])
        assert b >= 0 and b != mid
        assert abs(float(t.mix_wa[mid]) - 0.3) < 1e-6
        assert abs(float(t.mix_wb[mid]) - 0.7) < 1e-6
        # parent carries mat0 (diffuse red), row b is the mirror
        assert float(t.kd[mid][0]) == 1.0
        assert float(t.spec_weight[b]) == 1.0

    def test_sss_scene_attaches_interior_medium(self):
        from vision_tpu.scene.scene import Scene
        scene = {
            "shapes": [{"type": "sphere", "name": "ball",
                        "param": {"radius": 0.5, "sub_div": 8,
                                  "material": "Skin"}}],
            "materials": [{"type": "subsurface", "name": "Skin",
                           "param": {"ior": 1.4, "roughness": 0.05,
                                     "sigma_a": [0.001, 0.002, 0.01],
                                     "sigma_s": [2.5, 3.2, 3.7],
                                     "sigma_scale": 2.0}}],
            "camera": {"type": "thin_lens",
                       "param": {"fov_y": 40,
                                 "transform": {"type": "look_at",
                                               "param": {"position": [0, 0, 3],
                                                         "up": [0, 1, 0],
                                                         "target_pos": [0, 0, 0]}},
                                 "radiance_collector": {
                                     "type": "normal",
                                     "param": {"resolution": [16, 16]}},
                                 "filter": {"type": "box",
                                            "param": {"radius": [0.5, 0.5]}}}},
            "integrator": {"type": "pt", "param": {"max_depth": 4}},
            "spectrum": {"type": "srgb", "param": {"dimension": 3}},
            "light_sampler": {"type": "uniform", "param": {"lights": [
                {"type": "point", "param": {"color": [10, 10, 10],
                                            "position": [2, 2, 2]}}]}},
            "output": {"spp": 1, "fn": "t.png"},
        }
        sc = Scene(scene)
        assert sc.data.has_media
        inside = int(np.asarray(sc.data.inst_in_medium)[0])
        assert inside >= 0
        # sigma scaled by sigma_scale
        ss = np.asarray(sc.data.mediums.sigma_s)[inside]
        np.testing.assert_allclose(ss, [5.0, 6.4, 7.4], rtol=1e-5)
        # interface is glass-like (spec+trans)
        mid = int(np.asarray(sc.data.inst_mat)[0])
        assert float(sc.data.materials.trans_weight[mid]) == 1.0

        # and it renders without NaNs
        from vision_tpu.integrator import pt
        img, _ = jax.jit(lambda s, c, f, i: pt.render_sample(
            s, c, f, i, max_depth=4))(sc.data, sc.camera, sc.filter,
                                      jnp.uint32(0))
        assert np.isfinite(np.asarray(img)).all()
