"""Golden-path render tests: cornell box statistics + CPU determinism."""
import copy

import jax.numpy as jnp
import numpy as np
import pytest

from tests.fixtures import CBOX_JSON, make_glass_cbox
from vision_tpu.scene.scene import Scene
from vision_tpu.render import render, _render_pass


def small_cbox(res=64, **kw):
    s = copy.deepcopy(CBOX_JSON)
    s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = [res, res]
    for k, v in kw.items():
        s[k] = v
    return s


class TestCbox:
    def test_render_statistics(self):
        sc = Scene(small_cbox(64))
        hdr = render(sc, spp=8)
        assert np.isfinite(hdr).all()
        assert hdr.min() >= 0.0
        # cornell box mean radiance sanity band
        assert 0.05 < hdr.mean() < 0.5
        # left third redder than right third; right third greener
        H, W, _ = hdr.shape
        left = hdr[:, : W // 3]
        right = hdr[:, -W // 3:]
        assert left[..., 0].mean() > left[..., 2].mean()
        # green fraction higher on the right (light tint is warm, so compare
        # channel ratios rather than absolutes)
        g_frac_r = right[..., 1].mean() / right.mean()
        g_frac_l = left[..., 1].mean() / left.mean()
        assert g_frac_r > g_frac_l
        r_frac_l = left[..., 0].mean() / left.mean()
        r_frac_r = right[..., 0].mean() / right.mean()
        assert r_frac_l > r_frac_r
        # ceiling light region must be the brightest area
        assert hdr[: H // 8].max() == pytest.approx(hdr.max())

    def test_deterministic(self):
        sc = Scene(small_cbox(32))
        a = render(sc, spp=2)
        b = render(sc, spp=2)
        np.testing.assert_array_equal(a, b)

    def test_render_wave_matches_fori(self):
        """Regeneration pool vs bounce-major fori: identical RNG streams per
        (pixel, sample) -> identical mean image (modulo accumulation order)."""
        from vision_tpu.integrator import pt
        sc = Scene(small_cbox(32))
        spp = 8
        imgs = [np.asarray(pt.render_sample(sc.data, sc.camera, sc.filter,
                                            jnp.uint32(i), max_depth=4)[0])
                for i in range(spp)]
        ref = np.mean(imgs, 0)
        wave, aovs = pt.render_wave(sc.data, sc.camera, sc.filter, 0, spp,
                                    max_depth=4)
        np.testing.assert_allclose(np.asarray(wave), ref, rtol=2e-4, atol=2e-5)
        # regeneration must beat the fori iteration count (spp * depth)
        assert int(aovs["iters"]) <= spp * 4

    def test_depth1_direct_only_darker(self):
        sc = Scene(small_cbox(48))
        full = render(sc, spp=4)
        sc.max_depth = 1
        direct = render(sc, spp=4)
        assert direct.mean() < full.mean()

    def test_glass_mirror_scene_runs(self):
        s = make_glass_cbox()
        s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = [48, 48]
        sc = Scene(s)
        hdr = render(sc, spp=4)
        assert np.isfinite(hdr).all()
        assert hdr.mean() > 0.02


class TestSceneLoading:
    def test_reference_scene_loads(self):
        sc = Scene("/root/reference/res/render_scene/cbox/vision_scene.json")
        assert sc.data.tri_p0.shape[0] == 36
        assert sc.data.materials.kd.shape[0] >= 10
        assert sc.resolution == (1024, 1024)
        assert sc.tone_mapper == "aces"
        assert sc.max_depth == 16

    def test_emissive_instance_wiring(self, cbox_scene):
        il = np.asarray(cbox_scene.data.inst_light)
        assert (il >= 0).sum() == 1  # exactly one emissive instance
        lt = cbox_scene.data.lights
        assert lt.n_lights == 1
        np.testing.assert_allclose(np.asarray(lt.color)[0], [17, 12, 4])
