"""Hero-wavelength spectral transport tests."""
import copy

import jax.numpy as jnp
import numpy as np

from vision_tpu.core import rng
from vision_tpu.spectra.spectrum import SpectrumModel, KIND_HERO


def _swl(model, n=8192, seed=5):
    st = rng.seed(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(seed))
    return model.sample_wavelengths(st)[1]


class TestSampling:
    def test_wavelengths_in_visible_range(self):
        m = SpectrumModel.make("hero", 4)
        swl = _swl(m)
        lam = np.asarray(swl.lam)
        assert lam.shape[-1] == 4
        assert (lam > 359.0).all() and (lam < 831.0).all()

    def test_pdf_matches_histogram(self):
        m = SpectrumModel.make("hero", 1)
        swl = _swl(m, n=200_000)
        lam = np.asarray(swl.lam).ravel()
        pdf = np.asarray(swl.pdf).ravel()
        # MC check: E[1/pdf] over samples = integral of 1 over [360,830] = 470
        est = np.mean(1.0 / pdf)
        assert abs(est - 470.0) / 470.0 < 0.02


class TestDecode:
    def test_illumination_round_trip(self):
        m = SpectrumModel.make("hero", 8)
        swl = _swl(m, n=4096)
        for rgb in ([1.0, 1.0, 1.0], [0.8, 0.2, 0.1], [0.1, 0.5, 0.9],
                    [17.0, 12.0, 4.0]):
            c = jnp.broadcast_to(jnp.asarray(rgb), (4096, 3))
            sp = m.decode_illumination(c, swl)
            back = np.asarray(m.to_srgb(sp, swl)).mean(0)
            scale = max(max(rgb), 1.0)
            np.testing.assert_allclose(back, rgb, atol=0.05 * scale)

    def test_albedo_bounded(self):
        m = SpectrumModel.make("hero", 8)
        swl = _swl(m, n=1024)
        c = jnp.broadcast_to(jnp.asarray([0.9, 0.4, 0.1]), (1024, 3))
        sp = np.asarray(m.decode_albedo(c, swl))
        assert (sp >= 0.0).all() and (sp <= 1.001).all()

    def test_srgb_mode_identity(self):
        m = SpectrumModel.make("srgb")
        st = rng.seed(jnp.arange(8, dtype=jnp.uint32), jnp.uint32(0))
        _, swl = m.sample_wavelengths(st)
        c = jnp.asarray([[0.2, 0.5, 0.7]] * 8)
        np.testing.assert_array_equal(np.asarray(m.decode_albedo(c, swl)),
                                      np.asarray(c))
        np.testing.assert_array_equal(np.asarray(m.to_srgb(c, swl)),
                                      np.asarray(c))


class TestHeroRender:
    def test_cbox_hero_matches_srgb(self):
        from tests.fixtures import CBOX_JSON
        from vision_tpu.scene.scene import Scene
        from vision_tpu.render import render
        s = copy.deepcopy(CBOX_JSON)
        s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = [48, 48]
        sc_rgb = Scene(s)
        img_rgb = render(sc_rgb, spp=16)
        s2 = copy.deepcopy(s)
        s2["spectrum"] = {"type": "hero", "param": {"dimension": 4}}
        sc_hero = Scene(s2)
        img_hero = render(sc_hero, spp=16)
        assert np.isfinite(img_hero).all()
        # hero is a different (noisier) estimator of the same image; compare
        # mean brightness and channel ratios loosely
        assert abs(img_hero.mean() - img_rgb.mean()) / img_rgb.mean() < 0.25
        rh = img_hero.mean((0, 1))
        rr = img_rgb.mean((0, 1))
        np.testing.assert_allclose(rh / rh.sum(), rr / rr.sum(), atol=0.06)

    def test_glass_dispersion_terminates_secondary(self):
        # dispersive glass scene in hero mode runs and keeps energy finite
        from tests.fixtures import make_glass_cbox
        from vision_tpu.scene.scene import Scene
        from vision_tpu.render import render
        s = make_glass_cbox()
        s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = [32, 32]
        s["spectrum"] = {"type": "hero", "param": {"dimension": 4}}
        sc = Scene(s)
        img = render(sc, spp=8)
        assert np.isfinite(img).all()
        assert img.mean() > 0.01
