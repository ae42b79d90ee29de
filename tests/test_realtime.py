"""Real-time stack tests: G-buffer, ReSTIR DI, SVGF, full frame loop."""
import copy

import jax.numpy as jnp
import numpy as np

from tests.fixtures import CBOX_JSON
from vision_tpu.scene.scene import Scene


def small_scene(res=32):
    s = copy.deepcopy(CBOX_JSON)
    s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = [res, res]
    return Scene(s)


class TestGBuffer:
    def test_primary_visibility(self):
        from vision_tpu.sensor.gbuffer import compute_gbuffer
        sc = small_scene(32)
        gb = compute_gbuffer(sc.data, sc.camera, 0)
        v = np.asarray(gb.valid)
        assert v.mean() > 0.95  # almost all pixels hit the box interior
        d = np.asarray(gb.depth)[v]
        assert (d > 3.0).all() and (d < 12.0).all()
        nrm = np.asarray(gb.normal)[v]
        np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-3)
        alb = np.asarray(gb.albedo)[v]
        assert (alb >= 0).all() and (alb <= 1.0).all()
        # static camera: zero motion
        np.testing.assert_allclose(np.asarray(gb.motion)[v], 0.0, atol=0.51)

    def test_emission_on_light_pixels(self):
        from vision_tpu.sensor.gbuffer import compute_gbuffer
        sc = small_scene(48)
        gb = compute_gbuffer(sc.data, sc.camera, 0, jitter=False)
        em = np.asarray(gb.emission).reshape(48, 48, 3)
        assert em[:10].max() > 10.0  # the area light is near the top rows
        assert em[20:].max() == 0.0


class TestReSTIR:
    def test_di_unbiasedness_vs_pt_direct(self):
        """ReSTIR DI (no reuse) averaged over frames should match direct-only
        path tracing brightness."""
        from vision_tpu.sensor.gbuffer import compute_gbuffer
        from vision_tpu.integrator import restir
        from vision_tpu.core import rng as vrng
        from vision_tpu.render import render
        sc = small_scene(32)
        n = 32 * 32
        acc = None
        frames = 12
        for f in range(frames):
            gb = compute_gbuffer(sc.data, sc.camera, f)
            st = vrng.seed(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(f + 77))
            st, L, res = restir.restir_di(sc.data, gb, st, prev=None,
                                          m_light=8, spatial_taps=0,
                                          resolution=(32, 32))
            acc = L if acc is None else acc + L
        restir_img = np.asarray(acc / frames).reshape(32, 32, 3)

        sc.max_depth = 1  # direct only
        pt_img = render(sc, spp=16)
        assert np.isfinite(restir_img).all()
        # brightness agreement within MC noise
        ratio = restir_img.mean() / pt_img.mean()
        assert 0.8 < ratio < 1.25, ratio

    def test_spatial_reuse_reduces_variance(self):
        from vision_tpu.sensor.gbuffer import compute_gbuffer
        from vision_tpu.integrator import restir
        from vision_tpu.core import rng as vrng
        sc = small_scene(32)
        n = 32 * 32
        gb = compute_gbuffer(sc.data, sc.camera, 0)

        def var_of(spatial_taps, m_light=2):
            st = vrng.seed(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(9))
            _, L, _ = restir.restir_di(sc.data, gb, st, m_light=m_light,
                                       spatial_taps=spatial_taps,
                                       resolution=(32, 32))
            x = np.asarray(L)
            return x.var()

        assert var_of(4) < var_of(0) * 1.05


class TestSVGF:
    def test_temporal_accumulation_reduces_noise(self):
        from vision_tpu.post import svgf as sv
        H = W = 32
        rs = np.random.RandomState(0)
        clean = np.tile(np.linspace(0.2, 0.8, W)[None, :, None], (H, 1, 3))
        albedo = np.ones((H, W, 3), np.float32) * 0.7
        normal = np.tile(np.asarray([0, 0, 1.0], np.float32), (H, W, 1))
        depth = np.ones((H, W), np.float32) * 5
        motion = np.zeros((H, W, 2), np.float32)
        state = sv.init_state(H, W)
        errs = []
        for f in range(6):
            noisy = clean + rs.randn(H, W, 3) * 0.2
            out, state = sv.svgf_filter(
                jnp.asarray(noisy, jnp.float32), jnp.asarray(albedo),
                jnp.asarray(normal), jnp.asarray(depth), jnp.asarray(motion),
                state, n_passes=2)
            errs.append(float(np.abs(np.asarray(out) - clean).mean()))
        assert errs[-1] < errs[0] * 0.8
        assert float(np.asarray(state.history).mean()) > 4.0


class TestRealtimeLoop:
    def test_frames_converge_to_offline_brightness(self):
        """The temporal loop must stay within a band of the offline render
        mean — catches feedback explosions (a demodulation bug once sent
        frame-2 brightness to 100x through SVGF history)."""
        from vision_tpu.integrator.realtime import RealTimeState, render_realtime
        from vision_tpu.render import render
        sc = small_scene(32)
        offline = render(sc, spp=8).mean()
        state = RealTimeState.initial((32, 32))
        imgs = []
        for _ in range(4):
            img, state = render_realtime(sc.data, sc.camera, state,
                                         m_light=4, spatial_taps=1,
                                         svgf_passes=2)
            imgs.append(np.asarray(img))
        assert all(np.isfinite(i).all() for i in imgs)
        for i, img in enumerate(imgs):
            ratio = img.mean() / max(offline, 1e-9)
            assert 0.3 < ratio < 3.0, (i, ratio)
        assert int(state.frame) == 4

    def test_sharc_fills_and_biases_little(self):
        """SHARC in the realtime loop (rt.cpp dispatch order): the cache
        accumulates GI path samples across frames, and cached-vs-traced
        frames agree in brightness once the cache has converged."""
        from vision_tpu.integrator.realtime import RealTimeState, render_realtime
        sc = small_scene(32)
        state = RealTimeState.initial((32, 32), sharc_capacity=1 << 12,
                                      base_voxel=0.4)
        means_on = []
        for _ in range(6):
            img, state = render_realtime(sc.data, sc.camera, state,
                                         m_light=4, spatial_taps=1,
                                         svgf_passes=1, use_sharc=True)
            means_on.append(float(np.asarray(img).mean()))
        filled = float(np.asarray(state.sharc.total_n > 0).mean())
        assert filled > 0.001, "cache never accumulated"

        state2 = RealTimeState.initial((32, 32))
        means_off = []
        for _ in range(6):
            img, state2 = render_realtime(sc.data, sc.camera, state2,
                                          m_light=4, spatial_taps=1,
                                          svgf_passes=1, use_sharc=False)
            means_off.append(float(np.asarray(img).mean()))
        a, b = means_on[-1], means_off[-1]
        assert 0.5 < a / max(b, 1e-9) < 2.0, (a, b)


def test_half_res_gi_upsampled():
    """gi_scale=0.5: GI renders on a quarter lattice and joint-bilaterally
    upsamples against the full-res G-buffer (Upsampler plugin in its
    production role). Must stay finite, converge near the full-res result,
    and keep consistent state shapes across frames."""
    import copy
    import jax.numpy as jnp
    from tests.fixtures import CBOX_JSON
    from vision_tpu.scene.scene import Scene
    from vision_tpu.integrator import realtime as rt

    s = copy.deepcopy(CBOX_JSON)
    s["camera"]["param"]["radiance_collector"]["param"][
        "resolution"] = [32, 32]
    sc = Scene(s)

    def run(scale, frames=8):
        st = rt.RealTimeState.initial((32, 32), gi_scale=scale)
        acc = None
        for i in range(frames):
            img, st = rt.render_realtime(sc.data, sc.camera, st,
                                         gi_scale=scale)
            w = 1.0 / (i + 1)
            acc = img if acc is None else acc * (1 - w) + img * w
        return np.asarray(acc)

    full = run(1.0)
    half = run(0.5)
    assert np.isfinite(half).all()
    assert half.mean() > 0
    # upsampled GI approximates the full-res frame. The residual bias is
    # EDGE-PROPORTIONAL (bilateral bleed at GI texel boundaries): measured
    # +34% at this tiny 32^2 fixture, +15% at 64^2, a few % at production
    # resolutions — bound it loosely here, it exists to catch blowups
    # (the pre-fix spatial-temporal feedback measured +500%)
    assert abs(half.mean() - full.mean()) / full.mean() < 0.45
