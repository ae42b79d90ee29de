"""Differentiability: AD gradients vs finite differences + inverse rendering.

This is the BASELINE.md 'pixel-gradient correctness' criterion: gradients to
material/light parameters match finite differences (same RNG streams, RR
disabled via min_depth so decisions don't flip)."""
import copy

import jax
import jax.numpy as jnp
import numpy as np

from tests.fixtures import CBOX_JSON
from vision_tpu.scene.scene import Scene


def small_scene(res=24):
    s = copy.deepcopy(CBOX_JSON)
    s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = [res, res]
    return Scene(s)


def _mean_image(scene_data, camera, kd, light_color, depth=2):
    from vision_tpu.core import rng
    from vision_tpu.integrator import pt
    sc = scene_data.replace(
        materials=scene_data.materials.replace(kd=kd),
        lights=scene_data.lights.replace(color=light_color))
    W, H = camera.resolution
    n = W * H
    pix = jnp.arange(n, dtype=jnp.uint32)
    st = rng.seed(pix, jnp.uint32(3))
    px = (pix % W).astype(jnp.float32)
    py = (pix // W).astype(jnp.float32)
    ray = camera.generate_ray(jnp.stack([px + 0.5, py + 0.5], -1))
    L, _ = pt.radiance(sc, ray, st, max_depth=depth, min_depth=99, remat=True)
    return jnp.mean(L)


class TestGradients:
    def test_light_color_gradient_matches_fd(self):
        """Image is linear in light radiance -> AD == FD almost exactly."""
        sc = small_scene(24)
        kd0 = sc.data.materials.kd
        lc0 = sc.data.lights.color
        f = lambda lc: _mean_image(sc.data, sc.camera, kd0, lc)
        g = jax.grad(f)(lc0)
        eps = 1e-1
        for ch in range(3):
            lc_p = lc0.at[0, ch].add(eps)
            lc_m = lc0.at[0, ch].add(-eps)
            fd = (float(f(lc_p)) - float(f(lc_m))) / (2 * eps)
            ad = float(g[0, ch])
            assert abs(ad - fd) < max(1e-5, 2e-2 * abs(fd)), (ch, ad, fd)

    def test_albedo_gradient_matches_fd(self):
        sc = small_scene(24)
        kd0 = sc.data.materials.kd
        lc0 = sc.data.lights.color
        f = lambda kd: _mean_image(sc.data, sc.camera, kd, lc0)
        g = jax.grad(f)(kd0)
        # white material (index of "White") dominates the scene
        white = 2
        eps = 1e-3
        kd_p = kd0.at[white, 1].add(eps)
        kd_m = kd0.at[white, 1].add(-eps)
        fd = (float(f(kd_p)) - float(f(kd_m))) / (2 * eps)
        ad = float(g[white, 1])
        assert fd > 0.0 and ad > 0.0
        assert abs(ad - fd) / abs(fd) < 0.05, (ad, fd)

    def test_gradients_finite_everywhere(self):
        sc = small_scene(16)
        from vision_tpu.diff.optimize import float_leaves, make_loss
        params = float_leaves(sc.data.materials)
        loss = make_loss(sc.data, sc.camera,
                         np.zeros((16, 16, 3), np.float32), max_depth=2)
        grads = jax.grad(loss)(params, jnp.uint32(0))
        for k, g in grads.items():
            assert np.isfinite(np.asarray(g)).all(), k


class TestInverseRendering:
    def test_recover_wall_albedo(self):
        """Classic texture/albedo recovery (BASELINE config 5 spirit):
        perturb the white walls' albedo, optimize back to the target."""
        from vision_tpu.diff.optimize import optimize_materials, render_with_params, float_leaves
        sc = small_scene(24)
        true_kd = sc.data.materials.kd
        target = render_with_params(sc.data, sc.camera,
                                    {"kd": true_kd}, 0, max_depth=3, spp=2)
        # perturb: white -> grey-blue
        bad_kd = true_kd.at[2].set(jnp.asarray([0.3, 0.3, 0.9]))
        sc_bad = sc.data.replace(materials=sc.data.materials.replace(kd=bad_kd))
        params, losses = optimize_materials(
            sc_bad, sc.camera, target, param_keys=("kd",), steps=60,
            lr=5e-2, max_depth=3, spp=2, fixed_frame=0)
        assert losses[-1] < losses[0] * 0.05, losses[::8]
        rec = np.asarray(params["kd"][2])
        tru = np.asarray(true_kd[2])
        assert np.abs(rec - tru).max() < 0.08, (rec, tru)


class TestFullSurface:
    """Gradients for the remaining parameter groups of the differentiable
    surface (base/encoded_object.h analog): texture texels, light position,
    camera pose; plus texture recovery (BASELINE config 5)."""

    def _textured_scene(self, res=24):
        """cbox with an image-textured back wall (texture written to tmp)."""
        import os
        import tempfile
        from vision_tpu.sensor import film
        rs = np.random.RandomState(7)
        tex = (rs.rand(8, 8, 3) * 0.8 + 0.1).astype(np.float32)
        d = tempfile.mkdtemp()
        fn = os.path.join(d, "wall.png")
        film.to_png(tex, fn)
        s = copy.deepcopy(CBOX_JSON)
        s["camera"]["param"]["radiance_collector"]["param"][
            "resolution"] = [res, res]
        s["materials"] = list(s["materials"]) + [{
            "type": "diffuse", "name": "texwall",
            "param": {"color": {"fn": "wall.png", "color_space": "srgb"}}}]
        for sh in s["shapes"]:
            if sh.get("name") == "back":
                sh["param"]["material"] = "texwall"
                break
        return Scene(s, scene_dir=d)

    def test_texture_texel_gradients_and_recovery(self):
        from vision_tpu.diff import optimize as opt
        sc = self._textured_scene(24)
        assert sc.data.atlas.data.shape[0] > 1, "texture never loaded"
        true_params = opt.param_surface(sc.data, sc.camera, ("atlas",))
        target = opt.render_with_params(sc.data, sc.camera, true_params, 5,
                                        max_depth=2)

        # start from a flat gray atlas
        gray = sc.data.replace(atlas=sc.data.atlas.replace(
            data=jnp.full_like(sc.data.atlas.data, 0.5)))
        params, losses = opt.optimize_scene(
            gray, sc.camera, target, groups=("atlas",), steps=24, lr=0.1,
            max_depth=2, fixed_frame=5)
        assert losses[-1] < losses[0] * 0.35, losses[::6]

    def test_light_position_gradient_matches_fd(self):
        from vision_tpu.diff import optimize as opt
        sc = small_scene(16)

        def f(pos):
            params = {"lights": {"position": pos}}
            img = opt.render_with_params(sc.data, sc.camera, params, 3,
                                         max_depth=2)
            return jnp.mean(img)

        pos0 = sc.data.lights.position
        g = jax.grad(f)(pos0)
        # FD on the light y-coordinate (light 0)
        eps = 1e-2
        e = jnp.zeros_like(pos0).at[0, 1].set(eps)
        fd = (f(pos0 + e) - f(pos0 - e)) / (2 * eps)
        ad = g[0, 1]
        assert np.isfinite(float(ad))
        denom = max(abs(float(fd)), 1e-5)
        assert abs(float(ad) - float(fd)) / denom < 0.2, (float(ad), float(fd))

    def test_camera_pose_gradient_flows(self):
        """Camera-pose gradients exist and are finite/nonzero. An FD
        comparison is NOT meaningful here: translating the camera moves
        silhouettes, so finite differences are discontinuity-dominated
        while AD yields the interior derivative (edge sampling is a future
        round — module docstring)."""
        from vision_tpu.diff import optimize as opt
        sc = small_scene(16)

        def f(c2w):
            params = {"camera": {"c2w": c2w}}
            img = opt.render_with_params(sc.data, sc.camera, params, 3,
                                         max_depth=2)
            return jnp.mean(img)

        g = jax.grad(f)(sc.camera.c2w)
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g).sum() > 1e-6, "camera gradient vanished"
