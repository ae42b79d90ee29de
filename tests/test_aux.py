"""Checkpoint/resume, SDK, debug utilities."""
import copy
import os
import tempfile

import jax.numpy as jnp
import numpy as np

from tests.fixtures import CBOX_JSON
from vision_tpu.scene.scene import Scene


def small_scene(res=24):
    s = copy.deepcopy(CBOX_JSON)
    s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = [res, res]
    return Scene(s)


class TestCheckpoint:
    def test_resume_is_bitexact(self):
        from vision_tpu.utils.checkpoint import render_resumable
        sc = small_scene(24)
        with tempfile.TemporaryDirectory() as d:
            p1 = os.path.join(d, "a.npz")
            full = render_resumable(sc, 6, p1, checkpoint_every=100)
            # interrupted run: 3 spp, checkpoint, then resume to 6
            p2 = os.path.join(d, "b.npz")
            render_resumable(sc, 3, p2, checkpoint_every=3)
            resumed = render_resumable(sc, 6, p2, checkpoint_every=3)
            np.testing.assert_array_equal(full, resumed)

    def test_extra_state_roundtrip(self):
        from vision_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "c.npz")
            save_checkpoint(p, np.ones((4, 4, 3)), 7,
                            extra={"opt": {"mu": np.arange(3.0)}})
            acc, fi, extra = load_checkpoint(p)
            assert fi == 7
            np.testing.assert_allclose(np.asarray(extra["opt"]["mu"]),
                                       [0.0, 1.0, 2.0])


class TestSDK:
    def test_programmatic_scene(self):
        from vision_tpu.sdk import VisionRenderer
        r = VisionRenderer(resolution=(32, 32))
        white = r.add_material({"type": "diffuse",
                                "param": {"color": [0.7, 0.7, 0.7]}})
        # floor quad + emissive quad above it
        quad = np.asarray([[-1, 0, -1], [1, 0, -1], [-1, 0, 1], [1, 0, 1]],
                          np.float32)
        tris = np.asarray([[0, 1, 2], [2, 1, 3]], np.int32)
        r.add_instance(quad, tris, material=white)
        # this winding's geometric normal already faces down toward the floor
        light_quad = quad * 0.3 + np.asarray([0, 1.5, 0], np.float32)
        r.add_instance(light_quad, tris, emission=[10, 10, 10])
        r.set_camera([0, 1.0, 2.5], [0, 0.5, 0], fov_y=40)
        r.build_accel()
        r.render(spp=4)
        img = r.download_radiance()
        assert img.shape == (32, 32, 3)
        assert np.isfinite(img).all()
        assert img.max() > 0.1  # lit
        disp = r.download_image()
        assert disp.min() >= 0 and disp.max() <= 1.0


class TestDebugUtils:
    def test_memory_stats(self, cbox_scene):
        from vision_tpu.utils.debug import scene_memory_stats
        stats = scene_memory_stats(cbox_scene.data)
        assert stats["TOTAL"] > 1000
        assert any(k.startswith("tri_p0") for k in stats)

    def test_validate_radiance(self):
        from vision_tpu.utils.debug import validate_radiance
        ok, st = validate_radiance(np.ones((4, 4, 3)))
        assert ok
        bad = np.ones((4, 4, 3))
        bad[0, 0, 0] = np.nan
        ok, st = validate_radiance(bad)
        assert not ok and st["nan"] == 1

    def test_pixel_mask(self):
        from vision_tpu.utils.debug import pixel_debug_mask
        m = np.asarray(pixel_debug_mask((8, 8), (2, 2), (4, 4)))
        assert m.sum() == 4


def test_svgf_spatial_moments_and_variance_propagation():
    """Reference SVGF fidelity (r4 weak #6): on frame 1 the temporal
    moments carry zero variance, so the spatial 7x7 estimate must kick in;
    and the a-trous chain must SHRINK variance as passes accumulate
    (var' = sum w^2 var / (sum w)^2)."""
    import jax.numpy as jnp
    from vision_tpu.post import svgf

    rs = np.random.RandomState(0)
    H = W = 32
    noise = jnp.asarray(0.5 + 0.3 * rs.randn(H, W, 3).astype(np.float32))
    albedo = jnp.ones((H, W, 3)) * 0.7
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 3))

    # frame-1 spatial variance must see the noise
    v = svgf._spatial_moments(noise, normal)
    assert float(v.mean()) > 1e-3

    # variance shrinks through the chain
    var0 = jnp.full((H, W), 0.09)
    out, var1 = svgf._atrous_var_pass(noise, var0, normal, albedo, 1)
    out, var2 = svgf._atrous_var_pass(out, var1, normal, albedo, 2)
    assert float(var1.mean()) < float(var0.mean())
    assert float(var2.mean()) < float(var1.mean())

    # end-to-end frame 1: filtering reduces noise on a flat signal
    state = svgf.init_state(H, W)
    filtered, _ = svgf.svgf_filter(
        noise * 0.7, albedo, normal, jnp.ones((H, W)),
        jnp.zeros((H, W, 2)), state)
    inp_std = float(jnp.std(noise * 0.7))
    out_std = float(jnp.std(filtered))
    assert out_std < 0.5 * inp_std, (inp_std, out_std)


def test_visualizer_overlays():
    """Visualizer (base/sensor/visualizer.h counterpart): world-space
    segments project through the camera and draw; normal whiskers and path
    overlays mark pixels."""
    import copy
    import jax.numpy as jnp
    from tests.fixtures import CBOX_JSON
    from vision_tpu.scene.scene import Scene
    from vision_tpu.sensor import visualizer as vz

    s = copy.deepcopy(CBOX_JSON)
    s["camera"]["param"]["radiance_collector"]["param"][
        "resolution"] = [48, 48]
    sc = Scene(s)
    # projection: a point straight ahead of the camera lands mid-frame
    r, front = vz.world_to_raster(sc.camera, np.array([[0.0, 1.0, 0.0]]))
    assert front[0]
    assert abs(r[0, 0] - 24.0) < 1.0 and abs(r[0, 1] - 24.0) < 1.0
    # behind the camera is culled
    _, back = vz.world_to_raster(sc.camera, np.array([[0.0, 1.0, 99.0]]))
    assert not back[0]

    img = np.zeros((48, 48, 3), np.float32)
    vz.draw_segments(img, [[-0.5, 1.0, 0.0]], [[0.5, 1.0, 0.0]], sc.camera)
    assert (img[..., 0] > 0.5).sum() >= 8  # a horizontal red line

    img2 = np.zeros((48, 48, 3), np.float32)
    vz.overlay_normals(img2, sc.data, sc.camera, stride=16)
    assert (img2[..., 1] > 0.5).any()

    img3 = np.zeros((48, 48, 3), np.float32)
    vz.overlay_rays(img3, sc.data, sc.camera, [24 * 48 + 24], max_depth=2)
    assert (img3.sum(-1) > 0).any()
