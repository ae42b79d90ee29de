"""Native C++ host runtime: OBJ parser + Morton sort vs Python reference."""
import os
import tempfile

import numpy as np
import pytest

from vision_tpu import native

OBJ_SAMPLE = """# test
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vt 0 0
vt 1 0
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1
f 2/2/1 4/1/1 3/3/1
"""


@pytest.mark.skipif(not native.available(), reason="native lib not built")
class TestNativeObj:
    def test_parse_matches_python(self):
        with tempfile.NamedTemporaryFile("w", suffix=".obj", delete=False) as f:
            f.write(OBJ_SAMPLE)
            path = f.name
        try:
            out = native.load_obj_native(path)
            assert out is not None
            P, N, UV, T = out
            assert T.shape == (2, 3)
            assert P.shape[1] == 3
            from vision_tpu.scene.shapes import load_obj
            ref = load_obj(path)
            assert ref.triangles.shape == T.shape
            # triangle soup equal: compare world-space corner sets
            def soup(PP, TT):
                s = PP[TT].reshape(-1, 3)
                return np.sort(s.view([('', s.dtype)] * 3), axis=0)
            np.testing.assert_allclose(P[T].reshape(-1, 3).sum(0),
                                       ref.positions[ref.triangles].reshape(-1, 3).sum(0),
                                       atol=1e-6)
        finally:
            os.unlink(path)

    def test_real_asset(self):
        path = "/root/reference/res/render_scene/cbox/cube.obj"
        if not os.path.exists(path):
            pytest.skip("asset missing")
        out = native.load_obj_native(path)
        assert out is not None
        P, N, UV, T = out
        from vision_tpu.scene.shapes import load_obj
        ref = load_obj(path)
        assert len(T) == len(ref.triangles)
        # identical triangle soup geometry
        a = P[T].reshape(-1, 9)
        b = ref.positions[ref.triangles].reshape(-1, 9)
        np.testing.assert_allclose(np.sort(a, axis=0), np.sort(b, axis=0),
                                   atol=1e-5)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
class TestMortonSort:
    def test_matches_python(self):
        from vision_tpu.accel.bvh import _morton3
        rs = np.random.RandomState(0)
        c = rs.rand(5000, 3).astype(np.float32) * 10 - 5
        order_n = native.morton_sort_native(c)
        lo = c.min(0)
        ext = np.maximum(c.max(0) - lo, 1e-12)
        q = np.clip(((c - lo) / ext) * 1023.0, 0, 1023).astype(np.uint32)
        codes = _morton3(q[:, 0], q[:, 1], q[:, 2])
        order_p = np.argsort(codes, kind="stable")
        np.testing.assert_array_equal(np.sort(codes[order_n]),
                                      np.sort(codes[order_p]))
        # keys along native order are non-decreasing
        assert (np.diff(codes[order_n].astype(np.int64)) >= 0).all()
