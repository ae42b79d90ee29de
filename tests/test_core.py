"""Unit tests: math, RNG, warps, alias tables, transforms."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_tpu.core import math as vm
from vision_tpu.core import rng, warp
from vision_tpu.core import transform as xf
from vision_tpu.lights.alias import build_alias, sample_alias


def _uniforms(n, seed=1):
    st = rng.seed(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(seed))
    st, u = rng.next_2d(st)
    return u


class TestRng:
    def test_uniform_moments(self):
        u = np.asarray(_uniforms(100_000))
        assert abs(u.mean() - 0.5) < 5e-3
        assert abs(u.var() - 1 / 12) < 5e-3
        assert u.min() >= 0.0 and u.max() < 1.0

    def test_decorrelated_pixels(self):
        st = rng.seed(jnp.arange(10_000, dtype=jnp.uint32), jnp.uint32(0))
        _, u1 = rng.next_1d(st)
        st2 = rng.seed(jnp.arange(10_000, dtype=jnp.uint32), jnp.uint32(1))
        _, u2 = rng.next_1d(st2)
        corr = np.corrcoef(np.asarray(u1), np.asarray(u2))[0, 1]
        assert abs(corr) < 0.05

    def test_deterministic(self):
        st = rng.seed(jnp.arange(16, dtype=jnp.uint32), jnp.uint32(7))
        _, a = rng.next_1d(st)
        _, b = rng.next_1d(st)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestWarp:
    def test_cosine_hemisphere(self):
        u = _uniforms(50_000)
        w = np.asarray(warp.square_to_cosine_hemisphere(u))
        assert np.all(w[:, 2] >= 0)
        np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-5)
        # E[cos theta] under cos-weighted pdf = 2/3
        assert abs(w[:, 2].mean() - 2 / 3) < 5e-3

    def test_sphere_uniform(self):
        u = _uniforms(50_000)
        w = np.asarray(warp.square_to_sphere(u))
        np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-5)
        assert np.abs(w.mean(0)).max() < 0.02

    def test_triangle_warp(self):
        u = _uniforms(10_000)
        b = np.asarray(warp.square_to_triangle(u))
        assert np.all(b >= 0) and np.all(b.sum(-1) <= 1.0 + 1e-6)
        # uniform over triangle: E[b0] = 1/3
        assert abs(b[:, 0].mean() - 1 / 3) < 0.01

    def test_mis_weight(self):
        w = warp.mis_weight(jnp.asarray(1.0), jnp.asarray(3.0))
        assert abs(float(w) - 0.25) < 1e-6
        assert float(warp.mis_weight(jnp.asarray(0.0), jnp.asarray(0.0))) == 0.0

    def test_tent(self):
        u = _uniforms(50_000)[:, 0]
        x = np.asarray(warp.sample_tent(u, jnp.asarray(2.0)))
        assert abs(x.mean()) < 0.02
        assert np.all(np.abs(x) <= 2.0)


class TestAlias:
    def test_pmf_exact(self):
        w = [1.0, 2.0, 3.0, 4.0]
        prob, alias, pmf = build_alias(w)
        np.testing.assert_allclose(pmf, np.asarray(w) / 10.0, atol=1e-7)

    def test_sampling_matches_pmf(self):
        w = np.asarray([0.1, 0.5, 0.2, 1.0, 0.01, 3.0])
        prob, alias, pmf = build_alias(w)
        u = _uniforms(200_000)[:, 0]
        idx, p, _ = sample_alias(jnp.asarray(prob), jnp.asarray(alias),
                                 jnp.asarray(pmf), u)
        counts = np.bincount(np.asarray(idx), minlength=6) / 200_000
        np.testing.assert_allclose(counts, w / w.sum(), atol=5e-3)


class TestTransform:
    def test_look_at_left_handed(self):
        m = xf.look_at([0, 1, 6.8], [0, 1, 0], [0, 1, 0])
        # forward = -z world
        np.testing.assert_allclose(m[:3, 2], [0, 0, -1], atol=1e-6)
        # screen-right maps to world +x (golden-image verified convention)
        np.testing.assert_allclose(m[:3, 0], [1, 0, 0], atol=1e-6)

    def test_matrix_roundtrip(self):
        tdesc = {"type": "matrix4x4",
                 "param": {"matrix4x4": [[1, 0, 0, 0], [0, 1, 0, 0],
                                         [0, 0, 1, 0], [5, 6, 7, 1]]}}
        m = xf.from_json(tdesc)
        np.testing.assert_allclose(m[:3, 3], [5, 6, 7])

    def test_normals_nonuniform_scale(self):
        m = xf.scaling([2.0, 1.0, 1.0])
        n = xf.apply_normals(m, np.array([[1.0, 1.0, 0.0]]) / np.sqrt(2))
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-7)
        assert n[0, 1] > n[0, 0]  # x-normal shrinks under x-stretch


class TestVecMath:
    def test_reflect(self):
        wo = vm.vec3(jnp.asarray([0.5]), jnp.asarray([0.0]), jnp.asarray([np.sqrt(0.75)]))
        n = vm.vec3(jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([1.0]))
        r = np.asarray(vm.reflect(wo, n))[0]
        np.testing.assert_allclose(r, [-0.5, 0, np.sqrt(0.75)], atol=1e-6)

    def test_refract_tir(self):
        # from glass (eta_rel=1/1.5 exit) at grazing angle -> TIR
        wi = vm.normalize(jnp.asarray([[0.9, 0.0, 0.3]]))
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        valid, _ = vm.refract(wi, n, jnp.asarray([1.0 / 1.5]))
        assert not bool(valid[0])

    def test_coordinate_system_orthonormal(self):
        rs = np.random.RandomState(0)
        n = vm.normalize(jnp.asarray(rs.randn(100, 3), jnp.float32))
        t, b = vm.coordinate_system(n)
        np.testing.assert_allclose(np.asarray(vm.dot(t, n)), 0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(vm.dot(b, n)), 0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(vm.dot(t, b)), 0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(vm.length(t)), 1, atol=1e-5)
