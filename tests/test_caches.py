"""Radiance caches: SHARC hash grid + surfel pool."""
import jax.numpy as jnp
import numpy as np

from vision_tpu.caches import sharc, surfel


class TestSharc:
    def test_accumulate_resolve_query(self):
        cache = sharc.SharcCache.create(capacity=1 << 12, base_voxel=0.1)
        cam = jnp.zeros(3)
        n = 512
        rs = np.random.RandomState(0)
        pos = jnp.asarray(np.tile([[1.0, 2.0, 3.0]], (n, 1)), jnp.float32)
        nrm = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (n, 1)), jnp.float32)
        rad = jnp.asarray(np.tile([[2.0, 4.0, 6.0]], (n, 1)), jnp.float32)
        mask = jnp.ones(n, bool)
        cache = sharc.update(cache, pos, nrm, rad, cam, mask)
        cache = sharc.resolve(cache)
        got, ok = sharc.query(cache, pos[:4], nrm[:4], cam)
        assert bool(ok.all())
        np.testing.assert_allclose(np.asarray(got), [[2, 4, 6]] * 4, rtol=1e-4)

    def test_different_cells_separate(self):
        cache = sharc.SharcCache.create(capacity=1 << 12, base_voxel=0.1)
        cam = jnp.zeros(3)
        p1 = jnp.asarray([[1.0, 1.0, 1.0]] * 64)
        p2 = jnp.asarray([[5.0, 5.0, 5.0]] * 64)
        nrm = jnp.asarray([[0.0, 0.0, 1.0]] * 64)
        m = jnp.ones(64, bool)
        cache = sharc.update(cache, p1, nrm, jnp.full((64, 3), 1.0), cam, m)
        cache = sharc.update(cache, p2, nrm, jnp.full((64, 3), 9.0), cam, m)
        cache = sharc.resolve(cache)
        g1, ok1 = sharc.query(cache, p1[:1], nrm[:1], cam)
        g2, ok2 = sharc.query(cache, p2[:1], nrm[:1], cam)
        assert bool(ok1[0]) and bool(ok2[0])
        assert abs(float(g1[0, 0]) - 1.0) < 1e-3
        assert abs(float(g2[0, 0]) - 9.0) < 1e-3

    def test_miss_on_unseen(self):
        cache = sharc.SharcCache.create(capacity=1 << 12)
        got, ok = sharc.query(cache, jnp.ones((4, 3)),
                              jnp.asarray([[0, 0, 1.0]] * 4), jnp.zeros(3))
        assert not bool(ok.any())
        np.testing.assert_array_equal(np.asarray(got), 0.0)

    def test_compaction_evicts(self):
        cache = sharc.SharcCache.create(capacity=1 << 10)
        nrm = jnp.asarray([[0.0, 0.0, 1.0]] * 8)
        pos = jnp.asarray([[1.0, 1.0, 1.0]] * 8)
        cache = sharc.update(cache, pos, nrm, jnp.ones((8, 3)),
                             jnp.zeros(3), jnp.ones(8, bool))
        cache = sharc.resolve(cache)
        for _ in range(40):
            cache = sharc.compaction(cache, min_count=1.0, decay=0.5)
        _, ok = sharc.query(cache, pos[:1], nrm[:1], jnp.zeros(3))
        assert not bool(ok[0])


class TestSurfel:
    def test_spawn_accumulate_query(self):
        pool = surfel.SurfelPool.create(capacity=1 << 10, cell_size=0.5)
        n = 128
        pos = jnp.asarray([[0.2, 0.2, 0.2]] * n)
        nrm = jnp.asarray([[0.0, 1.0, 0.0]] * n)
        m = jnp.ones(n, bool)
        pool = surfel.spawn(pool, pos, nrm, m)
        pool = surfel.accumulate(pool, pos, jnp.full((n, 3), 3.0), m)
        got, w = surfel.query(pool, pos[:2], nrm[:2])
        assert (np.asarray(w) > 0.5).all()
        np.testing.assert_allclose(np.asarray(got)[:, 0],
                                   3.0 * np.asarray(w), rtol=1e-3)

    def test_orientation_rejects(self):
        pool = surfel.SurfelPool.create(capacity=1 << 10, cell_size=0.5)
        pos = jnp.asarray([[0.2, 0.2, 0.2]] * 16)
        up = jnp.asarray([[0.0, 1.0, 0.0]] * 16)
        down = -up
        m = jnp.ones(16, bool)
        pool = surfel.spawn(pool, pos, up, m)
        pool = surfel.accumulate(pool, pos, jnp.ones((16, 3)), m)
        _, w = surfel.query(pool, pos[:1], down[:1])
        assert float(w[0]) == 0.0


def test_surfel_cache_drives_realtime_gi():
    """The surfel pool is a selectable radiance-cache plugin for the
    real-time integrator (render_core/radiancecache/surfel counterpart of
    sharc): frames populate it and later frames query it."""
    import copy
    import jax.numpy as jnp
    from tests.fixtures import CBOX_JSON
    from vision_tpu.scene.scene import Scene
    from vision_tpu.integrator import realtime as rt
    from vision_tpu.caches.surfel import SurfelPool

    s = copy.deepcopy(CBOX_JSON)
    s["camera"]["param"]["radiance_collector"]["param"][
        "resolution"] = [16, 16]
    sc = Scene(s)
    state = rt.RealTimeState.initial((16, 16), cache="surfel")
    assert isinstance(state.sharc, SurfelPool)
    for _ in range(4):
        img, state = rt.render_realtime(sc.data, sc.camera, state)
    img = np.asarray(img)
    assert np.isfinite(img).all() and img.mean() > 0
    pool = state.sharc
    assert float(jnp.sum(pool.live)) > 8, "no surfels spawned"
    assert float(jnp.sum(pool.count)) > 8, "no irradiance accumulated"
