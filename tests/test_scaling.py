"""Distribution scaling: weak-scaling harness on the 8-device virtual mesh.

On this CPU mesh the 8 'devices' are timesliced over the host cores, so
perfect weak scaling shows up as t(dp=8, 8x pixels) <= 8 * t(dp=1) * eps:
the assertion bounds SHARDING OVERHEAD (a catastrophic bug — e.g. every
chip rendering the full frame — would blow it up 8x). Real >=90%
wall-clock efficiency is measured on hardware by tools/scaling_bench.py.
"""
import copy

import jax
import numpy as np

from tests.fixtures import CBOX_JSON
from vision_tpu.scene.scene import Scene


def small_scene(res=32):
    s = copy.deepcopy(CBOX_JSON)
    s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = [res, res]
    return Scene(s)


def test_weak_scaling_overhead_bounded():
    from vision_tpu.parallel import launch
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    sc = small_scene(32)
    times = launch.measure_weak_scaling(
        sc.data, sc.camera, sc.filter, dp_sizes=(1, 8),
        pixels_per_chip=32 * 32, max_depth=3, iters=2)
    assert 1 in times and 8 in times
    t1, t8 = times[1], times[8]
    # timesliced bound: 8x the work on shared cores; 35% overhead budget
    assert t8 < 8.0 * t1 * 1.35, (t1, t8)


def test_sharded_matches_single_device():
    """dp-sharded render must agree with the unsharded render (same total
    pixel grid, sample-replicated over sp=1)."""
    from vision_tpu.parallel import dist
    from vision_tpu.integrator import pt
    import jax.numpy as jnp
    from vision_tpu.core import rng

    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs 4 virtual devices")
    sc = small_scene(16)
    mesh = dist.make_mesh(jax.devices()[:4], sp=1)
    img_sh = dist.render_sharded(sc.data, sc.camera, sc.filter, 3, mesh,
                                 max_depth=2)

    W, H = sc.camera.resolution
    n = W * H
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % W).astype(jnp.float32)
    py = (pix // W).astype(jnp.float32)
    st = rng.seed(pix, jnp.uint32(3))
    st, u_film = rng.next_2d(st)
    offset, fw = sc.filter.sample(u_film)
    p_film = jnp.stack([px + 0.5, py + 0.5], -1) + offset
    st, u_lens = rng.next_2d(st)
    ray = sc.camera.generate_ray(p_film, u_lens)
    L, _ = pt.radiance(sc.data, ray, st, 2, 0, 1.0)
    ref = (L * fw[..., None]).reshape(H, W, 3)
    assert np.allclose(np.asarray(img_sh), np.asarray(ref),
                       rtol=1e-4, atol=1e-5)


def test_init_distributed_single_process_noop():
    from vision_tpu.parallel import launch
    # single-process: must not raise, returns False (un-distributed) or
    # True if a runtime is already up
    ok = launch.init_distributed()
    assert ok in (True, False)


def test_texel_recovery_on_mesh():
    """Closed-loop texture gradients on the 8-device mesh: perturb the
    atlas texels and recover them with sharded training steps (VERDICT r4:
    the distributed differentiable surface must be proven for textures,
    not just materials/camera). The training loss carries a per-sp-shard
    variance floor by design (each shard scores its own 1-spp estimate),
    so recovery is measured as EXCESS loss over the true-parameter floor."""
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp
    import optax
    from vision_tpu.parallel import dist
    from vision_tpu.integrator import pt
    from vision_tpu.core import rng
    import __graft_entry__ as ge

    s, sdir = ge._small_cbox(16, textured=True)
    sc = Scene(s, scene_dir=sdir)
    mesh = dist.make_mesh(jax.devices()[:8], sp=2)
    R = 256
    pix = jnp.arange(R, dtype=jnp.uint32)
    p_film = jnp.stack([(pix % 16).astype(jnp.float32) + 0.5,
                        (pix // 16).astype(jnp.float32) + 0.5], -1)
    ray = sc.camera.generate_ray(p_film)
    f0 = 3
    # target = the sp-averaged image at the TRUE atlas, matching the
    # training step's per-shard RNG streams exactly
    L = 0
    for sp_i in range(2):
        st = rng.seed(pix, jnp.uint32(2 * f0 + sp_i))
        Ls, _ = pt.radiance(sc.data, ray, st, max_depth=2)
        L = L + Ls
    target = np.asarray((L / 2).reshape(16, 16, 3))

    floor, _ = dist.training_step(sc.data, sc.camera, sc.filter, f0, mesh,
                                  target, max_depth=2, groups=("atlas",))
    floor = float(floor)
    true_atlas = sc.data.atlas.data
    d = sc.data.replace(atlas=sc.data.atlas.replace(
        data=jnp.clip(true_atlas * 0.3 + 0.4, 0, 1)))
    opt = optax.adam(0.1)
    ostate = opt.init(d.atlas.data)
    losses = []
    for i in range(12):
        loss, grads = dist.training_step(d, sc.camera, sc.filter, f0, mesh,
                                         target, max_depth=2,
                                         groups=("atlas",))
        losses.append(float(loss))
        upd, ostate = opt.update(grads["atlas"]["data"], ostate)
        d = d.replace(atlas=d.atlas.replace(
            data=jnp.clip(d.atlas.data + upd, 0, 1)))
    assert np.isfinite(losses).all()
    excess0 = losses[0] - floor
    excess1 = losses[-1] - floor
    assert excess0 > 1e-5, "perturbation produced no signal"
    assert excess1 < 0.3 * excess0, (floor, losses)
    # the visible texels must move toward the truth
    err0 = float(jnp.abs(jnp.clip(true_atlas * 0.3 + 0.4, 0, 1)
                         - true_atlas).mean())
    err1 = float(jnp.abs(d.atlas.data - true_atlas).mean())
    assert err1 < err0
