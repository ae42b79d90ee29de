"""Debug visualizer: host-side line overlays on rendered frames.

Counterpart of the reference `Visualizer`
(`/root/reference/src/base/sensor/visualizer.h:19-76`), which collects
line segments from the integrator (sampled rays, normals, shading frames)
and draws them CPU-side over the frame. Here the overlay works on numpy
images: world-space segments are projected through the camera's raster
transform and drawn with an anti-alias-free Bresenham (the reference also
draws hard lines).
"""
from __future__ import annotations

import numpy as np


def world_to_raster(camera, pts):
    """Project world points [N, 3] -> raster xy [N, 2] + in-front mask.
    Inverts Camera.generate_ray's raster -> camera-ray mapping."""
    c2w = np.asarray(camera.c2w)
    W, H = camera.resolution
    R = c2w[:3, :3]
    t = c2w[:3, 3]
    local = (np.asarray(pts, np.float64) - t) @ R  # world -> camera space
    z = local[..., 2]
    front = z > 1e-6
    zs = np.where(front, z, 1.0)
    sx = local[..., 0] / zs
    sy = local[..., 1] / zs
    thf = float(camera.tan_half_fov)
    (lx, ly), (ux, uy) = camera.screen_window()
    px = (sx / thf - lx) / (ux - lx) * W
    py = (uy - sy / thf) / (uy - ly) * H
    return np.stack([px, py], -1), front


def draw_segments(img, p0, p1, camera, color=(1.0, 0.2, 0.2)):
    """Draw world-space segments [N, 3]->[N, 3] over img [H, W, 3]
    (in place; returns img). Segments behind the camera are dropped."""
    H, W = img.shape[:2]
    a, fa = world_to_raster(camera, np.atleast_2d(p0))
    b, fb = world_to_raster(camera, np.atleast_2d(p1))
    col = np.asarray(color, img.dtype)
    for (ax, ay), (bx, by), ok in zip(a, b, fa & fb):
        if not ok:
            continue
        n = int(max(abs(bx - ax), abs(by - ay), 1)) + 1
        xs = np.linspace(ax, bx, n).round().astype(int)
        ys = np.linspace(ay, by, n).round().astype(int)
        m = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
        img[ys[m], xs[m]] = col
    return img


def overlay_normals(img, scene, camera, stride=8, scale=0.1,
                    color=(0.2, 1.0, 0.2)):
    """Draw shading-normal whiskers at every stride-th pixel's primary hit
    (visualizer.h draw_normal)."""
    import jax.numpy as jnp
    from ..integrator import pt
    from ..core.types import Ray  # noqa: F401

    W, H = camera.resolution
    xs, ys = np.meshgrid(np.arange(0, W, stride), np.arange(0, H, stride))
    pix = (ys * W + xs).reshape(-1)
    p_film = jnp.asarray(
        np.stack([xs.reshape(-1) + 0.5, ys.reshape(-1) + 0.5],
                 -1).astype(np.float32))
    ray = camera.generate_ray(p_film, jnp.zeros((len(pix), 2)))
    hit = pt.trace_closest(scene, ray)
    pos, ng, ns, uv, inst, mat_id, light_id = pt.compute_interaction(
        scene, ray, hit)
    ok = np.asarray(hit.prim_id) >= 0
    p0 = np.asarray(pos)[ok]
    p1 = p0 + np.asarray(ns)[ok] * scale
    return draw_segments(img, p0, p1, camera, color)


def overlay_rays(img, scene, camera, pixels, rng_seed=0, max_depth=3,
                 color=(1.0, 0.3, 0.1)):
    """Trace the paths of selected pixels and draw every bounce segment
    (visualizer.h condition_add_line_segment: the reference hooks this from
    Li for the picked pixel range)."""
    import jax.numpy as jnp
    from ..integrator import pt
    from ..core import rng
    from ..core.types import Ray

    W, H = camera.resolution
    pix = jnp.asarray(np.asarray(pixels, np.uint32))
    px = (pix % W).astype(jnp.float32) + 0.5
    py = (pix // W).astype(jnp.float32) + 0.5
    ray = camera.generate_ray(jnp.stack([px, py], -1),
                              jnp.zeros((len(pixels), 2)))
    st = rng.seed(pix, jnp.uint32(rng_seed))
    o = ray.origin
    d = ray.direction
    alive = np.ones(len(pixels), bool)
    for depth in range(max_depth):
        r = Ray.make(o, d)
        hit = pt.trace_closest(scene, r)
        pos, ngs, nss, uvs, inst, mat_id, light_id = pt.compute_interaction(
            scene, r, hit)
        hit_ok = np.asarray(hit.prim_id) >= 0
        seg_ok = alive & hit_ok
        if seg_ok.any():
            draw_segments(img, np.asarray(o)[seg_ok],
                          np.asarray(pos)[seg_ok], camera, color)
        alive = seg_ok
        if not alive.any():
            break
        # diffuse continuation for visualization purposes
        from ..core import warp
        from ..core.math import coordinate_system, to_world
        st, u = rng.next_2d(st)
        wi_l = warp.square_to_cosine_hemisphere(u)
        t_, b_ = coordinate_system(nss)
        d = to_world(t_, b_, nss, wi_l)
        o = pt.spawn_origin(pos, ngs, d)
    return img
