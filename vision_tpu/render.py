"""High-level rendering driver.

Replaces the reference app/pipeline frame loop (`/root/reference/src/base/mgr/
pipeline.cpp display/render`): jit-compiled sample passes accumulated into a
running-average film, then tonemap + gamma for output.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from .integrator import pt
from .sensor import film


@functools.partial(jax.jit, static_argnames=("max_depth", "min_depth"))
def _render_pass(scene_data, camera, filt, frame_index, max_depth, min_depth,
                 rr_threshold):
    img, aovs = pt.render_sample(scene_data, camera, filt, frame_index,
                                 max_depth=max_depth, min_depth=min_depth,
                                 rr_threshold=rr_threshold)
    return img, aovs


def render(scene, spp=None, verbose=False):
    """Render `spp` samples (defaults to scene output spp or 64).
    Returns linear HDR image [H, W, 3] (numpy)."""
    spp = spp or scene.output_spp or 64
    accum = None
    t0 = time.time()
    for frame in range(spp):
        img, _ = _render_pass(scene.data, scene.camera, scene.filter,
                              jnp.uint32(frame), scene.max_depth,
                              scene.min_depth,
                              jnp.float32(scene.rr_threshold))
        if accum is None:
            accum = img
        else:
            accum = film.accumulate(accum, img, jnp.float32(frame))
        if verbose and (frame + 1) % 16 == 0:
            accum.block_until_ready()
            dt = time.time() - t0
            print(f"  spp {frame + 1}/{spp}  ({dt:.2f}s, "
                  f"{(frame + 1) / dt:.2f} spp/s)")
    accum.block_until_ready()
    return np.asarray(accum)


def postprocess(scene, hdr):
    """tonemap + gamma -> display image [H, W, 3] in [0,1]."""
    x = jnp.asarray(hdr)
    x = film.tonemap(x, scene.tone_mapper, scene.exposure)
    x = film.linear_to_srgb(x)
    return np.asarray(x)


def render_to_file(scene_path, out_path=None, spp=None, verbose=True):
    from .scene.scene import load_scene
    scene = load_scene(scene_path)
    hdr = render(scene, spp=spp, verbose=verbose)
    img = postprocess(scene, hdr)
    out = out_path or scene.output_fn
    if out.endswith(".exr"):
        film.to_exr(hdr, out)
    else:
        film.to_png(img, out)
    return out
