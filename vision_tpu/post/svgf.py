"""SVGF: spatiotemporal variance-guided filtering.

Equivalent of `/root/reference/src/render_core/denoiser/SVGF/` (reproject ->
filter_moments -> N x atrous -> modulate): temporal accumulation with
motion-vector reprojection and surface-similarity validation, luminance
moment tracking for variance, variance-guided edge-stopping a-trous passes.
Operates on demodulated illumination (color / albedo) like the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core.math import luminance, safe_div
from .denoise import atrous_pass


@struct.dataclass
class SVGFState:
    illum: jnp.ndarray     # [H, W, 3] accumulated illumination
    moments: jnp.ndarray   # [H, W, 2] luminance first/second moments
    history: jnp.ndarray   # [H, W] frame count


def init_state(h, w):
    return SVGFState(illum=jnp.zeros((h, w, 3)),
                     moments=jnp.zeros((h, w, 2)),
                     history=jnp.zeros((h, w)))


def _bilinear_reproject(img, motion):
    """Sample img at pixel + motion (backward reprojection)."""
    H, W = img.shape[:2]
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    sx = xx.astype(jnp.float32) + motion[..., 0]
    sy = yy.astype(jnp.float32) + motion[..., 1]
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    fx = (sx - x0)[..., None] if img.ndim == 3 else (sx - x0)
    fy = (sy - y0)[..., None] if img.ndim == 3 else (sy - y0)

    def tap(xi, yi):
        xi = jnp.clip(xi, 0, W - 1)
        yi = jnp.clip(yi, 0, H - 1)
        return img[yi, xi]

    out = (tap(x0, y0) * (1 - fx) * (1 - fy) + tap(x0 + 1, y0) * fx * (1 - fy)
           + tap(x0, y0 + 1) * (1 - fx) * fy + tap(x0 + 1, y0 + 1) * fx * fy)
    in_b = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
    return out, in_b


def svgf_filter(color, albedo, normal, depth, motion, prev_state,
                prev_normal=None, prev_depth=None,
                n_passes=3, alpha=0.05, moments_alpha=0.2,
                history_limit=32.0, sigma_rt=10.0, sigma_normal=128.0):
    """One SVGF frame. All inputs [H, W, ...]. Returns (filtered, new_state).

    Parameters mirror the scene-config knobs (vision_scene.json svgf block:
    N, alpha, moments_alpha, history_limit, sigma_rt, sigma_normal)."""
    H, W = color.shape[:2]
    # demodulate albedo (reference modulator pass)
    illum = safe_div(color, jnp.maximum(albedo, 1e-3))

    # ---- reproject ----
    prev_illum, ok_i = _bilinear_reproject(prev_state.illum, motion)
    prev_mom, _ = _bilinear_reproject(prev_state.moments, motion)
    prev_hist, _ = _bilinear_reproject(prev_state.history[..., None], motion)
    prev_hist = prev_hist[..., 0]
    valid = ok_i
    if prev_normal is not None:
        pn, _ = _bilinear_reproject(prev_normal, motion)
        valid = valid & (jnp.sum(pn * normal, -1) > 0.8)
    if prev_depth is not None:
        pd, _ = _bilinear_reproject(prev_depth[..., None], motion)
        rel = jnp.abs(pd[..., 0] - depth) / jnp.maximum(depth, 1e-3)
        valid = valid & (rel < 0.1)

    hist = jnp.where(valid, jnp.minimum(prev_hist + 1.0, history_limit), 1.0)
    a = jnp.maximum(alpha, 1.0 / hist)[..., None]
    am = jnp.maximum(moments_alpha, 1.0 / hist)[..., None]

    illum_acc = jnp.where(valid[..., None],
                          prev_illum + (illum - prev_illum) * a, illum)
    lum = luminance(illum)
    mom = jnp.stack([lum, lum * lum], -1)
    mom_acc = jnp.where(valid[..., None], prev_mom + (mom - prev_mom) * am, mom)

    # ---- variance ----
    var = jnp.maximum(mom_acc[..., 1] - mom_acc[..., 0] ** 2, 0.0)
    # boost spatial filtering while history is short
    var = var * jnp.maximum(1.0, 4.0 / hist)

    # ---- a-trous passes, variance-guided luminance sigma ----
    out = illum_acc
    sig = safe_div(sigma_rt, jnp.sqrt(var) + 1e-3)
    for p in range(n_passes):
        out = atrous_pass(out, normal, albedo, 1 << p,
                          sigma_rt=jnp.clip(sig, 0.5, 50.0),
                          sigma_normal=sigma_normal)

    filtered = out * jnp.maximum(albedo, 1e-3)  # re-modulate
    new_state = SVGFState(illum=illum_acc, moments=mom_acc, history=hist)
    return filtered, new_state
