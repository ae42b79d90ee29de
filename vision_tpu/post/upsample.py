"""Joint-bilateral upsampling.

Equivalent of `/root/reference/src/render_core/upsampler/bilateral.cpp`:
upscale a low-resolution radiance buffer to full resolution guided by the
full-resolution G-buffer (normal + depth edge-stopping weights).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import safe_div


@jax.jit
def bilateral_upsample(low, normal_hi, depth_hi, sigma_n=32.0, sigma_d=0.1):
    """low [h, w, 3] -> [H, W, 3] where (H, W) = normal_hi.shape[:2].
    4-tap joint-bilinear with guidance weights."""
    H, W = normal_hi.shape[:2]
    h, w = low.shape[:2]
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    fx = (xx + 0.5) / W * w - 0.5
    fy = (yy + 0.5) / H * h - 0.5
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 1)
    dx = fx - x0
    dy = fy - y0

    # low-res guidance (nearest downsample of hi-res guides)
    def down_idx(xi, yi):
        gx = jnp.clip(((xi.astype(jnp.float32) + 0.5) / w * W).astype(jnp.int32), 0, W - 1)
        gy = jnp.clip(((yi.astype(jnp.float32) + 0.5) / h * H).astype(jnp.int32), 0, H - 1)
        return gx, gy

    acc = jnp.zeros((H, W, 3))
    wsum = jnp.zeros((H, W))
    for oy in (0, 1):
        for ox in (0, 1):
            xi = jnp.clip(x0 + ox, 0, w - 1)
            yi = jnp.clip(y0 + oy, 0, h - 1)
            wb = (dx if ox else (1 - dx)) * (dy if oy else (1 - dy))
            gx, gy = down_idx(xi, yi)
            n_l = normal_hi[gy, gx]
            d_l = depth_hi[gy, gx]
            w_n = jnp.power(jnp.clip(jnp.sum(n_l * normal_hi, -1), 0.0, 1.0),
                            sigma_n)
            w_d = jnp.exp(-jnp.abs(d_l - depth_hi)
                          / jnp.maximum(depth_hi * sigma_d, 1e-4))
            wgt = wb * w_n * w_d + 1e-6
            acc = acc + low[yi, xi] * wgt[..., None]
            wsum = wsum + wgt
    return acc / wsum[..., None]
