"""Denoisers (pure JAX).

Replaces the reference denoiser plugins (`/root/reference/src/render_core/
denoiser/`): an edge-aware a-trous wavelet filter (the SVGF spatial core,
SVGF/svgf.h) guided by auxiliary feature buffers, plus a simple
luminance-bilateral fallback when no AOVs are available. The OIDN external
dependency is intentionally not replicated — filtering runs on-chip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import luminance


# numpy (not jnp): jit stages closed-over device arrays as tracers, and
# these weights fold into python floats at trace time
_ATROUS_KERNEL = [1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16]


def _shift2d(img, dy, dx):
    return jnp.roll(img, (dy, dx), axis=(0, 1))


def atrous_pass(color, normal, albedo, step, sigma_rt=10.0, sigma_normal=128.0,
                sigma_albedo=8.0):
    """One a-trous iteration with edge-stopping weights (SVGF atrous pass)."""
    lum_c = luminance(color)
    acc = jnp.zeros_like(color)
    wsum = jnp.zeros(color.shape[:2])
    for j in range(5):
        for i in range(5):
            dy = (j - 2) * step
            dx = (i - 2) * step
            k = float(_ATROUS_KERNEL[j] * _ATROUS_KERNEL[i])
            c = _shift2d(color, dy, dx)
            n = _shift2d(normal, dy, dx)
            a = _shift2d(albedo, dy, dx)
            w_n = jnp.power(jnp.clip(jnp.sum(n * normal, -1), 0.0, 1.0),
                            sigma_normal)
            w_l = jnp.exp(-jnp.abs(luminance(c) - lum_c) * sigma_rt)
            w_a = jnp.exp(-jnp.sum(jnp.abs(a - albedo), -1) * sigma_albedo)
            w = k * w_n * w_l * w_a
            acc = acc + c * w[..., None]
            wsum = wsum + w
    return acc / jnp.maximum(wsum, 1e-8)[..., None]


@jax.jit
def denoise_aov(color, normal, albedo, n_passes=3):
    """SVGF-style spatial filtering guided by first-bounce normal+albedo."""
    out = color
    for p in range(n_passes):
        out = atrous_pass(out, normal, albedo, 1 << p)
    return out


@jax.jit
def denoise_simple(color, n_passes=2, sigma=8.0):
    """Feature-free bilateral fallback."""
    normal = jnp.zeros_like(color)
    out = color
    for p in range(n_passes):
        out = atrous_pass(out, normal, color, 1 << p, sigma_rt=sigma,
                          sigma_normal=0.0, sigma_albedo=2.0)
    return out
