"""Sampling warps + MIS heuristics.

Vectorized equivalents of `/root/reference/src/math/warp.h`. All functions
take uniform samples with a trailing component axis and map over arbitrary
leading batch shapes.
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import (InvPi, Inv2Pi, Inv4Pi, Pi, TwoPi, OneMinusEpsilon,
                   lerp, safe_sqrt, sqr, vec3, dot, length_squared, normalize)


def square_to_disk(u):
    """Polar disk warp (warp.h square_to_disk_impl)."""
    r = jnp.sqrt(u[..., 0])
    theta = TwoPi * u[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def square_to_disk_concentric(u):
    """Shirley-Chiu concentric mapping (lower distortion; used for lens)."""
    uo = 2.0 * u - 1.0
    x, y = uo[..., 0], uo[..., 1]
    cond = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(cond, x, y)
    theta = jnp.where(
        cond,
        (Pi / 4.0) * jnp.where(x != 0.0, y / jnp.where(x != 0.0, x, 1.0), 0.0),
        (Pi / 2.0) - (Pi / 4.0) * jnp.where(y != 0.0, x / jnp.where(y != 0.0, y, 1.0), 0.0),
    )
    zero = (x == 0.0) & (y == 0.0)
    out = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    return jnp.where(zero[..., None], 0.0, out)


def uniform_disk_pdf():
    return InvPi


def square_to_cosine_hemisphere(u):
    d = square_to_disk(u)
    z = safe_sqrt(1.0 - d[..., 0] ** 2 - d[..., 1] ** 2)
    return vec3(d[..., 0], d[..., 1], z)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * InvPi


def square_to_cone(u, cos_theta_max):
    cos_theta = (1.0 - u[..., 0]) + u[..., 0] * cos_theta_max
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = TwoPi * u[..., 1]
    return vec3(jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta)


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (TwoPi * (1.0 - cos_theta_max))


def square_to_triangle(u):
    """Barycentric warp (warp.h square_to_triangle_impl): returns (b0, b1)."""
    su0 = jnp.sqrt(u[..., 0])
    return jnp.stack([1.0 - su0, u[..., 1] * su0], axis=-1)


def square_to_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = TwoPi * u[..., 1]
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def uniform_sphere_pdf():
    return Inv4Pi


def square_to_hemisphere(u):
    z = u[..., 0]
    tmp = safe_sqrt(1.0 - z * z)
    phi = TwoPi * u[..., 1]
    return vec3(jnp.cos(phi) * tmp, jnp.sin(phi) * tmp, z)


def uniform_hemisphere_pdf():
    return Inv2Pi


def pdf_wi_from_point(pdf_point, normal, wo_un):
    """Solid-angle pdf from area pdf: pdf_point * r^2 / cos (warp.h PDF_wi)."""
    cos_t = jnp.abs(dot(normal, normalize(wo_un)))
    return jnp.where(cos_t > 0.0,
                     pdf_point * length_squared(wo_un) / jnp.where(cos_t > 0.0, cos_t, 1.0),
                     0.0)


def pdf_point_from_wi(pdf_wi, normal, wo_un):
    cos_t = jnp.abs(dot(normal, normalize(wo_un)))
    l2 = length_squared(wo_un)
    return jnp.where(l2 > 0.0, pdf_wi * cos_t / jnp.where(l2 > 0.0, l2, 1.0), 0.0)


def sample_linear(u, a, b):
    """Sample x in [0,1] proportional to lerp(x, a, b) (warp.h sample_linear)."""
    denom = a + jnp.sqrt(lerp(u, sqr(a), sqr(b)))
    x = jnp.where(denom > 0.0, u * (a + b) / jnp.where(denom > 0.0, denom, 1.0), 0.0)
    return jnp.minimum(x, OneMinusEpsilon)


def linear_pdf(x, a, b):
    ret = 2.0 * lerp(x, a, b) / (a + b)
    return jnp.where((x < 0.0) | (x > 1.0), 0.0, ret)


def sample_tent(u, r):
    """Tent-filter inverse-CDF sample in [-r, r] (warp.h sample_tent)."""
    return jnp.where(u < 0.5,
                     -r * sample_linear((0.5 - u) * 2.0, 1.0, 0.0),
                     r * sample_linear((u - 0.5) * 2.0, 1.0, 0.0))


def balance_heuristic(f_pdf, g_pdf, nf=1, ng=1):
    f = nf * f_pdf
    g = ng * g_pdf
    s = f + g
    return jnp.where(s > 0.0, f / jnp.where(s > 0.0, s, 1.0), 0.0)


def power_heuristic(f_pdf, g_pdf, nf=1, ng=1):
    f = nf * f_pdf
    g = ng * g_pdf
    s = f * f + g * g
    return jnp.where(s > 0.0, f * f / jnp.where(s > 0.0, s, 1.0), 0.0)


def mis_weight(f_pdf, g_pdf):
    """The reference default MIS weight is the balance heuristic
    (warp.h MIS_weight_impl -> balance_heuristic)."""
    return balance_heuristic(f_pdf, g_pdf)
