"""Fresnel variants, vectorized over a trailing spectral axis.

Equivalent of `/root/reference/src/base/scattering/fresnel.h` +
`/root/reference/src/math/optics.h`: Schlick, exact dielectric, complex
conductor, F82-tint (Kulla-Conty metallic), constant. Colors/spectra have a
trailing S axis (S=3 for sRGB mode, S=n_lambda for hero mode).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math import lerp, safe_sqrt, sqr

# fresnel mode ids used in the material table
FR_DIELECTRIC = 0
FR_CONDUCTOR = 1
FR_SCHLICK = 2
FR_CONSTANT = 3
FR_F82 = 4


def schlick_weight(cos_theta):
    m = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    return sqr(sqr(m)) * m


def fresnel_schlick(F0, cos_theta):
    """F0 [..., S], cos_theta [...]."""
    return lerp(schlick_weight(cos_theta)[..., None], F0, jnp.ones_like(F0))


def schlick_F0_from_ior(ior):
    return sqr((ior - 1.0) / (ior + 1.0))


def schlick_ior_from_F0(f0):
    s = jnp.sqrt(jnp.clip(f0, 0.0, 0.99))
    return (1.0 + s) / (1.0 - s)


def fresnel_dielectric(abs_cos_theta_i, eta):
    """Exact unpolarized dielectric Fresnel (optics.h fresnel_dielectric_impl).
    eta is the relative IOR of the transmitted side over incident side."""
    sin2_i = 1.0 - sqr(abs_cos_theta_i)
    sin2_t = sin2_i / sqr(eta)
    cos_t = safe_sqrt(1.0 - sin2_t)
    r_parl = (eta * abs_cos_theta_i - cos_t) / (eta * abs_cos_theta_i + cos_t)
    r_perp = (abs_cos_theta_i - eta * cos_t) / (abs_cos_theta_i + eta * cos_t)
    return jnp.where(sin2_t >= 1.0, 1.0, 0.5 * (sqr(r_parl) + sqr(r_perp)))


def fresnel_complex(cos_theta_i, eta, k):
    """Conductor Fresnel with complex IOR eta - i k (optics.h fresnel_complex).
    Broadcasts over trailing spectral axis of eta/k."""
    cos_theta_i = jnp.clip(cos_theta_i, 0.0, 1.0)
    sin2 = 1.0 - sqr(cos_theta_i)
    er = eta
    ei = k
    # complex arithmetic with (re, im) pairs
    e2r = sqr(er) - sqr(ei)          # eta^2 real
    e2i = 2.0 * er * ei              # eta^2 imag
    # sin2_t = sin2 / eta^2
    d = sqr(e2r) + sqr(e2i)
    d = jnp.maximum(d, 1e-20)
    str_ = sin2 * e2r / d
    sti = -sin2 * e2i / d
    # cos_t = sqrt(1 - sin2_t)
    cr = 1.0 - str_
    ci = -sti
    # complex sqrt
    r = jnp.sqrt(jnp.maximum(sqr(cr) + sqr(ci), 1e-20))
    ctr = jnp.sqrt(jnp.maximum((r + cr) * 0.5, 1e-20))
    cti = jnp.sign(ci) * jnp.sqrt(jnp.maximum((r - cr) * 0.5, 1e-20))
    # r_parl = (eta*ci - ct) / (eta*ci + ct)
    num_r = er * cos_theta_i - ctr
    num_i = ei * cos_theta_i - cti
    den_r = er * cos_theta_i + ctr
    den_i = ei * cos_theta_i + cti
    den = jnp.maximum(sqr(den_r) + sqr(den_i), 1e-20)
    rp2 = (sqr(num_r) + sqr(num_i)) / den
    # r_perp = (ci - eta*ct) / (ci + eta*ct)
    num2_r = cos_theta_i - (er * ctr - ei * cti)
    num2_i = -(er * cti + ei * ctr)
    den2_r = cos_theta_i + (er * ctr - ei * cti)
    den2_i = (er * cti + ei * ctr)
    den2 = jnp.maximum(sqr(den2_r) + sqr(den2_i), 1e-20)
    rs2 = (sqr(num2_r) + sqr(num2_i)) / den2
    return 0.5 * (rp2 + rs2)


def fresnel_f82(cos_theta, F0, b):
    """Kulla-Conty F82-tint metallic Fresnel: schlick plus an edge-tint
    correction term peaking at cos = 1/7 (reference FresnelF82Tint)."""
    m = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    m5 = sqr(sqr(m)) * m
    schlick = F0 + (1.0 - F0) * m5[..., None]
    return schlick - b * (cos_theta * m5 * m)[..., None]


def f82_b_from_edge_tint(F0, edge_tint):
    """Precompute the correction coefficient b from F82 (edge tint at
    cos = 1/7): b = (white_schlick(1/7) * F0-mix - F82) * 7^6/ (6/7 * (6/7)^5)."""
    cos_82 = 1.0 / 7.0
    m = 1.0 - cos_82
    m5 = m ** 5
    schlick_at = F0 + (1.0 - F0) * m5
    denom = cos_82 * m5 * m
    return (schlick_at - edge_tint * schlick_at) / denom
