"""GGX / Beckmann microfacet distribution (vectorized, local shading frame).

Equivalent of `/root/reference/src/base/scattering/microfacet.h` (PBRT-style):
  roughness -> alpha = roughness^2 (roughness_to_alpha)
  D, Smith Lambda/G1/G, visible-normal sampling (GGX), pdf_wh,
  reflection/transmission jacobians.
All directions are unit vectors in the local frame (z = shading normal).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math import (InvPi, Pi, TwoPi, abs_cos_theta, cos2_theta, cos_phi,
                         cos_theta, dot, dotv, normalize, safe_div, safe_sqrt,
                         sin_phi, sin2_theta, sqr, tan2_theta, vec3)


def roughness_to_alpha(roughness):
    return sqr(roughness)


def calculate_alpha(alpha, anisotropic):
    """Split scalar alpha into (ax, ay) by anisotropy in [-1, 1]
    (microfacet.h calculate_alpha)."""
    ax = jnp.where(anisotropic < 0.0, alpha / (1.0 + anisotropic), alpha * (1.0 - anisotropic))
    ay = jnp.where(anisotropic < 0.0, alpha * (1.0 + anisotropic), alpha / (1.0 - anisotropic))
    iso = jnp.abs(anisotropic) <= 1e-4
    return jnp.where(iso, alpha, ax), jnp.where(iso, alpha, ay)


def D_ggx(wh, ax, ay):
    t2 = tan2_theta(wh)
    c4 = sqr(cos2_theta(wh))
    e = (sqr(cos_phi(wh) / ax) + sqr(sin_phi(wh) / ay)) * t2
    d = safe_div(1.0, Pi * ax * ay * c4 * sqr(1.0 + e))
    return jnp.where(jnp.isfinite(t2) & (c4 > 1e-16), d, 0.0)


def D_beckmann(wh, ax, ay):
    t2 = tan2_theta(wh)
    c4 = sqr(cos2_theta(wh))
    e = jnp.exp(-t2 * (sqr(cos_phi(wh)) / sqr(ax) + sqr(sin_phi(wh)) / sqr(ay)))
    d = safe_div(e, Pi * ax * ay * c4)
    return jnp.where(jnp.isfinite(t2) & (c4 > 1e-16), d, 0.0)


def lambda_ggx(w, ax, ay):
    t2 = tan2_theta(w)
    a2 = sqr(cos_phi(w) * ax) + sqr(sin_phi(w) * ay)
    lam = 0.5 * (-1.0 + jnp.sqrt(1.0 + a2 * t2))
    return jnp.where(jnp.isfinite(t2), lam, 0.0)


def G1_ggx(w, ax, ay):
    return 1.0 / (1.0 + lambda_ggx(w, ax, ay))


def G_ggx(wo, wi, ax, ay):
    return 1.0 / (1.0 + lambda_ggx(wo, ax, ay) + lambda_ggx(wi, ax, ay))


def sample_wh_ggx(wo, u, ax, ay):
    """Visible-normal GGX sampling (Heitz 2018), matching the reference
    GGXMicrofacet (sample_visible=true)."""
    sign = jnp.sign(cos_theta(wo))
    sign = jnp.where(sign == 0.0, 1.0, sign)
    wo_f = wo * sign[..., None]  # flip to upper hemisphere
    # stretch
    vh = normalize(vec3(ax * wo_f[..., 0], ay * wo_f[..., 1], wo_f[..., 2]))
    # orthonormal basis around vh
    lensq = sqr(vh[..., 0]) + sqr(vh[..., 1])
    t1 = jnp.where(
        (lensq > 1e-9)[..., None],
        vec3(-vh[..., 1], vh[..., 0], jnp.zeros_like(lensq)) /
        jnp.sqrt(jnp.maximum(lensq, 1e-9))[..., None],
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), vh.shape),
    )
    t2v = jnp.cross(vh, t1)
    # parameterize projected area
    r = jnp.sqrt(u[..., 0])
    phi = TwoPi * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * safe_sqrt(1.0 - sqr(p1)) + s * p2
    pz = safe_sqrt(1.0 - sqr(p1) - sqr(p2))
    nh = p1[..., None] * t1 + p2[..., None] * t2v + pz[..., None] * vh
    # unstretch
    wh = normalize(vec3(ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(1e-6, nh[..., 2])))
    return wh * sign[..., None]


def pdf_wh_ggx(wo, wh, ax, ay):
    """Visible-normal pdf: D(wh) G1(wo) |wo.wh| / |cos(wo)|."""
    return safe_div(D_ggx(wh, ax, ay) * G1_ggx(wo, ax, ay) * jnp.abs(dot(wo, wh)),
                    abs_cos_theta(wo))


def pdf_wi_reflection(pdf_wh, wo, wh):
    """dwh/dwi jacobian for reflection: pdf_wh / (4 |wo.wh|)."""
    return safe_div(pdf_wh, 4.0 * jnp.abs(dot(wo, wh)))


def pdf_wi_transmission(pdf_wh, wo, wh, wi, eta):
    """Transmission jacobian, eta = eta_transmitted/eta_incident seen from wo
    (wh = normalize(wo + wi*eta)): dwh/dwi = eta^2 |wi.wh| / (wo.wh + eta wi.wh)^2.

    Note: the reference's microfacet.h drops the eta^2 factor in BOTH f and
    the pdf (they cancel in f/pdf); we keep the physically-consistent forms so
    MIS against light pdfs is exact (verified by the glass furnace test)."""
    denom = sqr(dot(wi, wh) * eta + dot(wo, wh))
    return safe_div(pdf_wh * sqr(eta) * jnp.abs(dot(wi, wh)), denom)


def brdf_div_fr(wo, wh, wi, ax, ay):
    """D*G/(4 cos_o cos_i) — the microfacet BRDF without Fresnel."""
    return safe_div(D_ggx(wh, ax, ay) * G_ggx(wo, wi, ax, ay),
                    jnp.abs(4.0 * cos_theta(wo) * cos_theta(wi)))


def btdf_div_ft(wo, wh, wi, eta, ax, ay, radiance_mode=True):
    """Microfacet BTDF without Fresnel; eta = eta_t/eta_i seen from wo,
    wh = normalize(wo + wi*eta).

    ft = D G eta^2 |wi.wh| |wo.wh| / (|cos_i cos_o| (wo.wh + eta wi.wh)^2),
    times 1/eta^2 in radiance transport (solid-angle compression) — which
    cancels the eta^2, leaving the radiance-mode form below.
    """
    denom = sqr(dot(wi, wh) * eta + dot(wo, wh))
    f = safe_div(
        D_ggx(wh, ax, ay) * G_ggx(wo, wi, ax, ay)
        * jnp.abs(dot(wi, wh)) * jnp.abs(dot(wo, wh)),
        jnp.abs(cos_theta(wi) * cos_theta(wo)) * denom)
    if not radiance_mode:
        f = f * sqr(eta)
    return f
