"""Vector math over trailing-dim-3 jnp arrays.

TPU-native replacement for the reference's ocarina math layer
(`/root/reference/src/math/util.h`, `basic_types.h` usage): instead of
`Float3` DSL values per-thread, every op here is vectorized over an
arbitrary leading batch shape with a trailing component axis, so XLA maps
it straight onto the VPU (8x128 lanes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Pi = 3.14159265358979323846
InvPi = 1.0 / Pi
Inv2Pi = 1.0 / (2.0 * Pi)
Inv4Pi = 1.0 / (4.0 * Pi)
TwoPi = 2.0 * Pi
PiOver2 = Pi / 2.0
PiOver4 = Pi / 4.0
OneMinusEpsilon = float(jnp.float32(1.0) - jnp.finfo(jnp.float32).eps / 2)
RayEps = 1e-4  # ray spawn offset scale (reference: interaction.h ray_offset_factor)


def vec3(x, y, z, dtype=jnp.float32):
    return jnp.stack([jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)], axis=-1)


def splat3(s):
    s = jnp.asarray(s, jnp.float32)
    return jnp.broadcast_to(s[..., None], s.shape + (3,))


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def dotv(a, b):
    """dot with kept trailing axis (for broadcasting against vectors)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length_squared(a):
    return dot(a, a)


def length(a):
    return jnp.sqrt(length_squared(a))


def normalize(a, eps=1e-20):
    return a * jax.lax.rsqrt(jnp.maximum(length_squared(a), eps))[..., None]


def distance(a, b):
    return length(a - b)


def sqr(x):
    return x * x


def safe_sqrt(x):
    # 1e-20 floor (not 0): sqrt'(0) = inf poisons reverse-mode cotangents
    # through unselected jnp.where branches (0 * inf = NaN)
    return jnp.sqrt(jnp.maximum(x, 1e-20))


def safe_div(a, b, eps=0.0):
    """a/b with 0 where b == 0 (renderer convention for degenerate pdfs)."""
    return jnp.where(b != 0.0, a / jnp.where(b != 0.0, b, 1.0), eps)


def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def lerp(t, a, b):
    return a + t * (b - a)


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def sign_of(x):
    return jnp.where(x >= 0.0, 1.0, -1.0)


def luminance(rgb):
    """Rec.709 luminance of linear RGB (reference: ocarina color utils)."""
    return rgb[..., 0] * 0.212671 + rgb[..., 1] * 0.715160 + rgb[..., 2] * 0.072169


def face_forward(v, ref):
    """Flip v so it lies in the hemisphere of ref."""
    return jnp.where(dotv(v, ref) < 0.0, -v, v)


def reflect(wo, n):
    """Mirror reflection; matches `/root/reference/src/math/optics.h` reflect:
    -wo + 2*dot(wo,n)*n (wo pointing away from surface)."""
    return -wo + 2.0 * dotv(wo, n) * n


def refract(wi, n, eta):
    """Refraction of wi about n with relative IOR eta (= ior_t/ior_i as used by
    the reference `optics.h` refract: wt = -wi/eta + (cos_i/eta - cos_t)*n).

    Returns (valid, wt). wi points away from surface, n on the wi side.
    """
    cos_theta_i = dot(n, wi)
    sin2_theta_i = jnp.maximum(0.0, 1.0 - sqr(cos_theta_i))
    sin2_theta_t = sin2_theta_i / sqr(eta)
    valid = sin2_theta_t < 1.0
    cos_theta_t = safe_sqrt(1.0 - sin2_theta_t)
    wt = -wi / eta[..., None] + (cos_theta_i / eta - cos_theta_t)[..., None] * n
    return valid, wt


def spherical_direction(sin_theta, cos_theta, phi):
    return vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)


def spherical_theta(v):
    return safe_acos(v[..., 2])


def spherical_phi(v):
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0.0, p + TwoPi, p)


# ----------------------------------------------------------------------------
# Orthonormal frames (shading coordinate systems)
# ----------------------------------------------------------------------------

def coordinate_system(n):
    """Build (t, b) orthonormal to unit n. Duff et al. branchless ONB."""
    s = sign_of(n[..., 2])
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = vec3(1.0 + s * sqr(n[..., 0]) * a, s * b, -s * n[..., 0])
    bt = vec3(b, s + sqr(n[..., 1]) * a, -n[..., 1])
    return t, bt


def to_local(t, b, n, v):
    """World -> local (z = n)."""
    return vec3(dot(v, t), dot(v, b), dot(v, n))


def to_world(t, b, n, v):
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


# local-frame trig helpers (z-up shading space, PBRT convention; the reference
# uses the same convention in scattering/bxdf.h)

def cos_theta(w):
    return w[..., 2]


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def cos2_theta(w):
    return sqr(w[..., 2])


def sin2_theta(w):
    return jnp.maximum(0.0, 1.0 - cos2_theta(w))


def sin_theta(w):
    return jnp.sqrt(sin2_theta(w))


def tan_theta(w):
    return safe_div(sin_theta(w), cos_theta(w))


def tan2_theta(w):
    return safe_div(sin2_theta(w), cos2_theta(w))


def cos_phi(w):
    st = sin_theta(w)
    return jnp.where(st == 0.0, 1.0, jnp.clip(w[..., 0] / jnp.where(st == 0.0, 1.0, st), -1.0, 1.0))


def sin_phi(w):
    st = sin_theta(w)
    return jnp.where(st == 0.0, 0.0, jnp.clip(w[..., 1] / jnp.where(st == 0.0, 1.0, st), -1.0, 1.0))


def same_hemisphere(a, b):
    return a[..., 2] * b[..., 2] > 0.0
