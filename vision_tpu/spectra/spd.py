"""Spectral power distributions, CIE data, IOR curves, metal complex IORs.

Equivalent of `/root/reference/src/base/color/{spd,cie}.h` and the IOR data in
`render_core/material/{glass.cpp,metal_ior.inl.h}`. Data tables live in
vision_tpu/data/*.npz (extracted public measurement data).
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

VISIBLE_MIN = 360.0
VISIBLE_MAX = 830.0
CIE_SAMPLES = 471  # 1nm

# sRGB response peak wavelengths (reference spectrum.h:14)
RGB_PEAK_WAVELENGTHS = (602.785, 539.285, 445.772)

_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")
_cie = np.load(os.path.join(_DATA_DIR, "cie.npz"))
_metals = np.load(os.path.join(_DATA_DIR, "metal_ior.npz"))

CIE_X = _cie["X"]
CIE_Y = _cie["Y"]
CIE_Z = _cie["Z"]
CIE_D65 = _cie["D65"]
CIE_Y_INTEGRAL = float(np.sum(CIE_Y))  # ~106.857 * (1nm)

METAL_NAMES = sorted({k[:-4] for k in _metals.files if k.endswith("_eta")})


def spd_eval_host(values, lambdas):
    """Linear-interp eval of a [N]-sample SPD spanning [360, 830] (host)."""
    values = np.asarray(values, np.float64)
    n = len(values)
    lambdas = np.clip(np.asarray(lambdas, np.float64), VISIBLE_MIN, VISIBLE_MAX)
    t = (lambdas - VISIBLE_MIN) / (VISIBLE_MAX - VISIBLE_MIN) * (n - 1)
    i0 = np.clip(np.floor(t).astype(int), 0, n - 1)
    i1 = np.clip(i0 + 1, 0, n - 1)
    w = t - i0
    return values[i0] * (1 - w) + values[i1] * w


def spd_eval(values, lambdas):
    """Device version: values [N] jnp, lambdas [...]."""
    n = values.shape[0]
    lam = jnp.clip(lambdas, VISIBLE_MIN, VISIBLE_MAX)
    t = (lam - VISIBLE_MIN) / (VISIBLE_MAX - VISIBLE_MIN) * (n - 1)
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 1)
    i1 = jnp.clip(i0 + 1, 0, n - 1)
    w = t - i0.astype(jnp.float32)
    return values[i0] * (1.0 - w) + values[i1] * w


def spd_eval_rows(table, rows, lambdas):
    """Per-lane SPD rows: table [N, K], rows [...], lambdas [..., S] -> [..., S]."""
    k = table.shape[1]
    lam = jnp.clip(lambdas, VISIBLE_MIN, VISIBLE_MAX)
    t = (lam - VISIBLE_MIN) / (VISIBLE_MAX - VISIBLE_MIN) * (k - 1)
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, k - 1)
    i1 = jnp.clip(i0 + 1, 0, k - 1)
    w = t - i0.astype(jnp.float32)
    r = rows[..., None]
    return table[r, i0] * (1.0 - w) + table[r, i1] * w


def metal_complex_ior(name):
    """(eta_spd, k_spd) [95]-sample arrays for a named metal; falls back to Ag
    like the reference ComplexIorTable::get_ior."""
    if f"{name}_eta" not in _metals.files:
        name = "Ag"
    return _metals[f"{name}_eta"], _metals[f"{name}_k"]


def metal_ior_rgb(name):
    """Complex IOR at the sRGB peak wavelengths -> (eta[3], k[3])
    (metal.cpp:87-91 non-spectral path)."""
    eta_spd, k_spd = metal_complex_ior(name)
    eta = spd_eval_host(eta_spd, RGB_PEAK_WAVELENGTHS)
    k = spd_eval_host(k_spd, RGB_PEAK_WAVELENGTHS)
    return eta.astype(np.float32), k.astype(np.float32)


# ---------------------------------------------------------------------------
# Dielectric IOR (Sellmeier) curves — glass.cpp BK7/LASF9
# ---------------------------------------------------------------------------

_SELLMEIER = {
    # name: (B1, C1, B2, C2, B3, C3) with lambda in micrometres
    "BK7": (1.03961212, 0.00600069867, 0.231792344, 0.0200179144,
            1.01046945, 103.560653),
    "LASF9": (2.00029547, 0.0121426017, 0.298926886, 0.0538736236,
              1.80691843, 156.530829),
}


def glass_ior(name, lambdas):
    """Sellmeier IOR at wavelengths [nm]; host or device arrays."""
    if name not in _SELLMEIER:
        name = "BK7"
    b1, c1, b2, c2, b3, c3 = _SELLMEIER[name]
    lam = jnp.asarray(lambdas) / 1000.0
    l2 = lam * lam
    f = b1 * l2 / (l2 - c1) + b2 * l2 / (l2 - c2) + b3 * l2 / (l2 - c3)
    return jnp.sqrt(f + 1.0)


def glass_ior_scalar(name):
    """Scalar IOR at the R peak wavelength (glass.cpp:226 RGB-mode path)."""
    return float(glass_ior(name, RGB_PEAK_WAVELENGTHS[0]))


GLASS_NAMES = list(_SELLMEIER.keys())
