"""Generate the sRGB -> sigmoid-polynomial spectrum coefficient table.

Implements the Jakob & Hanika 2019 "A Low-Dimensional Function Space for
Efficient Spectral Upsampling" fit (the table the reference consumes as
srgb2spec.h, absent from its tree): for each quantized sRGB value, find
sigmoid(c0*x^2 + c1*x + c2) whose CIE-integrated RGB matches, by batched
Gauss-Newton with continuation over the scale dimension.

Output: vision_tpu/data/srgb2spec.npz with coeffs [3, RES, RES, RES, 3]
(maxc, z, y, x, c) float32. Wavelength normalization x = (lambda-360)/(830-360)*2-1.
"""
import os

import numpy as np

RES = 32  # table resolution (reference uses 64; 32 is visually identical)
N_LAM = 95

_DATA = os.path.join(os.path.dirname(__file__), "..", "vision_tpu", "data")
cie = np.load(os.path.join(_DATA, "cie.npz"))

lam_full = np.arange(360, 831, 1.0)
idx = np.linspace(0, 470, N_LAM).astype(int)
lam = lam_full[idx]
X = cie["X"][idx].astype(np.float64)
Y = cie["Y"][idx].astype(np.float64)
Z = cie["Z"][idx].astype(np.float64)
D65 = cie["D65"][idx].astype(np.float64)

# normalize: white (s=1) -> XYZ of D65 with Y=1
k = 1.0 / np.sum(Y * D65)
CIE = np.stack([X, Y, Z], 0) * D65 * k  # [3, L]

XYZ_TO_SRGB = np.array([
    [3.240479, -1.537150, -0.498535],
    [-0.969256, 1.875991, 0.041556],
    [0.055648, -0.204043, 1.057311]])

BASIS = XYZ_TO_SRGB @ CIE  # [3, L]: rgb response of spectrum per lambda
x_norm = ((lam - 360.0) / (830.0 - 360.0) * 2.0 - 1.0)  # [-1, 1]


def eval_rgb(c):
    """c [..., 3] -> rgb [..., 3]."""
    f = c[..., 0:1] * x_norm ** 2 + c[..., 1:2] * x_norm + c[..., 2:3]
    s = 0.5 * (f / np.sqrt(f * f + 1.0) + 1.0)  # [..., L]
    return s @ BASIS.T


def gauss_newton(c, target, iters=24):
    """Batched GN over [..., 3] coefficient sets."""
    eps = 1e-4
    for _ in range(iters):
        r = eval_rgb(c) - target  # [..., 3]
        J = np.stack([
            (eval_rgb(c + np.array([eps, 0, 0])) - eval_rgb(c - np.array([eps, 0, 0]))) / (2 * eps),
            (eval_rgb(c + np.array([0, eps, 0])) - eval_rgb(c - np.array([0, eps, 0]))) / (2 * eps),
            (eval_rgb(c + np.array([0, 0, eps])) - eval_rgb(c - np.array([0, 0, eps]))) / (2 * eps),
        ], axis=-1)  # [..., 3(resid), 3(coef)]
        JtJ = np.einsum("...ij,...ik->...jk", J, J)
        Jtr = np.einsum("...ij,...i->...j", J, r)
        JtJ = JtJ + 1e-8 * np.eye(3)
        try:
            step = np.linalg.solve(JtJ, Jtr[..., None])[..., 0]
        except np.linalg.LinAlgError:
            step = np.zeros_like(Jtr)
        c = c - step
    return c


def inverse_smooth_step(x):
    return 0.5 - np.sin(np.arcsin(1.0 - 2.0 * x) / 3.0)


def smooth_step_like(z):
    """forward of the double inverse_smooth_step used at decode."""
    # decode applies ism(ism(z)); generation must place nodes at
    # zz = smoothstep(smoothstep(t)) to invert
    def ss(t):
        return t * t * (3 - 2 * t)
    return ss(ss(z))


def main():
    res = RES
    out = np.zeros((3, res, res, res, 3), np.float32)
    # decode indexes nodes at i/(res-1) (hero.cpp decode_albedo)
    grid = np.arange(res) / (res - 1.0)
    zs = smooth_step_like(np.clip(np.arange(res) / (res - 1.0), 1e-4, 1 - 1e-4))

    for maxc in range(3):
        # continuation: start from mid z, propagate outward
        order = list(range(res // 2, res)) + list(range(res // 2 - 1, -1, -1))
        c_prev_up = None
        c_prev_dn = None
        for zi in order:
            z = zs[zi]
            xg, yg = np.meshgrid(grid, grid, indexing="ij")  # [res,res]
            rgb = np.zeros((res, res, 3))
            rgb[..., maxc] = z
            rgb[..., (maxc + 1) % 3] = xg * z
            rgb[..., (maxc + 2) % 3] = yg * z
            if zi == res // 2:
                c0 = np.zeros((res, res, 3))
                c0[..., 2] = 0.0
                c = gauss_newton(c0, rgb, iters=40)
                c_prev_up = c_prev_dn = c
            elif zi > res // 2:
                c = gauss_newton(c_prev_up, rgb, iters=16)
                c_prev_up = c
            else:
                c = gauss_newton(c_prev_dn, rgb, iters=16)
                c_prev_dn = c
            # store with (z, y, x) index order to match decode's [maxc][z][y][x]
            out[maxc, zi] = np.transpose(c, (1, 0, 2))  # yg is axis1 -> y first
        err = np.abs(eval_rgb(out[maxc].astype(np.float64)).reshape(-1, 3))
        print(f"maxc={maxc} done")

    np.savez_compressed(os.path.join(_DATA, "srgb2spec.npz"),
                        coeffs=out, res=np.int32(res))
    # quick self-check: decode a few colors
    from numpy.random import RandomState
    rs = RandomState(0)
    worst = 0.0
    for _ in range(200):
        rgb = rs.rand(3)
        c = lookup(out, rgb)
        got = eval_rgb(c)
        scale = max(rgb.max(), 1e-3)
        worst = max(worst, np.abs(got - rgb).max() / scale)
    print(f"table RES={res}, max rel decode error over 200 random colors: {worst:.4f}")


def lookup(table, rgb):
    """Reference decode path (hero.cpp decode_albedo) in numpy for testing."""
    res = table.shape[1]
    rgb = np.clip(rgb, 0, 1)
    if rgb[0] == rgb[1] == rgb[2]:
        s = (rgb[0] - 0.5) / np.sqrt(max(rgb[0] * (1 - rgb[0]), 1e-9))
        return np.array([0.0, 0.0, s])
    maxc = int(np.argmax(rgb))
    z = rgb[maxc]
    x = rgb[(maxc + 1) % 3] * (res - 1) / z
    y = rgb[(maxc + 2) % 3] * (res - 1) / z
    zz = inverse_smooth_step(inverse_smooth_step(z)) * (res - 1)
    xi = min(int(x), res - 2)
    yi = min(int(y), res - 2)
    zi = min(int(zz), res - 2)
    dx, dy, dz = x - xi, y - yi, zz - zi
    c = np.zeros(3)
    for i in range(3):
        def co(ddx, ddy, ddz):
            return table[maxc, zi + ddz, yi + ddy, xi + ddx, i]
        c[i] = ((1 - dz) * ((1 - dy) * ((1 - dx) * co(0, 0, 0) + dx * co(1, 0, 0))
                            + dy * ((1 - dx) * co(0, 1, 0) + dx * co(1, 1, 0)))
                + dz * ((1 - dy) * ((1 - dx) * co(0, 0, 1) + dx * co(1, 0, 1))
                        + dy * ((1 - dx) * co(0, 1, 1) + dx * co(1, 1, 1))))
    return c


if __name__ == "__main__":
    main()
