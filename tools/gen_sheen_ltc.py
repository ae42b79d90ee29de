"""Self-fit LTC sheen table (NOT copied from the reference's
ltc_sheen_table.h — same idea, own fit, like tools/gen_srgb2spec.py).

The reference's principled sheen is an LTC lobe (`render_core/material/
principled_bsdf.cpp:17-118`): per (cos_theta_o, alpha) a linearly
transformed cosine with matrix M^-1 = [[a,0,b],[0,a,0],[0,0,1]] plus a
reflectance scale R. Here the table is fitted to the Charlie sheen BRDF
(Estevez-Kulla distribution with the Neubelt-Pettineo visibility term —
the standard production cloth sheen):

    D(h)  = (2 + 1/alpha) sin^(1/alpha)(theta_h) / (2 pi)
    V     = 1 / (4 (cos_o + cos_i - cos_o cos_i))
    f     = D V          (white; tint multiplies outside)

Fit: for each of 32x32 (cos_o, alpha) cells, match the normalized LTC
density to q(wi) = f cos_i / R over a hemisphere quadrature grid with
adam on (log a, b); R is the exact quadrature albedo. wo sits in the x-z
plane (the eval rotates wi to that frame).

Writes vision_tpu/data/sheen_ltc.npz {table: [32, 32, 3] = (a, b, R)}.
"""
import os
import sys

sys.path.insert(0, ".")
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

RES = 32
NT, NP = 48, 96  # hemisphere quadrature


def hemisphere_grid():
    t = (jnp.arange(NT) + 0.5) / NT * (jnp.pi / 2)
    p = (jnp.arange(NP) + 0.5) / NP * (2 * jnp.pi)
    T, P = jnp.meshgrid(t, p, indexing="ij")
    st, ct = jnp.sin(T), jnp.cos(T)
    wi = jnp.stack([st * jnp.cos(P), st * jnp.sin(P), ct], -1)
    dw = st * (jnp.pi / 2 / NT) * (2 * jnp.pi / NP)  # solid angle weights
    return wi.reshape(-1, 3), dw.reshape(-1)


WI, DW = hemisphere_grid()


def charlie_f(cos_o, alpha, wi):
    """Charlie sheen BRDF value for wo=(sin_o,0,cos_o), white tint."""
    sin_o = jnp.sqrt(jnp.maximum(1.0 - cos_o ** 2, 0.0))
    wo = jnp.array([sin_o, 0.0, cos_o])
    ci = wi[..., 2]
    h = wo + wi
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-9)
    sin2h = jnp.clip(1.0 - h[..., 2] ** 2, 1e-9, 1.0)
    inv_a = 1.0 / jnp.clip(alpha, 1e-3, 1.0)
    D = (2.0 + inv_a) * sin2h ** (inv_a * 0.5) / (2.0 * jnp.pi)
    V = 1.0 / (4.0 * jnp.clip(cos_o + ci - cos_o * ci, 1e-6, None))
    return D * V


def ltc_density(a, b, wi):
    """Normalized LTC density: cosine distribution pushed through M."""
    x = a * wi[..., 0] + b * wi[..., 2]
    y = a * wi[..., 1]
    z = wi[..., 2]
    l2 = x * x + y * y + z * z
    ln = jnp.sqrt(l2)
    cz = jnp.clip(z / ln, 0.0, 1.0)
    jac = (a * a) / jnp.maximum(l2 * ln, 1e-12)
    return cz / jnp.pi * jac


def fit_cell(cos_o, alpha, steps=500):
    f = charlie_f(cos_o, alpha, WI)
    ci = jnp.clip(WI[..., 2], 0.0, 1.0)
    R = jnp.sum(f * ci * DW)
    q = f * ci / jnp.maximum(R, 1e-9)

    def loss(p):
        a = jnp.exp(p[0])
        d = ltc_density(a, p[1], WI)
        return jnp.sum((d - q) ** 2 * DW)

    opt = optax.adam(0.05)
    p = jnp.array([0.0, 0.0])
    state = opt.init(p)

    def step(carry, _):
        p, state = carry
        l, g = jax.value_and_grad(loss)(p)
        up, state = opt.update(g, state)
        return (optax.apply_updates(p, up), state), l

    (p, _), ls = jax.lax.scan(step, (p, state), None, length=steps)
    return jnp.array([jnp.exp(p[0]), p[1], R]), ls[-1]


def main():
    cos_os = (np.arange(RES) + 0.5) / RES
    alphas = (np.arange(RES) + 0.5) / RES
    fit = jax.jit(jax.vmap(jax.vmap(fit_cell, (None, 0)), (0, None)))
    table, losses = fit(jnp.asarray(cos_os), jnp.asarray(alphas))
    table = np.asarray(table)
    print("fit done: loss mean", float(np.mean(losses)),
          "max", float(np.max(losses)))
    print("a range", table[..., 0].min(), table[..., 0].max())
    print("b range", table[..., 1].min(), table[..., 1].max())
    print("R range", table[..., 2].min(), table[..., 2].max())
    out = os.path.join("vision_tpu", "data", "sheen_ltc.npz")
    np.savez_compressed(out, table=table.astype(np.float32))
    print("wrote", out)


if __name__ == "__main__":
    main()
