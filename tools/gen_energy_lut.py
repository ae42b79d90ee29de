"""Precompute the GGX directional-albedo LUT for energy compensation.

Equivalent of the reference's `precompute` app + Material::precompute_lobe
(`/root/reference/src/apps/precompute/main.cpp:24-46`,
`base/scattering/material.h:121-163`: grid-dispatch kernel integrating lobe
albedo per cell): E(alpha, mu_o) = single-scatter GGX albedo with F=1,
estimated by VNDF-sampled Monte Carlo. Output drives the Kulla-Conty
multiple-scattering compensation lobe (MirrorLobe::compensate,
PureReflectionLobe LUT).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

N_ALPHA = 32
N_MU = 32
N_SAMPLES = 1 << 15


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from vision_tpu.core import rng
    from vision_tpu.core.math import normalize, vec3, reflect
    from vision_tpu.shading import microfacet as mf

    alphas = np.linspace(0.0, 1.0, N_ALPHA) ** 2  # denser at low alpha
    alphas = np.maximum(alphas, 1e-4)
    mus = np.maximum(np.linspace(0.0, 1.0, N_MU), 0.02)

    E = np.zeros((N_ALPHA, N_MU), np.float32)

    @jax.jit
    def estimate(alpha, mu):
        n = N_SAMPLES
        st = rng.seed(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(7))
        st, u2 = rng.next_2d(st)
        so = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
        wo = jnp.broadcast_to(normalize(vec3(so, 0.0, mu)), (n, 3))
        a = jnp.full((n,), alpha)
        wh = mf.sample_wh_ggx(wo, u2, a, a)
        wi = reflect(wo, wh)
        pdf = mf.pdf_wi_reflection(mf.pdf_wh_ggx(wo, wh, a, a), wo, wh)
        fr = mf.brdf_div_fr(wo, wh, wi, a, a)
        ok = (wi[..., 2] > 0.0) & (pdf > 1e-9)
        est = jnp.where(ok, fr * jnp.abs(wi[..., 2]) / jnp.maximum(pdf, 1e-9),
                        0.0)
        return jnp.mean(est)

    for i, a in enumerate(alphas):
        for j, m in enumerate(mus):
            E[i, j] = float(estimate(jnp.float32(a), jnp.float32(m)))

    E = np.clip(E, 0.0, 1.0)
    # E_avg(alpha) = 2 * int E(mu) mu dmu
    mu_grid = mus
    E_avg = 2.0 * np.trapezoid(E * mu_grid[None, :], mu_grid, axis=1)
    E_avg = np.clip(E_avg, 1e-3, 1.0)

    out = os.path.join(os.path.dirname(__file__), "..", "vision_tpu", "data",
                       "ggx_energy.npz")
    np.savez(out, E=E.astype(np.float32), E_avg=E_avg.astype(np.float32),
             alphas=alphas.astype(np.float32), mus=mus.astype(np.float32))
    print(f"E range [{E.min():.3f}, {E.max():.3f}]; "
          f"E(a=1, mu=0.5) = {E[-1, N_MU // 2]:.3f}")


if __name__ == "__main__":
    main()
