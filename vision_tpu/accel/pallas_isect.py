"""Pallas TPU kernel: dense ray/triangle intersection sweep.

The speed-of-light path for small scenes (all triangles VMEM-resident, every
triangle tested against every ray). Replaces OptiX trace_closest /
trace_occlusion for the dense strategy. Layout rationale (v5e measured):

  * rays ride the *lane* dimension: input is an [8, R] f32 plane
    (rows ox oy oz dx dy dz tmax pad), so both HBM footprint and DMA traffic
    are exact — an [R, 8] layout pads 8 -> 128 lanes and costs 16x;
  * triangles ride the *sublane* dimension in TSUB=8 chunks: every
    intermediate is a (TSUB, RT) full-lane-tile array, and the triangle pad
    is T -> multiple-of-8 instead of multiple-of-128;
  * the sweep carries only (best_t, best_id); barycentrics for the single
    winning triangle are recomputed by the caller (accel/intersect.py
    recompute_bary) — carrying u/v planes through the loop is what made the
    first version of this kernel memory-bound.

Möller-Trumbore in component form; matches accel/intersect.py bit-for-bit
modulo fp reassociation (tested against it).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import Hit

_EPS = 1e-9
RT = 1024     # rays per program (lanes; 8 lane-tiles)
TSUB = 8      # triangles per chunk (sublanes; one f32 tile row)
_BIG = 3e38


def _round_up(x, m):
    return (x + m - 1) // m * m


def _mt_chunk(rays_ref, tri_ref, k):
    """One (TSUB, RT) Möller-Trumbore sweep: triangle chunk k vs all rays of
    this program. Returns (t, ok) with rays on lanes."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    row = pl.ds(pl.multiple_of(k * TSUB, TSUB), TSUB)
    p0x = tri_ref[row, 0:1]
    p0y = tri_ref[row, 1:2]
    p0z = tri_ref[row, 2:3]
    e1x = tri_ref[row, 3:4]
    e1y = tri_ref[row, 4:5]
    e1z = tri_ref[row, 5:6]
    e2x = tri_ref[row, 6:7]
    e2y = tri_ref[row, 7:8]
    e2z = tri_ref[row, 8:9]

    pvx = dy * e2z - dz * e2y          # (TSUB, RT) from (1,RT)x(TSUB,1)
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = jnp.where(jnp.abs(det) > _EPS,
                        1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    tvx = ox - p0x
    tvy = oy - p0y
    tvz = oz - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    ok = ((jnp.abs(det) > _EPS) & (u >= 0.0) & (v >= 0.0)
          & (u + v <= 1.0) & (t > 0.0))
    return t, u, v, ok


def _closest_kernel(n_chunks, rays_ref, tri_ref, out_ref):
    tmax = rays_ref[6:7, :]

    def body(k, carry):
        bt, bi, bu, bv = carry
        t, u, v, ok = _mt_chunk(rays_ref, tri_ref, k)
        t = jnp.where(ok, t, _BIG)
        tmin = jnp.min(t, axis=0, keepdims=True)            # (1, RT)
        gid = (jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
               + k * TSUB).astype(jnp.float32)
        imin = jnp.min(jnp.where(t == tmin, gid, _BIG), axis=0,
                       keepdims=True)
        # winner's u/v picked here (sum over a one-hot mask) — carrying them
        # through the loop costs ~6 extra (TSUB, RT) ops vs the 4.6 ms a
        # gather-based recompute costs outside the kernel
        sel = (t == tmin) & (gid == imin)
        usel = jnp.sum(jnp.where(sel, u, 0.0), axis=0, keepdims=True)
        vsel = jnp.sum(jnp.where(sel, v, 0.0), axis=0, keepdims=True)
        better = tmin < bt
        bt = jnp.where(better, tmin, bt)
        bi = jnp.where(better, imin, bi)
        bu = jnp.where(better, usel, bu)
        bv = jnp.where(better, vsel, bv)
        return bt, bi, bu, bv

    init = (tmax, jnp.full((1, RT), -1.0), jnp.zeros((1, RT)),
            jnp.zeros((1, RT)))
    bt, bi, bu, bv = jax.lax.fori_loop(0, n_chunks, body, init)
    out_ref[0:1, :] = bt
    out_ref[1:2, :] = bi
    out_ref[2:3, :] = bu
    out_ref[3:4, :] = bv
    out_ref[4:8, :] = jnp.zeros((4, RT))


def _anyhit_kernel(n_chunks, rays_ref, tri_ref, out_ref):
    tmax = rays_ref[6:7, :]

    def body(k, occ):
        t, u, v, ok = _mt_chunk(rays_ref, tri_ref, k)
        hit = jnp.max(jnp.where(ok & (t < tmax), 1.0, 0.0), axis=0,
                      keepdims=True)
        return jnp.maximum(occ, hit)  # f32 carry: i1 vectors fail to legalize

    occ = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((1, RT)))
    out_ref[0:1, :] = occ
    out_ref[1:8, :] = jnp.zeros((7, RT))


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def intersect_pallas(ray, tri_p0, tri_e1, tri_e2, any_hit=False,
                     interpret=False):
    """Dense sweep via the Pallas kernel. Returns Hit (occlusion encoded as
    Hit.prim_id >= 0 for any_hit)."""
    T = tri_p0.shape[0]
    Tp = _round_up(max(T, 1), TSUB)
    n_chunks = Tp // TSUB

    # [Tp, 16]: cols 0-8 = p0 e1 e2 components (9 used, padded to 16)
    tris = jnp.zeros((Tp, 16), jnp.float32)
    tris = tris.at[:T, 0:3].set(tri_p0)
    tris = tris.at[:T, 3:6].set(tri_e1)
    tris = tris.at[:T, 6:9].set(tri_e2)

    R = ray.origin.shape[0]
    Rp = _round_up(max(R, 1), RT)
    o = ray.origin.T
    d = ray.direction.T
    rays = jnp.zeros((8, Rp), jnp.float32)
    rays = rays.at[0:3, :R].set(o)
    rays = rays.at[3:6, :R].set(d)
    rays = rays.at[6, :R].set(ray.t_max)

    kern = _anyhit_kernel if any_hit else _closest_kernel
    out = pl.pallas_call(
        functools.partial(kern, n_chunks),
        out_shape=jax.ShapeDtypeStruct((8, Rp), jnp.float32),
        grid=(Rp // RT,),
        in_specs=[
            pl.BlockSpec((8, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, RT), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rays, tris)

    if any_hit:
        return Hit(t=ray.t_max, prim_id=jnp.where(out[0, :R] > 0.5, 0, -1),
                   bary=jnp.zeros((R, 2)))
    t = out[0, :R]
    pid = out[1, :R].astype(jnp.int32)
    miss = (pid < 0) | (t >= ray.t_max)
    uv = jnp.where(miss[:, None], 0.0, out[2:4, :R].T)
    return Hit(t=jnp.where(miss, ray.t_max, t),
               prim_id=jnp.where(miss, -1, pid),
               bary=uv)
