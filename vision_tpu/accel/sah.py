"""SAH BVH: straight-line burst traversal for large meshes.

TPU-native replacement for OptiX BLAS traversal
(`/root/reference/src/base/mgr/geometry.cpp:168-185`). Two facts measured on
v5e drive the design:

  * straight-line dependent gathers cost ~1.5 us per [262k]-lane step
    (the gather unit streams at ~600 GB/s effective), but the SAME gather
    inside a `lax.while_loop`/`scan` body costs ~2 ms — three orders of
    magnitude. Traversal must therefore be UNROLLED straight-line HLO,
    stepped in fixed-size bursts from the host, never from a device loop.
  * gather cost is per-instruction latency, not bytes: a [N, 8] row gather
    costs the same as a [N] scalar gather. So the node (lo, hi, child,
    skip) packs into ONE 8-float row and a whole 4-triangle leaf (3x4
    vec3s + 4 prim ids) into ONE 48-float row — 2 gathers per traversal
    step total.

The tree is built on host by the native binned-SAH builder
(native/bvh_builder.cpp, ~1.6 s for 262k tris); leaves are padded to
exactly 4 triangles (degenerate pad rows never hit). Traversal is a
stackless skip-link DFS; every lane walks independently, so there is no
lock-step divergence tax beyond burst granularity (finished lanes idle
until the host stops issuing bursts).

Indices ride in float32 rows (exact below 2^24; asserted at build).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..core.types import Hit

_EPS = 1e-9
MAX_LEAF = 4
BURST = 24          # unrolled steps per dispatch (compile-time/latency knob)


@struct.dataclass
class SAHBVH:
    nodes: jnp.ndarray   # [N, 8] f32: lo(3) hi(3) first_enc skip
                         # first_enc: inner -> child id; leaf -> -(leaf_row+1)
    leaf: jnp.ndarray    # [L, 48] f32: 4x(p0,e1,e2) + 4 prim ids + pad
    n_tris: int = struct.field(pytree_node=False)


def build_sah(p0, p1, p2, max_leaf=MAX_LEAF):
    """Host build via the native binned-SAH builder. Returns SAHBVH or None
    when the native library is unavailable (callers then fall back)."""
    from .. import native
    p0 = np.asarray(p0, np.float32)
    p1 = np.asarray(p1, np.float32)
    p2 = np.asarray(p2, np.float32)
    r = native.build_bvh_native(p0, p1, p2, max_leaf=max_leaf)
    if r is None:
        return None
    first = r["first"].astype(np.int64)
    count = r["count"].astype(np.int64)
    skip = r["skip"].astype(np.int64)
    order = r["order"].astype(np.int64)
    N = len(first)
    leaves = np.nonzero(count > 0)[0]
    L = len(leaves)
    assert N < (1 << 24) and len(order) < (1 << 24) and L < (1 << 24)

    # leaf rows: exactly 4 tri slots each; pad with degenerate tris (e1=e2=0)
    leaf = np.zeros((max(L, 1), 48), np.float32)
    leaf[:, 36:40] = -1.0
    leaf_row_of_node = np.zeros(N, np.int64)
    leaf_row_of_node[leaves] = np.arange(L)
    s0, s1, s2 = p0[order], p1[order], p2[order]
    e1 = s1 - s0
    e2 = s2 - s0
    if L:
        # vectorized slot fill (a python per-leaf loop takes minutes at 262k)
        f = first[leaves][:, None]                     # [L, 1]
        c = count[leaves][:, None]
        ks = np.arange(max_leaf)[None, :]              # [1, K]
        valid = ks < c                                 # [L, K]
        src = np.clip(f + ks, 0, len(order) - 1)       # [L, K] sorted-tri idx
        vz = valid[..., None]
        for k in range(max_leaf):
            col = 9 * k
            leaf[:, col:col + 3] = np.where(vz[:, k], s0[src[:, k]], 0.0)
            leaf[:, col + 3:col + 6] = np.where(vz[:, k], e1[src[:, k]], 0.0)
            leaf[:, col + 6:col + 9] = np.where(vz[:, k], e2[src[:, k]], 0.0)
        leaf[:, 36:36 + max_leaf] = np.where(
            valid, order[src].astype(np.float32), -1.0)

    nodes = np.zeros((N, 8), np.float32)
    nodes[:, 0:3] = r["lo"]
    nodes[:, 3:6] = r["hi"]
    first_enc = np.where(count > 0, -(leaf_row_of_node + 1), first)
    nodes[:, 6] = first_enc.astype(np.float32)
    nodes[:, 7] = skip.astype(np.float32)
    return SAHBVH(nodes=jnp.asarray(nodes), leaf=jnp.asarray(leaf),
                  n_tris=len(order))


def _prep_rays(ray):
    ox, oy, oz = (ray.origin[:, i] for i in range(3))
    dx, dy, dz = (ray.direction[:, i] for i in range(3))

    def rcp(v):
        return 1.0 / jnp.where(jnp.abs(v) > 1e-12, v,
                               jnp.where(v >= 0, 1e-12, -1e-12))
    return (ox, oy, oz, dx, dy, dz, rcp(dx), rcp(dy), rcp(dz))


def trace_state_init(ray):
    R = ray.origin.shape[0]
    return dict(node=jnp.zeros((R,), jnp.int32), t=ray.t_max,
                tid=jnp.full((R,), -1, jnp.int32),
                u=jnp.zeros((R,)), v=jnp.zeros((R,)))


def trace_burst(bvh, rays, s, any_hit=False, steps=BURST):
    """`steps` unrolled traversal steps (straight-line HLO — call this from
    host code or other straight-line code, NEVER from inside a device loop;
    see module docstring). rays = _prep_rays output; s = trace_state_init
    pytree. Lanes finish by setting node=-1."""
    ox, oy, oz, dx, dy, dz, ix, iy, iz = rays
    node, t, tid, u, v = s["node"], s["t"], s["tid"], s["u"], s["v"]
    for _ in range(steps):
        active = node >= 0
        nid = jnp.maximum(node, 0)
        row = bvh.nodes[nid]                       # ONE [N, 8] row gather
        ax = (row[:, 0] - ox) * ix
        bx = (row[:, 3] - ox) * ix
        ay = (row[:, 1] - oy) * iy
        by = (row[:, 4] - oy) * iy
        az = (row[:, 2] - oz) * iz
        bz = (row[:, 5] - oz) * iz
        tnear = jnp.maximum(jnp.maximum(jnp.minimum(ax, bx),
                                        jnp.minimum(ay, by)),
                            jnp.maximum(jnp.minimum(az, bz), 0.0))
        tfar = jnp.minimum(jnp.minimum(jnp.maximum(ax, bx),
                                       jnp.maximum(ay, by)),
                           jnp.maximum(az, bz))
        box_hit = active & (tfar >= tnear) & (tnear < t)
        fe = row[:, 6].astype(jnp.int32)
        is_leaf = fe < 0
        do_leaf = box_hit & is_leaf
        lrow = jnp.maximum(-fe - 1, 0)
        lf = bvh.leaf[lrow]                        # ONE [L, 48] row gather
        hit_any = jnp.zeros_like(do_leaf)
        for k in range(MAX_LEAF):
            c = lf[:, 9 * k:9 * k + 9]
            pvx = dy * c[:, 8] - dz * c[:, 7]
            pvy = dz * c[:, 6] - dx * c[:, 8]
            pvz = dx * c[:, 7] - dy * c[:, 6]
            det = c[:, 3] * pvx + c[:, 4] * pvy + c[:, 5] * pvz
            inv = jnp.where(jnp.abs(det) > _EPS,
                            1.0 / jnp.where(det == 0, 1.0, det), 0.0)
            tvx = ox - c[:, 0]
            tvy = oy - c[:, 1]
            tvz = oz - c[:, 2]
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
            qvx = tvy * c[:, 5] - tvz * c[:, 4]
            qvy = tvz * c[:, 3] - tvx * c[:, 5]
            qvz = tvx * c[:, 4] - tvy * c[:, 3]
            vv = (dx * qvx + dy * qvy + dz * qvz) * inv
            tt = (c[:, 6] * qvx + c[:, 7] * qvy + c[:, 8] * qvz) * inv
            pid_k = lf[:, 36 + k]
            ok = (do_leaf & (pid_k >= 0) & (jnp.abs(det) > _EPS)
                  & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                  & (tt > 0.0) & (tt < t))
            if any_hit:
                hit_any = hit_any | ok
            else:
                tid = jnp.where(ok, pid_k.astype(jnp.int32), tid)
                u = jnp.where(ok, uu, u)
                v = jnp.where(ok, vv, v)
                t = jnp.where(ok, tt, t)
        if any_hit:
            tid = jnp.where(hit_any, jnp.int32(1), tid)
        nxt = jnp.where(box_hit & jnp.logical_not(is_leaf),
                        fe, row[:, 7].astype(jnp.int32))
        if any_hit:
            nxt = jnp.where(tid >= 0, -1, nxt)
        node = jnp.where(active, nxt, -1)
    return dict(node=node, t=t, tid=tid, u=u, v=v)


@functools.partial(jax.jit, static_argnames=("any_hit", "steps"))
def _burst_jit(bvh, rays, s, any_hit, steps):
    return trace_burst(bvh, rays, s, any_hit=any_hit, steps=steps)


def intersect_sah(ray, bvh, any_hit=False, max_bursts=4096):
    """Host-stepped trace of [R] rays: dispatch BURST-step segments until
    every lane terminates. Returns Hit (prim ids in original numbering;
    any_hit encodes occlusion as prim_id >= 0)."""
    rays = _prep_rays(ray)
    s = trace_state_init(ray)
    for _ in range(max_bursts):
        s = _burst_jit(bvh, rays, s, any_hit, BURST)
        if not bool(jnp.any(s["node"] >= 0)):
            break
    if any_hit:
        return Hit(t=ray.t_max, prim_id=jnp.where(s["tid"] >= 0, 0, -1),
                   bary=jnp.zeros((ray.origin.shape[0], 2)))
    return Hit(t=s["t"], prim_id=s["tid"],
               bary=jnp.stack([s["u"], s["v"]], -1))
