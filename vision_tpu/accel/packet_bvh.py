"""Packet-BVH: Pallas TPU traversal for large scenes.

TPU-native replacement for OptiX BLAS traversal on big meshes
(`/root/reference/src/base/mgr/geometry.cpp:168-185`). Why this shape —
measured facts on v5e that rule the design:

  * dynamic gathers at wavefront scale are SERIAL: a [262k]-lane gather
    from an HBM table inside a device loop costs ~2 ms regardless of row
    width (~130M random elements/s). Any per-lane pointer-chasing
    traversal is therefore capped at ~0.1 Mrays/s — dead on arrival.
    ALL data movement here is dense.
  * rays are processed in BLOCKS of RT lanes (one grid program per
    block); a block shares ONE traversal walked in scalar registers +
    SMEM (node AABBs and links are scalar-prefetch arrays). A traversal
    step tests BOTH children of an inner node in one fused (2, RT) slab
    test on the VPU — two nodes per scalar readback, no gathers.
  * the walk is ORDERED front-to-back: the builder stores each inner
    node's split axis and guarantees the left child covers the lower
    side, so the near child for this block (by majority direction sign)
    is descended first and the far child goes on a SMEM stack. `best_t`
    tightens early and culls the far subtrees wholesale — the fixed
    DFS-preorder skip walk of round 4 could not do this (its `best_t`
    shrank in build order, visiting ~2x the bricks).
  * a leaf (brick of <= BRICK triangles) is visited only if ANY ray in
    the block hits its AABB closer than its current best t; its
    triangles are then DMA'd HBM->VMEM and swept densely through
    Möller-Trumbore in (TSUB, RT) chunks — full VPU lanes, zero
    irregular access. Brick DMA is DOUBLE-BUFFERED: the sweep of brick i
    overlaps the DMA of brick i+1 (two VMEM scratch slots + a DMA
    semaphore pair), hiding the HBM latency behind VPU work.
  * tree quality decides everything: with Morton-chunk bricks under a
    balanced heap, leaf AABBs overlap so badly that a block visited
    ~4100 of 8192 bricks even for a coherent 32x32 pixel tile
    (measured). The tree is therefore the native binned-SAH build
    (native/bvh_builder.cpp) with leaves <= BRICK tris.
  * blocks only help when their rays share a frustum: the renderer maps
    primary lanes to Morton/tile pixel order AND re-bins the live
    wavefront by (position-morton, direction-octant) before every trace
    (pt._rebin_key), so secondary bounces keep coherent blocks too.
    Fully-dead lanes sort to the tail with t_max=0 and their blocks
    exit after one step — compaction without dynamic shapes.

The two-level structure (scalar SAH walk + dense brick sweeps) is the
TPU analog of RT-core traversal: the hierarchy culls in scalar space,
the VPU only ever sees dense rectangles of work.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import Hit

_EPS = 1e-9
_EDGE_EPS = 1e-6
_BIG = 3e38
RT = 1024       # rays per block (lanes)
NODE_CAP = 24576  # max tree nodes (8 i32/f32 SMEM prefetch arrays each)
# max triangles per leaf brick. The brick sweep is the dominant cost on
# incoherent wavefronts (a block tests leaves x BRICK tris densely).
# Measured on staircase (v5e): 32 wins the bare incoherent-closest
# microbench by ~15% (119 vs 140 ms) but LOSES the full PT wave (1.25 vs
# 1.55 Mrays/s — the doubled node count hurts the shadow/mixed traces),
# and 16 doubles nodes past the SMEM budget; 64 stays the default.
# VT_BRICK overrides for measurement.
import os as _os
BRICK = int(_os.environ.get("VT_BRICK", "64"))
TSUB = 8        # triangles per MT chunk (sublanes)
STACK = 160     # SMEM far-child stack; builder caps depth at 48+log2(n)


@struct.dataclass
class PacketBVH:
    skip: jnp.ndarray        # [n_nodes] i32 DFS miss link (-1 done);
                             # right child of inner i == skip[i+1]
    brick: jnp.ndarray       # [n_nodes] i32: leaf -> brick id (>=0),
                             # inner -> -(split_axis+1) in {-1,-2,-3}
    lo_x: jnp.ndarray        # [n_nodes] f32 node AABB (6 component arrays)
    lo_y: jnp.ndarray
    lo_z: jnp.ndarray
    hi_x: jnp.ndarray
    hi_y: jnp.ndarray
    hi_z: jnp.ndarray
    tri: jnp.ndarray         # [n_bricks*BRICK, 128] f32: p0 e1 e2 (cols 0-8;
                             # lane-padded to 128 so per-brick DMA slices are
                             # tile-aligned — Mosaic requires 128-lane slices)
    prim_order: jnp.ndarray  # [n_bricks*bsize] i32 original tri id (-1 pad)
    n_nodes: int = struct.field(pytree_node=False)
    # leaf capacity of THIS tree: grows past BRICK for huge meshes so the
    # node arrays stay inside the SMEM scalar-prefetch budget
    bsize: int = struct.field(pytree_node=False, default=BRICK)
    # windowed-walk layout (kernel v3): per direction-octant preorder with
    # near-child-first order baked in. link8[o*n_pad + j] packs
    # (skip << shift) | (brick + 4); aabb8 rows hold lo[3] hi[3] in
    # 128-lane rows (TPU tiling pads narrow rows to 128 lanes anyway, so
    # the wide layout costs nothing extra and keeps DMA slices aligned).
    # None when ids don't fit 31 bits or the tree exceeds the VMEM table
    # budget (fallback: v2 stack kernel).
    link8: jnp.ndarray = None       # [8 * n_pad] i32
    aabb8: jnp.ndarray = None       # [8 * n_pad, 128] f32
    n_pad: int = struct.field(pytree_node=False, default=0)
    shift: int = struct.field(pytree_node=False, default=0)


def build_packet_bvh(p0, p1, p2, brick=BRICK):
    """Host build via the native binned-SAH builder: DFS-preorder tree with
    skip links + per-node split axes, leaves <= `brick` tris padded to fixed
    `brick` slots. Returns PacketBVH, or None when the native library is
    unavailable (callers fall back to the XLA skip-link walk)."""
    from .. import native
    p0 = np.asarray(p0, np.float32)
    p1 = np.asarray(p1, np.float32)
    p2 = np.asarray(p2, np.float32)
    n = len(p0)
    # node arrays are scalar-prefetch (SMEM): huge meshes double the leaf
    # capacity until the tree fits the budget (a 1M-tri kitchen at leaf 64
    # is ~80k nodes = 2.6 MB of SMEM arrays -> compile failure)
    while True:
        r = native.build_bvh_native(p0, p1, p2, max_leaf=brick)
        if r is None:
            return None
        if len(r["first"]) <= NODE_CAP or brick >= 1024:
            break
        brick *= 2
    first = r["first"].astype(np.int64)
    count = r["count"].astype(np.int64)
    order = r["order"].astype(np.int64)
    axis = r["axis"].astype(np.int64)
    n_nodes = len(first)

    leaves = np.nonzero(count > 0)[0]
    n_bricks = max(1, len(leaves))
    # the closest-hit kernel carries the winning slot id as f32: exact only
    # below 2^24 (the deleted sah.py had the same bound)
    assert n_bricks * brick < (1 << 24), (
        f"brick slot ids ({n_bricks * brick}) exceed f32 exact-int range")
    # leaf -> brick id; inner -> -(axis+1) so one array carries both
    brick_of_node = -(axis + 1)
    brick_of_node[leaves] = np.arange(len(leaves))

    # brick triangle table: brick b slot k <- sorted tri first[leaf]+k
    tri = np.zeros((n_bricks * brick, 128), np.float32)
    prim_order = np.full(n_bricks * brick, -1, np.int64)
    if len(leaves):
        f = first[leaves][:, None]                      # [L, 1]
        c = count[leaves][:, None]
        ks = np.arange(brick)[None, :]                  # [1, K]
        valid = (ks < c).ravel()                        # [L*K]
        src = np.clip(f + ks, 0, max(n - 1, 0)).ravel()
        sp0, sp1, sp2 = p0[order], p1[order], p2[order]
        tri[valid, 0:3] = sp0[src[valid]]
        tri[valid, 3:6] = sp1[src[valid]] - sp0[src[valid]]
        tri[valid, 6:9] = sp2[src[valid]] - sp0[src[valid]]
        _fill_woop(tri, valid, sp0, sp1, sp2, src[valid])
        prim_order[valid] = order[src[valid]]

    link8, aabb8, n_pad, shift = _octant_tables(
        r, brick_of_node.astype(np.int64), n_nodes)
    return PacketBVH(
        skip=jnp.asarray(r["skip"], jnp.int32),
        brick=jnp.asarray(brick_of_node, jnp.int32),
        lo_x=jnp.asarray(r["lo"][:, 0]), lo_y=jnp.asarray(r["lo"][:, 1]),
        lo_z=jnp.asarray(r["lo"][:, 2]),
        hi_x=jnp.asarray(r["hi"][:, 0]), hi_y=jnp.asarray(r["hi"][:, 1]),
        hi_z=jnp.asarray(r["hi"][:, 2]),
        tri=jnp.asarray(tri),
        prim_order=jnp.asarray(prim_order, jnp.int32),
        n_nodes=int(n_nodes),
        bsize=int(brick),
        link8=None if link8 is None else jnp.asarray(link8),
        aabb8=None if aabb8 is None else jnp.asarray(aabb8),
        n_pad=n_pad, shift=shift,
    )


def _octant_tables(r, brick_of_node, n_nodes):
    """Per direction-octant preorder layouts for the windowed walk: for
    octant o, children are emitted NEAR-FIRST (by the split-axis sign), so
    the plain skip-link walk is front-to-back with no stack — which lets
    the kernel test 8 consecutive preorder nodes per scalar sync. Returns
    (link8 [8*n_pad] i32, aabb8 [8*n_pad, 8] f32, n_pad, shift) or
    (None, None, 0, 0) when ids don't fit the 31-bit packing."""
    import sys
    count = r["count"].astype(np.int64)
    axis = r["axis"].astype(np.int64)
    skipb = r["skip"].astype(np.int64)
    lo = r["lo"].astype(np.float32)
    hi = r["hi"].astype(np.float32)
    n_pad = max(8, -(-n_nodes // 8) * 8)
    n_bricks = int(brick_of_node.max()) + 1 if len(brick_of_node) else 1
    shift = max(int(np.ceil(np.log2(max(n_bricks, 1) + 5))), 3)
    # VMEM budget for the per-block node table (the rows are 128-lane
    # tiles whatever we declare, so the table costs n_pad*512B of VMEM);
    # larger trees fall back to the v2 stack kernel
    if (shift + int(np.ceil(np.log2(n_pad + 1))) > 31) or n_pad > 16384:
        return None, None, 0, 0

    link8 = np.zeros((8, n_pad), np.int64)
    aabb8 = np.zeros((8, n_pad, 128), np.float32)
    old_rec = sys.getrecursionlimit()
    sys.setrecursionlimit(10000)  # builder caps tree depth at ~72
    try:
        for o in range(8):
            sgn = ((o >> 2) & 1, (o >> 1) & 1, o & 1)  # 1 = +dir
            order = []
            sub_end = {}

            def emit(node):
                my = len(order)
                order.append(node)
                if count[node] == 0:
                    left = node + 1
                    right = skipb[left]
                    near, far = ((left, right) if sgn[axis[node]]
                                 else (right, left))
                    emit(near)
                    emit(far)
                sub_end[my] = len(order)

            if n_nodes:
                emit(0)
            order_np = np.asarray(order, np.int64)
            skip_new = np.array([sub_end[i] for i in range(n_nodes)],
                                np.int64)
            skip_new = np.where(skip_new >= n_nodes, n_pad, skip_new)
            enc = brick_of_node[order_np] + 4
            link8[o, :n_nodes] = (skip_new << shift) | enc
            link8[o, n_nodes:] = (n_pad << shift)
            aabb8[o, :n_nodes, 0:3] = lo[order_np]
            aabb8[o, :n_nodes, 3:6] = hi[order_np]
    finally:
        sys.setrecursionlimit(old_rec)
    return (link8.reshape(-1).astype(np.int32),
            aabb8.reshape(-1, 128), n_pad, shift)


def _fill_woop(tri, valid, sp0, sp1, sp2, src_valid):
    """Woop unit-triangle transform rows (cols 9-20): a hit solves
    (u, v, t') = Minv @ (p - p0) with Minv = [e1 e2 n]^-1; the kernel
    forms o' = Minv o - c (c = Minv p0) and d' = Minv d, then
    t = -o'_z/d'_z, u = o'_x + t d'_x, v = o'_y + t d'_y. ~20% fewer VPU
    ops per sweep chunk than Moller-Trumbore (A/B via VT_WOOP)."""
    a = sp0[src_valid].astype(np.float64)
    e1 = sp1[src_valid].astype(np.float64) - a
    e2 = sp2[src_valid].astype(np.float64) - a
    n = np.cross(e1, e2)
    A = np.stack([e1, e2, n], axis=-1)          # [k, 3, 3] columns
    det = np.linalg.det(A)
    ok = np.abs(det) > 1e-24
    Ainv = np.zeros_like(A)
    if ok.any():
        Ainv[ok] = np.linalg.inv(A[ok])
    c = np.einsum("kij,kj->ki", Ainv, a)
    tri[valid, 9:18] = Ainv.reshape(-1, 9).astype(np.float32)
    tri[valid, 18:21] = c.astype(np.float32)


def _ray_rows(rays_ref):
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tmax = rays_ref[6:7, :]

    def rcp(v):
        a = jnp.where(jnp.abs(v) > 1e-12, v, jnp.where(v >= 0, 1e-12, -1e-12))
        return 1.0 / a
    return ox, oy, oz, dx, dy, dz, rcp(dx), rcp(dy), rcp(dz), tmax


def _pair(a, b):
    """Two SMEM scalars -> a (2, 1) vector (for both-children slab math)."""
    return jnp.concatenate([jnp.full((1, 1), a, jnp.float32),
                            jnp.full((1, 1), b, jnp.float32)], axis=0)


def _mt_rows(tri_scr, row, ox, oy, oz, dx, dy, dz):
    """MT sweep of TSUB triangles starting at scratch row `row` vs all rays
    of this block."""
    sl = pl.ds(pl.multiple_of(row, TSUB), TSUB)
    p0x = tri_scr[sl, 0:1]
    p0y = tri_scr[sl, 1:2]
    p0z = tri_scr[sl, 2:3]
    e1x = tri_scr[sl, 3:4]
    e1y = tri_scr[sl, 4:5]
    e1z = tri_scr[sl, 5:6]
    e2x = tri_scr[sl, 6:7]
    e2y = tri_scr[sl, 7:8]
    e2z = tri_scr[sl, 8:9]

    pvx = dy * e2z - dz * e2y
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
    # barycentric edge tolerance: rays hitting exactly on a shared edge
    # round to v ~ -1e-17 in one triangle and miss both (observed); a 1e-6
    # slack (sub-micro-texel) closes the crack. Shared-edge double hits are
    # resolved by the min-t/min-id reduction.
    ok = ((jnp.abs(det) > _EPS) & (u >= -_EDGE_EPS) & (v >= -_EDGE_EPS)
          & (u + v <= 1.0 + _EDGE_EPS) & (t > 0.0))
    return t, u, v, ok


def _mt_rows_woop(tri_scr, row, ox, oy, oz, dx, dy, dz):
    """Woop unit-triangle sweep: rays transformed per triangle by the
    precomputed Minv|c rows (cols 9-20). Same (t, u, v, ok) contract as
    _mt_rows with ~20% fewer VPU ops on paper — MEASURED A WASH on v5e
    (staircase wave 1.66 vs 1.68 Mrays/s): the sweep is not op-issue
    bound. Kept behind VT_WOOP=1 as the measured record; MT stays the
    default."""
    sl = pl.ds(pl.multiple_of(row, TSUB), TSUB)
    m00 = tri_scr[sl, 9:10]
    m01 = tri_scr[sl, 10:11]
    m02 = tri_scr[sl, 11:12]
    m10 = tri_scr[sl, 12:13]
    m11 = tri_scr[sl, 13:14]
    m12 = tri_scr[sl, 14:15]
    m20 = tri_scr[sl, 15:16]
    m21 = tri_scr[sl, 16:17]
    m22 = tri_scr[sl, 17:18]
    cu = tri_scr[sl, 18:19]
    cv = tri_scr[sl, 19:20]
    cw = tri_scr[sl, 20:21]
    ou = m00 * ox + m01 * oy + m02 * oz - cu
    ov = m10 * ox + m11 * oy + m12 * oz - cv
    ow = m20 * ox + m21 * oy + m22 * oz - cw
    du = m00 * dx + m01 * dy + m02 * dz
    dv = m10 * dx + m11 * dy + m12 * dz
    dw = m20 * dx + m21 * dy + m22 * dz
    den_ok = jnp.abs(dw) > 1e-12
    inv = 1.0 / jnp.where(den_ok, dw, 1.0)
    t = -ow * inv
    u = ou + t * du
    v = ov + t * dv
    ok = (den_ok & (u >= -_EDGE_EPS) & (v >= -_EDGE_EPS)
          & (u + v <= 1.0 + _EDGE_EPS) & (t > 0.0))
    return t, u, v, ok


def _isect_chunk(woop, tri_scr, row, ox, oy, oz, dx, dy, dz):
    fn = _mt_rows_woop if woop else _mt_rows
    return fn(tri_scr, row, ox, oy, oz, dx, dy, dz)


def _slab2(l, r, lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
           ox, oy, oz, ix, iy, iz):
    """Fused slab test of BOTH children (rows: [left, right]) -> (2, RT)
    (tnear, tfar). One VPU pass for two nodes."""
    def ax(lo_ref, hi_ref, o, inv):
        lo = _pair(lo_ref[l], lo_ref[r])
        hi = _pair(hi_ref[l], hi_ref[r])
        a = (lo - o) * inv
        b = (hi - o) * inv
        return jnp.minimum(a, b), jnp.maximum(a, b)
    nx, fx = ax(lox_ref, hix_ref, ox, ix)
    ny, fy = ax(loy_ref, hiy_ref, oy, iy)
    nz, fz = ax(loz_ref, hiz_ref, oz, iz)
    tnear = jnp.maximum(jnp.maximum(nx, ny), jnp.maximum(nz, 0.0))
    tfar = jnp.minimum(jnp.minimum(fx, fy), fz)
    return tnear, tfar


def _any2(mask2):
    """(hitL, hitR) scalars from a (2, RT) mask with ONE cross-lane
    reduction (the vector->scalar sync is the costly part of a traversal
    step; two row scalars after one reduce beat two full reduces)."""
    red = jnp.max(jnp.where(mask2, 1.0, 0.0), axis=1, keepdims=True)  # (2,1)
    return red[0, 0] > 0.5, red[1, 0] > 0.5


def _closest_kernel(max_steps, bs, woop, skip_ref, brick_ref, lox_ref, loy_ref,
                    loz_ref, hix_ref, hiy_ref, hiz_ref, rays_ref, tris_ref,
                    out_ref, best_ref, stack_ref, tri_scr, sem):
    ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax = _ray_rows(rays_ref)
    best_ref[0:1, :] = tmax
    best_ref[1:2, :] = jnp.full((1, RT), -1.0)
    best_ref[2:4, :] = jnp.zeros((2, RT))
    # majority direction sign per axis: picks the near child for the block
    sx = jnp.sum(dx) >= 0.0
    sy = jnp.sum(dy) >= 0.0
    sz = jnp.sum(dz) >= 0.0
    any_live = jnp.max(tmax) > 0.0

    def dma(slot, brick_id):
        return pltpu.make_async_copy(
            tris_ref.at[pl.ds(pl.multiple_of(brick_id * bs, bs),
                              bs), :],
            tri_scr.at[pl.ds(pl.multiple_of(slot * bs, bs), bs), :],
            sem.at[slot])

    def sweep(slot, brick_id):
        dma(slot, brick_id).wait()
        c0 = best_ref[0:1, :]
        c1 = best_ref[1:2, :]
        c2 = best_ref[2:3, :]
        c3 = best_ref[3:4, :]

        def chunk(k, carry):
            bt_, bi_, bu_, bv_ = carry
            t, u, v, ok = _isect_chunk(woop, tri_scr, slot * bs + k * TSUB,
                                   ox, oy, oz, dx, dy, dz)
            t = jnp.where(ok, t, _BIG)
            tmin = jnp.min(t, axis=0, keepdims=True)
            gid = (jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
                   + (brick_id * bs + k * TSUB)).astype(jnp.float32)
            imin = jnp.min(jnp.where(t == tmin, gid, _BIG), axis=0,
                           keepdims=True)
            sel = (t == tmin) & (gid == imin)
            usel = jnp.sum(jnp.where(sel, u, 0.0), axis=0, keepdims=True)
            vsel = jnp.sum(jnp.where(sel, v, 0.0), axis=0, keepdims=True)
            better = tmin < bt_
            return (jnp.where(better, tmin, bt_),
                    jnp.where(better, imin, bi_),
                    jnp.where(better, usel, bu_),
                    jnp.where(better, vsel, bv_))

        c0, c1, c2, c3 = jax.lax.fori_loop(
            0, bs // TSUB, chunk, (c0, c1, c2, c3))
        best_ref[0:1, :] = c0
        best_ref[1:2, :] = c1
        best_ref[2:3, :] = c2
        best_ref[3:4, :] = c3

    def enqueue(cond, brick_id, pend, buf, leaves):
        """Start the brick's DMA into slot `buf`, sweep the previously
        pending brick (whose DMA has been in flight) from the other slot."""
        @pl.when(cond)
        def _():
            dma(buf, brick_id).start()

            @pl.when(pend >= 0)
            def _():
                sweep(1 - buf, pend)
        return (jnp.where(cond, brick_id, pend),
                jnp.where(cond, 1 - buf, buf),
                leaves + cond.astype(jnp.int32))

    def body(carry):
        node, sp, pend, buf, steps, leaves = carry
        ax = -1 - brick_ref[node]          # parent split axis
        l = node + 1
        r = skip_ref[l]                    # right child follows left subtree
        bl = brick_ref[l]
        br = brick_ref[r]
        tnear, tfar = _slab2(l, r, lox_ref, loy_ref, loz_ref,
                             hix_ref, hiy_ref, hiz_ref, ox, oy, oz,
                             ix, iy, iz)
        hitm = (tfar >= tnear) & (tnear < best_ref[0:1, :])
        hitL, hitR = _any2(hitm)
        leafL = bl >= 0
        leafR = br >= 0

        pend, buf, leaves = enqueue(hitL & leafL, bl, pend, buf, leaves)
        pend, buf, leaves = enqueue(hitR & leafR, br, pend, buf, leaves)

        dL = hitL & jnp.logical_not(leafL)
        dR = hitR & jnp.logical_not(leafR)
        # near child first (front-to-back): positive block direction along
        # the split axis -> left (lower side) first
        near_l = jnp.where(ax == 0, sx, jnp.where(ax == 1, sy, sz))
        goN = jnp.where(near_l, l, r)
        goF = jnp.where(near_l, r, l)
        dN = jnp.where(near_l, dL, dR)
        dF = jnp.where(near_l, dR, dL)
        both = dN & dF

        @pl.when(both)
        def _():
            stack_ref[sp] = goF

        sp2 = sp + both.astype(jnp.int32)
        desc = dN | dF
        popped = stack_ref[jnp.maximum(sp2 - 1, 0)]
        nxt = jnp.where(desc, jnp.where(dN, goN, goF),
                        jnp.where(sp2 > 0, popped, -1))
        sp3 = jnp.where(desc, sp2, jnp.maximum(sp2 - 1, 0))
        return nxt, sp3, pend, buf, steps + 1, leaves

    # root: a leaf root is swept directly; otherwise expand from node 0
    root_leaf = brick_ref[0] >= 0
    pend0, buf0, leaves0 = enqueue(any_live & root_leaf, brick_ref[0],
                                   jnp.int32(-1), jnp.int32(0), jnp.int32(0))
    node0 = jnp.where(any_live & jnp.logical_not(root_leaf), 0, -1)
    _, _, pend, buf, steps, leaves = jax.lax.while_loop(
        lambda c: (c[0] >= 0) & (c[4] < max_steps), body,
        (node0, jnp.int32(0), pend0, buf0, jnp.int32(0), leaves0))

    @pl.when(pend >= 0)
    def _():
        sweep(1 - buf, pend)

    out_ref[0:4, :] = best_ref[0:4, :]
    out_ref[4:5, :] = jnp.full((1, RT), 1.0) * steps.astype(jnp.float32)
    out_ref[5:6, :] = jnp.full((1, RT), 1.0) * leaves.astype(jnp.float32)
    out_ref[6:8, :] = jnp.zeros((2, RT))


def _anyhit_kernel(max_steps, bs, woop, skip_ref, brick_ref, lox_ref, loy_ref,
                   loz_ref, hix_ref, hiy_ref, hiz_ref, rays_ref, tris_ref,
                   out_ref, occ_ref, stack_ref, tri_scr, sem):
    ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax = _ray_rows(rays_ref)
    occ_ref[0:1, :] = jnp.zeros((1, RT))
    dead = jnp.where(tmax <= 0.0, 1.0, 0.0)
    sx = jnp.sum(dx) >= 0.0
    sy = jnp.sum(dy) >= 0.0
    sz = jnp.sum(dz) >= 0.0
    any_live = jnp.max(tmax) > 0.0

    def dma(slot, brick_id):
        return pltpu.make_async_copy(
            tris_ref.at[pl.ds(pl.multiple_of(brick_id * bs, bs),
                              bs), :],
            tri_scr.at[pl.ds(pl.multiple_of(slot * bs, bs), bs), :],
            sem.at[slot])

    def sweep(slot, brick_id):
        dma(slot, brick_id).wait()

        def chunk(k, o):
            t, u, v, ok = _isect_chunk(woop, tri_scr, slot * bs + k * TSUB,
                                   ox, oy, oz, dx, dy, dz)
            hit = jnp.max(jnp.where(ok & (t < tmax), 1.0, 0.0),
                          axis=0, keepdims=True)
            return jnp.maximum(o, hit)

        occ_ref[0:1, :] = jax.lax.fori_loop(
            0, bs // TSUB, chunk, occ_ref[0:1, :])

    def enqueue(cond, brick_id, pend, buf, leaves):
        @pl.when(cond)
        def _():
            dma(buf, brick_id).start()

            @pl.when(pend >= 0)
            def _():
                sweep(1 - buf, pend)
        return (jnp.where(cond, brick_id, pend),
                jnp.where(cond, 1 - buf, buf),
                leaves + cond.astype(jnp.int32))

    def body(carry):
        node, sp, pend, buf, steps, leaves = carry
        ax = -1 - brick_ref[node]
        l = node + 1
        r = skip_ref[l]
        bl = brick_ref[l]
        br = brick_ref[r]
        tnear, tfar = _slab2(l, r, lox_ref, loy_ref, loz_ref,
                             hix_ref, hiy_ref, hiz_ref, ox, oy, oz,
                             ix, iy, iz)
        live = (occ_ref[0:1, :] < 0.5) & (tmax > 0.0)
        hitm = (tfar >= tnear) & (tnear < tmax) & live
        hitL, hitR = _any2(hitm)
        leafL = bl >= 0
        leafR = br >= 0

        did = (hitL & leafL) | (hitR & leafR)
        pend, buf, leaves = enqueue(hitL & leafL, bl, pend, buf, leaves)
        pend, buf, leaves = enqueue(hitR & leafR, br, pend, buf, leaves)

        dL = hitL & jnp.logical_not(leafL)
        dR = hitR & jnp.logical_not(leafR)
        near_l = jnp.where(ax == 0, sx, jnp.where(ax == 1, sy, sz))
        goN = jnp.where(near_l, l, r)
        goF = jnp.where(near_l, r, l)
        dN = jnp.where(near_l, dL, dR)
        dF = jnp.where(near_l, dR, dL)
        both = dN & dF

        @pl.when(both)
        def _():
            stack_ref[sp] = goF

        sp2 = sp + both.astype(jnp.int32)
        desc = dN | dF
        popped = stack_ref[jnp.maximum(sp2 - 1, 0)]
        nxt = jnp.where(desc, jnp.where(dN, goN, goF),
                        jnp.where(sp2 > 0, popped, -1))
        sp3 = jnp.where(desc, sp2, jnp.maximum(sp2 - 1, 0))
        # early out once every live lane is occluded (sweeps lag one leaf,
        # so this fires a step late — still saves the remaining walk)
        all_occ = did & (jnp.min(jnp.maximum(occ_ref[0:1, :], dead)) > 0.5)
        nxt = jnp.where(all_occ, -1, nxt)
        return nxt, sp3, pend, buf, steps + 1, leaves

    root_leaf = brick_ref[0] >= 0
    pend0, buf0, leaves0 = enqueue(any_live & root_leaf, brick_ref[0],
                                   jnp.int32(-1), jnp.int32(0), jnp.int32(0))
    node0 = jnp.where(any_live & jnp.logical_not(root_leaf), 0, -1)
    _, _, pend, buf, steps, leaves = jax.lax.while_loop(
        lambda c: (c[0] >= 0) & (c[4] < max_steps), body,
        (node0, jnp.int32(0), pend0, buf0, jnp.int32(0), leaves0))

    @pl.when(pend >= 0)
    def _():
        sweep(1 - buf, pend)

    out_ref[0:1, :] = occ_ref[0:1, :]
    out_ref[4:5, :] = jnp.full((1, RT), 1.0) * steps.astype(jnp.float32)
    out_ref[5:6, :] = jnp.full((1, RT), 1.0) * leaves.astype(jnp.float32)
    out_ref[1:4, :] = jnp.zeros((3, RT))
    out_ref[6:8, :] = jnp.zeros((2, RT))


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret",
                                             "woop", "bs"))
def _run(skip, brick, lox, loy, loz, hix, hiy, hiz, tri, rays,
         any_hit, interpret, woop=False, bs=BRICK):
    Rp = rays.shape[1]
    n_nodes = skip.shape[0]
    # hard bound: the ordered walk expands each inner node at most once;
    # 2x slack. Guarantees the device loop terminates even if a predicate
    # miscompiles (a wedged chip takes the whole host down).
    max_steps = 2 * n_nodes + 64
    kern = _anyhit_kernel if any_hit else _closest_kernel
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(Rp // RT,),
        in_specs=[
            pl.BlockSpec((8, RT), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, RT), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, RT), jnp.float32),
            pltpu.SMEM((STACK,), jnp.int32),
            pltpu.VMEM((2 * bs, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(kern, max_steps, bs, woop),
        out_shape=jax.ShapeDtypeStruct((8, Rp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(skip, brick, lox, loy, loz, hix, hiy, hiz, rays, tri)


def intersect_packet(ray, pbvh, any_hit=False, interpret=False):
    """Trace a wavefront against a PacketBVH. Returns Hit (prim ids in the
    ORIGINAL triangle numbering; any_hit encodes occlusion as prim_id>=0).

    All kernel inputs are stop_gradient'ed: hits are piecewise-constant
    w.r.t. scene/ray params (visibility gradients are out of scope, as in
    the reference's differentiable surface), and with symbolically-zero
    tangents JAX never needs an AD rule for the pallas_call."""
    sg = jax.lax.stop_gradient
    R = ray.origin.shape[0]
    Rp = _round_up(max(R, 1), RT)
    rays = jnp.zeros((8, Rp), jnp.float32)
    rays = rays.at[0:3, :R].set(ray.origin.T)
    rays = rays.at[3:6, :R].set(ray.direction.T)
    rays = rays.at[6, :R].set(ray.t_max)

    import os
    woop = os.environ.get("VT_WOOP", "0") == "1"
    if pbvh.link8 is not None and os.environ.get("VT_KERNEL") != "v2":
        out = _run3(sg(pbvh.link8), sg(pbvh.aabb8), sg(pbvh.tri), sg(rays),
                    pbvh.n_nodes, pbvh.n_pad, pbvh.shift, any_hit, interpret,
                    woop=woop, bs=pbvh.bsize)
    else:
        out = _run(sg(pbvh.skip), sg(pbvh.brick), sg(pbvh.lo_x),
                   sg(pbvh.lo_y), sg(pbvh.lo_z), sg(pbvh.hi_x),
                   sg(pbvh.hi_y), sg(pbvh.hi_z), sg(pbvh.tri), sg(rays),
                   any_hit, interpret, woop=woop, bs=pbvh.bsize)

    if any_hit:
        return Hit(t=ray.t_max, prim_id=jnp.where(out[0, :R] > 0.5, 0, -1),
                   bary=jnp.zeros((R, 2)))
    t = out[0, :R]
    sid = out[1, :R].astype(jnp.int32)
    miss = (sid < 0) | (t >= ray.t_max)
    pid = jnp.where(miss, -1, pbvh.prim_order[jnp.maximum(sid, 0)])
    uv = jnp.where(miss[:, None], 0.0, out[2:4, :R].T)
    return Hit(t=jnp.where(miss, ray.t_max, t),
               prim_id=pid, bary=uv)


# ---------------------------------------------------------------------------
# Instanced two-level traversal (TLAS over instances -> object-space BLAS)
# ---------------------------------------------------------------------------
# TPU-native equivalent of the reference's instance path: one BLAS per
# unique mesh + a TLAS whose leaves carry per-instance o2w transforms
# (`/root/reference/src/base/shape.h:21-33` InstanceData,
# `base/mgr/geometry.cpp:36-53` build_accel, `mgr/mesh_registry.h:12-38`
# hash-dedup). A mesh used N times stores its bricks ONCE; when a block's
# walk enters a TLAS leaf, the block's rays are transformed into object
# space (12 scalars from SMEM, ~45 VPU ops) and the walk continues in the
# mesh's BLAS. The node table is one concatenated array
# [TLAS | BLAS_0 | BLAS_1 | ...]; stack entries carry (node, instance) so
# popping across instance boundaries re-transforms lazily. t is measured
# with the UNNORMALIZED object-space direction, so world t values compare
# across spaces and `best_t` culls globally (works for any affine o2w).

@struct.dataclass
class InstancedPBVH:
    skip: jnp.ndarray        # [n_nodes] i32 (BLAS links offset-adjusted)
    brick: jnp.ndarray       # [n_nodes] i32: >=0 global brick id;
                             # {-1,-2,-3} inner split axis; <=-4 TLAS leaf
                             # holding instance id i = -4 - brick
    lo_x: jnp.ndarray        # [n_nodes] f32 (TLAS: world; BLAS: object)
    lo_y: jnp.ndarray
    lo_z: jnp.ndarray
    hi_x: jnp.ndarray
    hi_y: jnp.ndarray
    hi_z: jnp.ndarray
    inst_root: jnp.ndarray   # [I] i32 BLAS root node of instance's mesh
    inst_w2o: jnp.ndarray    # [I*12] f32 rows [m00 m01 m02 t0 | m10.. | m20..]
    tri: jnp.ndarray         # [total_bricks*BRICK, 128] f32 (object space)
    prim_order: jnp.ndarray  # [total_bricks*bsize] i32 global OBJECT tri id
    n_nodes: int = struct.field(pytree_node=False)
    n_inst: int = struct.field(pytree_node=False)
    bsize: int = struct.field(pytree_node=False, default=BRICK)


def build_instanced_pbvh(meshes, instances, brick=BRICK):
    """meshes: list of (p0, p1, p2) object-space triangle arrays (one per
    UNIQUE mesh). instances: list of (mesh_id, o2w[4,4] row-vector
    convention: world = p @ m[:3,:3] + m[3,:3]). Returns InstancedPBVH or
    None if the native builder is unavailable."""
    from .. import native
    if not native.available() or not instances:
        return None

    # --- BLAS per unique mesh (shared leaf capacity; grown until the
    # concatenated node arrays fit the SMEM budget) ---
    while True:
        blas = []
        tri_bases = []
        tri_base = 0
        for (p0, p1, p2) in meshes:
            r = native.build_bvh_native(np.asarray(p0, np.float32),
                                        np.asarray(p1, np.float32),
                                        np.asarray(p2, np.float32),
                                        max_leaf=brick)
            if r is None:
                return None
            blas.append(r)
            tri_bases.append(tri_base)
            tri_base += len(p0)
        total_nodes = sum(len(r["first"]) for r in blas)
        if total_nodes <= NODE_CAP or brick >= 1024:
            break
        brick *= 2

    # --- instance world AABBs (transform the 8 corners of the BLAS root) ---
    n_inst = len(instances)
    w_lo = np.zeros((n_inst, 3), np.float32)
    w_hi = np.zeros((n_inst, 3), np.float32)
    w2o_flat = np.zeros((n_inst, 12), np.float32)
    for i, (mid, o2w) in enumerate(instances):
        m = np.asarray(o2w, np.float64)
        r0 = blas[mid]
        lo, hi = r0["lo"][0], r0["hi"][0]
        cs = np.array([[x, y, z] for x in (lo[0], hi[0])
                       for y in (lo[1], hi[1]) for z in (lo[2], hi[2])])
        wc = cs @ m[:3, :3] + m[3, :3]
        w_lo[i] = wc.min(0)
        w_hi[i] = wc.max(0)
        w2o = np.linalg.inv(np.vstack([np.hstack([m[:3, :3],
                                                  np.zeros((3, 1))]),
                                       np.hstack([m[3, :3], [1.0]])]))
        # kernel convention: p_obj = R @ p_world + t (column form); the
        # row-vector inverse gives p_obj = p_w @ w2o[:3,:3] + w2o[3,:3]
        R = w2o[:3, :3].T
        t = w2o[3, :3]
        w2o_flat[i, 0:3] = R[0]
        w2o_flat[i, 3] = t[0]
        w2o_flat[i, 4:7] = R[1]
        w2o_flat[i, 7] = t[1]
        w2o_flat[i, 8:11] = R[2]
        w2o_flat[i, 11] = t[2]

    # --- TLAS over instance boxes (one instance per leaf) ---
    tl = native.build_bvh_boxes_native(w_lo, w_hi, max_leaf=1)
    if tl is None:
        return None
    nt = len(tl["first"])

    # --- concatenate node arrays: [TLAS | BLAS_0 | BLAS_1 | ...] ---
    skips = [tl["skip"].copy()]
    bricks = []
    tb = -(tl["axis"].astype(np.int64) + 1)
    tlv = np.nonzero(tl["count"] > 0)[0]
    inst_of_leaf = tl["order"][tl["first"][tlv]]
    tb[tlv] = -4 - inst_of_leaf.astype(np.int64)
    bricks.append(tb)
    los = [tl["lo"]]
    his = [tl["hi"]]
    node_base = [None] * len(meshes)
    brick_base = [None] * len(meshes)
    tris = []
    prim_orders = []
    base = nt
    bbase = 0
    for mi, r in enumerate(blas):
        node_base[mi] = base
        brick_base[mi] = bbase
        first = r["first"].astype(np.int64)
        count = r["count"].astype(np.int64)
        axis = r["axis"].astype(np.int64)
        order = r["order"].astype(np.int64)
        nn = len(first)
        sk = r["skip"].astype(np.int64)
        sk = np.where(sk >= 0, sk + base, -1)
        skips.append(sk)
        leaves = np.nonzero(count > 0)[0]
        nb = len(leaves)
        bk = -(axis + 1)
        bk[leaves] = bbase + np.arange(nb)
        bricks.append(bk)
        los.append(r["lo"])
        his.append(r["hi"])

        p0, p1, p2 = (np.asarray(a, np.float32) for a in meshes[mi])
        tri = np.zeros((max(nb, 1) * brick, 128), np.float32)
        po = np.full(max(nb, 1) * brick, -1, np.int64)
        if nb:
            f = first[leaves][:, None]
            c = count[leaves][:, None]
            ks = np.arange(brick)[None, :]
            valid = (ks < c).ravel()
            src = np.clip(f + ks, 0, max(len(p0) - 1, 0)).ravel()
            sp0, sp1, sp2 = p0[order], p1[order], p2[order]
            tri[valid, 0:3] = sp0[src[valid]]
            tri[valid, 3:6] = sp1[src[valid]] - sp0[src[valid]]
            tri[valid, 6:9] = sp2[src[valid]] - sp0[src[valid]]
            _fill_woop(tri, valid, sp0, sp1, sp2, src[valid])
            po[valid] = tri_bases[mi] + order[src[valid]]
        tris.append(tri)
        prim_orders.append(po)
        base += nn
        bbase += max(nb, 1)

    assert bbase * brick < (1 << 24), "brick slots exceed f32 exact range"
    inst_root = np.array([node_base[mid] for (mid, _) in instances],
                         np.int32)
    skip = np.concatenate(skips).astype(np.int32)
    brick_arr = np.concatenate(bricks).astype(np.int32)
    lo = np.concatenate(los, 0).astype(np.float32)
    hi = np.concatenate(his, 0).astype(np.float32)
    return InstancedPBVH(
        skip=jnp.asarray(skip), brick=jnp.asarray(brick_arr),
        lo_x=jnp.asarray(lo[:, 0]), lo_y=jnp.asarray(lo[:, 1]),
        lo_z=jnp.asarray(lo[:, 2]),
        hi_x=jnp.asarray(hi[:, 0]), hi_y=jnp.asarray(hi[:, 1]),
        hi_z=jnp.asarray(hi[:, 2]),
        inst_root=jnp.asarray(inst_root),
        inst_w2o=jnp.asarray(w2o_flat.reshape(-1)),
        tri=jnp.asarray(np.concatenate(tris, 0)),
        prim_order=jnp.asarray(np.concatenate(prim_orders).astype(np.int32)),
        n_nodes=int(len(skip)), n_inst=n_inst, bsize=int(brick))


def _inst_closest_kernel(max_steps, n_nodes, bs, woop, skip_ref, brick_ref, lox_ref,
                         loy_ref,
                         loz_ref, hix_ref, hiy_ref, hiz_ref, root_ref,
                         xf_ref, rays_ref, tris_ref, out_ref, best_ref,
                         nstk_ref, istk_ref, cur_ref, tri_scr, sem):
    """Two-level closest hit: TLAS walk in world space, BLAS walks in each
    instance's object space (rays re-transformed lazily on space switches,
    pending sweeps flushed first). `cur_ref` (10, RT) holds the
    current-space rays: rows 0-2 o, 3-5 d, 6-8 1/d."""
    w_ox, w_oy, w_oz, w_dx, w_dy, w_dz, w_ix, w_iy, w_iz, tmax = \
        _ray_rows(rays_ref)
    best_ref[0:1, :] = tmax
    best_ref[1:2, :] = jnp.full((1, RT), -1.0)
    best_ref[2:5, :] = jnp.zeros((3, RT))
    sx = jnp.sum(w_dx) >= 0.0
    sy = jnp.sum(w_dy) >= 0.0
    sz = jnp.sum(w_dz) >= 0.0
    any_live = jnp.max(tmax) > 0.0

    def set_space(inst):
        """Load rays of instance `inst` (-1 = world) into cur_ref."""
        @pl.when(inst < 0)
        def _():
            cur_ref[0:3, :] = rays_ref[0:3, :]
            cur_ref[3:6, :] = rays_ref[3:6, :]
            cur_ref[6:7, :] = w_ix
            cur_ref[7:8, :] = w_iy
            cur_ref[8:9, :] = w_iz

        @pl.when(inst >= 0)
        def _():
            b = inst * 12

            def rcp(v):
                a = jnp.where(jnp.abs(v) > 1e-12, v,
                              jnp.where(v >= 0, 1e-12, -1e-12))
                return 1.0 / a
            for r_ in range(3):
                m0 = xf_ref[b + 4 * r_]
                m1 = xf_ref[b + 4 * r_ + 1]
                m2 = xf_ref[b + 4 * r_ + 2]
                tr = xf_ref[b + 4 * r_ + 3]
                o_ = m0 * w_ox + m1 * w_oy + m2 * w_oz + tr
                d_ = m0 * w_dx + m1 * w_dy + m2 * w_dz
                cur_ref[r_:r_ + 1, :] = o_
                cur_ref[3 + r_:4 + r_, :] = d_
                cur_ref[6 + r_:7 + r_, :] = rcp(d_)

    def rows():
        return (cur_ref[0:1, :], cur_ref[1:2, :], cur_ref[2:3, :],
                cur_ref[3:4, :], cur_ref[4:5, :], cur_ref[5:6, :],
                cur_ref[6:7, :], cur_ref[7:8, :], cur_ref[8:9, :])

    def dma(slot, brick_id):
        return pltpu.make_async_copy(
            tris_ref.at[pl.ds(pl.multiple_of(brick_id * bs, bs),
                              bs), :],
            tri_scr.at[pl.ds(pl.multiple_of(slot * bs, bs), bs), :],
            sem.at[slot])

    def sweep(slot, brick_id, inst):
        dma(slot, brick_id).wait()
        ox, oy, oz, dx, dy, dz, _, _, _ = rows()
        c0 = best_ref[0:1, :]
        c1 = best_ref[1:2, :]
        c2 = best_ref[2:3, :]
        c3 = best_ref[3:4, :]
        c4 = best_ref[4:5, :]
        inst_f = inst.astype(jnp.float32)

        def chunk(k, carry):
            bt_, bi_, bu_, bv_, bn_ = carry
            t, u, v, ok = _isect_chunk(woop, tri_scr, slot * bs + k * TSUB,
                                   ox, oy, oz, dx, dy, dz)
            t = jnp.where(ok, t, _BIG)
            tmin = jnp.min(t, axis=0, keepdims=True)
            gid = (jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
                   + (brick_id * bs + k * TSUB)).astype(jnp.float32)
            imin = jnp.min(jnp.where(t == tmin, gid, _BIG), axis=0,
                           keepdims=True)
            sel = (t == tmin) & (gid == imin)
            usel = jnp.sum(jnp.where(sel, u, 0.0), axis=0, keepdims=True)
            vsel = jnp.sum(jnp.where(sel, v, 0.0), axis=0, keepdims=True)
            better = tmin < bt_
            return (jnp.where(better, tmin, bt_),
                    jnp.where(better, imin, bi_),
                    jnp.where(better, usel, bu_),
                    jnp.where(better, vsel, bv_),
                    jnp.where(better, inst_f, bn_))

        c0, c1, c2, c3, c4 = jax.lax.fori_loop(
            0, bs // TSUB, chunk, (c0, c1, c2, c3, c4))
        best_ref[0:1, :] = c0
        best_ref[1:2, :] = c1
        best_ref[2:3, :] = c2
        best_ref[3:4, :] = c3
        best_ref[4:5, :] = c4

    def enqueue(cond, brick_id, pend, buf, leaves, cur):
        @pl.when(cond)
        def _():
            dma(buf, brick_id).start()

            @pl.when(pend >= 0)
            def _():
                sweep(1 - buf, pend, cur)
        return (jnp.where(cond, brick_id, pend),
                jnp.where(cond, 1 - buf, buf),
                leaves + cond.astype(jnp.int32))

    def body(carry):
        node, ninst, sp, pend, buf, cur, steps, leaves = carry
        # lazy space switch: flush the pending sweep (it belongs to the
        # current space), then re-transform the block's rays
        switch = ninst != cur

        @pl.when(switch)
        def _():
            @pl.when(pend >= 0)
            def _():
                sweep(1 - buf, pend, cur)
            set_space(ninst)
        pend = jnp.where(switch, -1, pend)
        cur = ninst

        code = brick_ref[node]
        is_tri = code >= 0
        is_inst = code <= -4

        # --- node is a triangle leaf (BLAS root of a tiny mesh) ---
        pend, buf, leaves = enqueue(is_tri, code, pend, buf, leaves, cur)

        # --- node is a TLAS instance leaf: jump into its BLAS root ---
        inst_id = -4 - code
        jump = jnp.where(is_inst, root_ref[jnp.maximum(inst_id, 0)], -1)
        jinst = jnp.where(is_inst, inst_id, -1)

        # --- inner node: test both children in the current space ---
        inner = jnp.logical_not(is_tri | is_inst)
        ax = -1 - code
        l = jnp.minimum(node + 1, n_nodes - 1)  # clamp: node may be a leaf
        r = jnp.maximum(skip_ref[l], 0)
        bl = brick_ref[l]
        br = brick_ref[r]
        ox, oy, oz, dx, dy, dz, ix, iy, iz = rows()
        tnear, tfar = _slab2(l, r, lox_ref, loy_ref, loz_ref,
                             hix_ref, hiy_ref, hiz_ref, ox, oy, oz,
                             ix, iy, iz)
        hitm = (tfar >= tnear) & (tnear < best_ref[0:1, :])
        hitL, hitR = _any2(hitm)
        hitL = hitL & inner
        hitR = hitR & inner
        leafL = bl >= 0
        leafR = br >= 0

        pend, buf, leaves = enqueue(hitL & leafL, bl, pend, buf, leaves, cur)
        pend, buf, leaves = enqueue(hitR & leafR, br, pend, buf, leaves, cur)

        dL = hitL & jnp.logical_not(leafL)
        dR = hitR & jnp.logical_not(leafR)
        near_l = jnp.where(ax == 0, sx, jnp.where(ax == 1, sy, sz))
        goN = jnp.where(near_l, l, r)
        goF = jnp.where(near_l, r, l)
        dN = jnp.where(near_l, dL, dR)
        dF = jnp.where(near_l, dR, dL)
        both = dN & dF

        @pl.when(both)
        def _():
            nstk_ref[sp] = goF
            istk_ref[sp] = cur

        sp2 = sp + both.astype(jnp.int32)
        desc = dN | dF
        pop_n = nstk_ref[jnp.maximum(sp2 - 1, 0)]
        pop_i = istk_ref[jnp.maximum(sp2 - 1, 0)]
        can_pop = sp2 > 0
        # priority: instance jump > descend > pop > done
        nxt = jnp.where(is_inst, jump,
                        jnp.where(desc, jnp.where(dN, goN, goF),
                                  jnp.where(can_pop, pop_n, -1)))
        nxti = jnp.where(is_inst, jinst,
                         jnp.where(desc, cur,
                                   jnp.where(can_pop, pop_i, -1)))
        pops = jnp.logical_not(is_inst | desc)
        sp3 = jnp.where(pops, jnp.maximum(sp2 - 1, 0), sp2)
        return nxt, nxti, sp3, pend, buf, cur, steps + 1, leaves

    set_space(jnp.int32(-1))
    node0 = jnp.where(any_live, 0, -1)
    (_, _, _, pend, buf, cur, steps, leaves) = jax.lax.while_loop(
        lambda c: (c[0] >= 0) & (c[6] < max_steps), body,
        (node0, jnp.int32(-1), jnp.int32(0), jnp.int32(-1), jnp.int32(0),
         jnp.int32(-1), jnp.int32(0), jnp.int32(0)))

    @pl.when(pend >= 0)
    def _():
        sweep(1 - buf, pend, cur)

    out_ref[0:5, :] = best_ref[0:5, :]
    out_ref[5:6, :] = jnp.full((1, RT), 1.0) * steps.astype(jnp.float32)
    out_ref[6:7, :] = jnp.full((1, RT), 1.0) * leaves.astype(jnp.float32)
    out_ref[7:8, :] = jnp.zeros((1, RT))


def _inst_anyhit_kernel(max_steps, n_nodes, bs, woop, skip_ref, brick_ref, lox_ref,
                        loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
                        root_ref, xf_ref, rays_ref, tris_ref, out_ref,
                        occ_ref, nstk_ref, istk_ref, cur_ref, tri_scr, sem):
    w_ox, w_oy, w_oz, w_dx, w_dy, w_dz, w_ix, w_iy, w_iz, tmax = \
        _ray_rows(rays_ref)
    occ_ref[0:1, :] = jnp.zeros((1, RT))
    dead = jnp.where(tmax <= 0.0, 1.0, 0.0)
    sx = jnp.sum(w_dx) >= 0.0
    sy = jnp.sum(w_dy) >= 0.0
    sz = jnp.sum(w_dz) >= 0.0
    any_live = jnp.max(tmax) > 0.0

    def set_space(inst):
        @pl.when(inst < 0)
        def _():
            cur_ref[0:3, :] = rays_ref[0:3, :]
            cur_ref[3:6, :] = rays_ref[3:6, :]
            cur_ref[6:7, :] = w_ix
            cur_ref[7:8, :] = w_iy
            cur_ref[8:9, :] = w_iz

        @pl.when(inst >= 0)
        def _():
            b = inst * 12

            def rcp(v):
                a = jnp.where(jnp.abs(v) > 1e-12, v,
                              jnp.where(v >= 0, 1e-12, -1e-12))
                return 1.0 / a
            for r_ in range(3):
                m0 = xf_ref[b + 4 * r_]
                m1 = xf_ref[b + 4 * r_ + 1]
                m2 = xf_ref[b + 4 * r_ + 2]
                tr = xf_ref[b + 4 * r_ + 3]
                o_ = m0 * w_ox + m1 * w_oy + m2 * w_oz + tr
                d_ = m0 * w_dx + m1 * w_dy + m2 * w_dz
                cur_ref[r_:r_ + 1, :] = o_
                cur_ref[3 + r_:4 + r_, :] = d_
                cur_ref[6 + r_:7 + r_, :] = rcp(d_)

    def rows():
        return (cur_ref[0:1, :], cur_ref[1:2, :], cur_ref[2:3, :],
                cur_ref[3:4, :], cur_ref[4:5, :], cur_ref[5:6, :],
                cur_ref[6:7, :], cur_ref[7:8, :], cur_ref[8:9, :])

    def dma(slot, brick_id):
        return pltpu.make_async_copy(
            tris_ref.at[pl.ds(pl.multiple_of(brick_id * bs, bs),
                              bs), :],
            tri_scr.at[pl.ds(pl.multiple_of(slot * bs, bs), bs), :],
            sem.at[slot])

    def sweep(slot, brick_id):
        dma(slot, brick_id).wait()
        ox, oy, oz, dx, dy, dz, _, _, _ = rows()

        def chunk(k, o):
            t, u, v, ok = _isect_chunk(woop, tri_scr, slot * bs + k * TSUB,
                                   ox, oy, oz, dx, dy, dz)
            hit = jnp.max(jnp.where(ok & (t < tmax), 1.0, 0.0),
                          axis=0, keepdims=True)
            return jnp.maximum(o, hit)

        occ_ref[0:1, :] = jax.lax.fori_loop(
            0, bs // TSUB, chunk, occ_ref[0:1, :])

    def enqueue(cond, brick_id, pend, buf, leaves):
        @pl.when(cond)
        def _():
            dma(buf, brick_id).start()

            @pl.when(pend >= 0)
            def _():
                sweep(1 - buf, pend)
        return (jnp.where(cond, brick_id, pend),
                jnp.where(cond, 1 - buf, buf),
                leaves + cond.astype(jnp.int32))

    def body(carry):
        node, ninst, sp, pend, buf, cur, steps, leaves = carry
        switch = ninst != cur

        @pl.when(switch)
        def _():
            @pl.when(pend >= 0)
            def _():
                sweep(1 - buf, pend)
            set_space(ninst)
        pend = jnp.where(switch, -1, pend)
        cur = ninst

        code = brick_ref[node]
        is_tri = code >= 0
        is_inst = code <= -4

        did0 = is_tri
        pend, buf, leaves = enqueue(is_tri, code, pend, buf, leaves)

        inst_id = -4 - code
        jump = jnp.where(is_inst, root_ref[jnp.maximum(inst_id, 0)], -1)
        jinst = jnp.where(is_inst, inst_id, -1)

        inner = jnp.logical_not(is_tri | is_inst)
        ax = -1 - code
        l = jnp.minimum(node + 1, n_nodes - 1)
        r = jnp.maximum(skip_ref[l], 0)
        bl = brick_ref[l]
        br = brick_ref[r]
        ox, oy, oz, dx, dy, dz, ix, iy, iz = rows()
        live = (occ_ref[0:1, :] < 0.5) & (tmax > 0.0)
        tnear, tfar = _slab2(l, r, lox_ref, loy_ref, loz_ref,
                             hix_ref, hiy_ref, hiz_ref, ox, oy, oz,
                             ix, iy, iz)
        hitm = (tfar >= tnear) & (tnear < tmax) & live
        hitL, hitR = _any2(hitm)
        hitL = hitL & inner
        hitR = hitR & inner
        leafL = bl >= 0
        leafR = br >= 0

        did = did0 | (hitL & leafL) | (hitR & leafR)
        pend, buf, leaves = enqueue(hitL & leafL, bl, pend, buf, leaves)
        pend, buf, leaves = enqueue(hitR & leafR, br, pend, buf, leaves)

        dL = hitL & jnp.logical_not(leafL)
        dR = hitR & jnp.logical_not(leafR)
        near_l = jnp.where(ax == 0, sx, jnp.where(ax == 1, sy, sz))
        goN = jnp.where(near_l, l, r)
        goF = jnp.where(near_l, r, l)
        dN = jnp.where(near_l, dL, dR)
        dF = jnp.where(near_l, dR, dL)
        both = dN & dF

        @pl.when(both)
        def _():
            nstk_ref[sp] = goF
            istk_ref[sp] = cur

        sp2 = sp + both.astype(jnp.int32)
        desc = dN | dF
        pop_n = nstk_ref[jnp.maximum(sp2 - 1, 0)]
        pop_i = istk_ref[jnp.maximum(sp2 - 1, 0)]
        can_pop = sp2 > 0
        nxt = jnp.where(is_inst, jump,
                        jnp.where(desc, jnp.where(dN, goN, goF),
                                  jnp.where(can_pop, pop_n, -1)))
        nxti = jnp.where(is_inst, jinst,
                         jnp.where(desc, cur,
                                   jnp.where(can_pop, pop_i, -1)))
        pops = jnp.logical_not(is_inst | desc)
        sp3 = jnp.where(pops, jnp.maximum(sp2 - 1, 0), sp2)
        all_occ = did & (jnp.min(jnp.maximum(occ_ref[0:1, :], dead)) > 0.5)
        nxt = jnp.where(all_occ, -1, nxt)
        return nxt, nxti, sp3, pend, buf, cur, steps + 1, leaves

    set_space(jnp.int32(-1))
    node0 = jnp.where(any_live, 0, -1)
    (_, _, _, pend, buf, cur, steps, leaves) = jax.lax.while_loop(
        lambda c: (c[0] >= 0) & (c[6] < max_steps), body,
        (node0, jnp.int32(-1), jnp.int32(0), jnp.int32(-1), jnp.int32(0),
         jnp.int32(-1), jnp.int32(0), jnp.int32(0)))

    @pl.when(pend >= 0)
    def _():
        sweep(1 - buf, pend)

    out_ref[0:1, :] = occ_ref[0:1, :]
    out_ref[5:6, :] = jnp.full((1, RT), 1.0) * steps.astype(jnp.float32)
    out_ref[6:7, :] = jnp.full((1, RT), 1.0) * leaves.astype(jnp.float32)
    out_ref[1:5, :] = jnp.zeros((4, RT))
    out_ref[7:8, :] = jnp.zeros((1, RT))


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret",
                                             "woop", "bs"))
def _run_inst(skip, brick, lox, loy, loz, hix, hiy, hiz, root, xf, tri,
              rays, any_hit, interpret, woop=False, bs=BRICK):
    Rp = rays.shape[1]
    n_nodes = skip.shape[0]
    # each inner node expands once; instance entries add one step each;
    # 3x covers both plus slack
    max_steps = 3 * n_nodes + 64
    kern = _inst_anyhit_kernel if any_hit else _inst_closest_kernel
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(Rp // RT,),
        in_specs=[
            pl.BlockSpec((8, RT), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, RT), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, RT), jnp.float32),
            pltpu.SMEM((STACK,), jnp.int32),
            pltpu.SMEM((STACK,), jnp.int32),
            pltpu.VMEM((10, RT), jnp.float32),
            pltpu.VMEM((2 * bs, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(kern, max_steps, n_nodes, bs, woop),
        out_shape=jax.ShapeDtypeStruct((8, Rp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(skip, brick, lox, loy, loz, hix, hiy, hiz, root, xf, rays, tri)


def intersect_packet_inst(ray, ip, any_hit=False, interpret=False):
    """Trace a wavefront against an InstancedPBVH. Returns (Hit, inst)
    where Hit.prim_id is the global OBJECT-space triangle id and inst the
    winning instance (-1 on miss)."""
    sg = jax.lax.stop_gradient
    R = ray.origin.shape[0]
    Rp = _round_up(max(R, 1), RT)
    rays = jnp.zeros((8, Rp), jnp.float32)
    rays = rays.at[0:3, :R].set(ray.origin.T)
    rays = rays.at[3:6, :R].set(ray.direction.T)
    rays = rays.at[6, :R].set(ray.t_max)

    import os
    out = _run_inst(sg(ip.skip), sg(ip.brick), sg(ip.lo_x), sg(ip.lo_y),
                    sg(ip.lo_z), sg(ip.hi_x), sg(ip.hi_y), sg(ip.hi_z),
                    sg(ip.inst_root), sg(ip.inst_w2o), sg(ip.tri), sg(rays),
                    any_hit, interpret,
                    woop=os.environ.get("VT_WOOP", "0") == "1",
                    bs=ip.bsize)

    if any_hit:
        hit = Hit(t=ray.t_max, prim_id=jnp.where(out[0, :R] > 0.5, 0, -1),
                  bary=jnp.zeros((R, 2)))
        return hit, jnp.full((R,), -1, jnp.int32)
    t = out[0, :R]
    sid = out[1, :R].astype(jnp.int32)
    miss = (sid < 0) | (t >= ray.t_max)
    pid = jnp.where(miss, -1, ip.prim_order[jnp.maximum(sid, 0)])
    uv = jnp.where(miss[:, None], 0.0, out[2:4, :R].T)
    inst = jnp.where(miss, -1, out[4, :R].astype(jnp.int32))
    return Hit(t=jnp.where(miss, ray.t_max, t), prim_id=pid, bary=uv), inst


# ---------------------------------------------------------------------------
# Kernel v3: windowed walk over per-octant preorder tables
# ---------------------------------------------------------------------------
# The v2 stack walk pays one vector->scalar sync per INNER NODE (~0.5us,
# ~85% of a step; the slab math itself is ~57ns). v3 removes the stack
# entirely: each direction octant gets its own preorder layout with the
# near child emitted first (front-to-back is baked into the skip links),
# so the walk is again a pure skip-link scan — but over a layout where 8
# CONSECUTIVE preorder nodes can be slab-tested in one (8, RT) VPU pass
# and their hit bits read back as ONE packed scalar. The scalar unit then
# walks up to 8 decisions per sync. Node AABBs live in a VMEM table DMA'd
# once per block (octant-selected), so window loads are cheap vector
# reads; only the link array stays in SMEM.

def _win_kernel3(max_steps, n_real, n_pad, shift, any_hit, bs, woop, link_ref,
                 rays_ref, aabb_ref, tris_ref, out_ref, best_ref, node_scr,
                 tri_scr, sem, sem_n):
    ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax = _ray_rows(rays_ref)
    if any_hit:
        best_ref[0:1, :] = jnp.zeros((1, RT))        # occlusion flags
        dead = jnp.where(tmax <= 0.0, 1.0, 0.0)
    else:
        best_ref[0:1, :] = tmax
        best_ref[1:2, :] = jnp.full((1, RT), -1.0)
        best_ref[2:4, :] = jnp.zeros((2, RT))
    sx = jnp.sum(dx) >= 0.0
    sy = jnp.sum(dy) >= 0.0
    sz = jnp.sum(dz) >= 0.0
    oct_ = (jnp.where(sx, 4, 0) + jnp.where(sy, 2, 0)
            + jnp.where(sz, 1, 0)).astype(jnp.int32)
    base = oct_ * n_pad
    any_live = jnp.max(tmax) > 0.0

    @pl.when(any_live)
    def _():
        pltpu.make_async_copy(
            aabb_ref.at[pl.ds(pl.multiple_of(base, 8), n_pad), :],
            node_scr, sem_n).start()

    def dma(slot, brick_id):
        return pltpu.make_async_copy(
            tris_ref.at[pl.ds(pl.multiple_of(brick_id * bs, bs),
                              bs), :],
            tri_scr.at[pl.ds(pl.multiple_of(slot * bs, bs), bs), :],
            sem.at[slot])

    def sweep(slot, brick_id):
        dma(slot, brick_id).wait()
        if any_hit:
            def chunk(k, o):
                t, u, v, ok = _isect_chunk(woop, tri_scr, slot * bs + k * TSUB,
                                       ox, oy, oz, dx, dy, dz)
                hit = jnp.max(jnp.where(ok & (t < tmax), 1.0, 0.0),
                              axis=0, keepdims=True)
                return jnp.maximum(o, hit)

            best_ref[0:1, :] = jax.lax.fori_loop(
                0, bs // TSUB, chunk, best_ref[0:1, :])
            return
        c0 = best_ref[0:1, :]
        c1 = best_ref[1:2, :]
        c2 = best_ref[2:3, :]
        c3 = best_ref[3:4, :]

        def chunk(k, carry):
            bt_, bi_, bu_, bv_ = carry
            t, u, v, ok = _isect_chunk(woop, tri_scr, slot * bs + k * TSUB,
                                   ox, oy, oz, dx, dy, dz)
            t = jnp.where(ok, t, _BIG)
            tmin = jnp.min(t, axis=0, keepdims=True)
            gid = (jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
                   + (brick_id * bs + k * TSUB)).astype(jnp.float32)
            imin = jnp.min(jnp.where(t == tmin, gid, _BIG), axis=0,
                           keepdims=True)
            sel = (t == tmin) & (gid == imin)
            usel = jnp.sum(jnp.where(sel, u, 0.0), axis=0, keepdims=True)
            vsel = jnp.sum(jnp.where(sel, v, 0.0), axis=0, keepdims=True)
            better = tmin < bt_
            return (jnp.where(better, tmin, bt_),
                    jnp.where(better, imin, bi_),
                    jnp.where(better, usel, bu_),
                    jnp.where(better, vsel, bv_))

        c0, c1, c2, c3 = jax.lax.fori_loop(
            0, bs // TSUB, chunk, (c0, c1, c2, c3))
        best_ref[0:1, :] = c0
        best_ref[1:2, :] = c1
        best_ref[2:3, :] = c2
        best_ref[3:4, :] = c3

    def enqueue(cond, brick_id, pend, buf, leaves):
        @pl.when(cond)
        def _():
            dma(buf, brick_id).start()

            @pl.when(pend >= 0)
            def _():
                sweep(1 - buf, pend)
        return (jnp.where(cond, brick_id, pend),
                jnp.where(cond, 1 - buf, buf),
                leaves + cond.astype(jnp.int32))

    # Mosaic iota is integer-only; 2^row weights via a vector shift
    w8 = (jnp.int32(1) << jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
          ).astype(jnp.float32)

    def window(carry):
        j, pend, buf, steps, leaves = carry
        w = (j // 8) * 8
        rows = node_scr[pl.ds(pl.multiple_of(w, 8), 8), 0:6]
        lo0 = rows[:, 0:1]
        lo1 = rows[:, 1:2]
        lo2 = rows[:, 2:3]
        hi0 = rows[:, 3:4]
        hi1 = rows[:, 4:5]
        hi2 = rows[:, 5:6]
        ax_ = (lo0 - ox) * ix
        bx_ = (hi0 - ox) * ix
        ay_ = (lo1 - oy) * iy
        by_ = (hi1 - oy) * iy
        az_ = (lo2 - oz) * iz
        bz_ = (hi2 - oz) * iz
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(ax_, bx_), jnp.minimum(ay_, by_)),
            jnp.maximum(jnp.minimum(az_, bz_), 0.0))
        tfar = jnp.minimum(jnp.minimum(jnp.maximum(ax_, bx_),
                                       jnp.maximum(ay_, by_)),
                           jnp.maximum(az_, bz_))
        if any_hit:
            live = (best_ref[0:1, :] < 0.5) & (tmax > 0.0)
            hitm = (tfar >= tnear) & (tnear < tmax) & live
            done_v = jnp.min(jnp.maximum(best_ref[0:1, :], dead))
        else:
            hitm = (tfar >= tnear) & (tnear < best_ref[0:1, :])
            done_v = jnp.float32(0.0)
        hb = jnp.max(jnp.where(hitm, w8, 0.0), axis=1, keepdims=True)
        bits_f = jnp.sum(hb) + jnp.where(done_v > 0.5, 256.0, 0.0)
        bits = bits_f.astype(jnp.int32)   # ONE scalar sync per window
        all_done = bits >= 256

        def inner(c):
            j2, pend, buf, leaves = c
            link = link_ref[base + j2]
            br = (link & ((1 << shift) - 1)) - 4
            sk = link >> shift
            h = ((bits >> (j2 - w)) & 1) == 1
            is_leaf = br >= 0
            pend, buf, leaves = enqueue(h & is_leaf, br, pend, buf, leaves)
            j2 = jnp.where(h & jnp.logical_not(is_leaf), j2 + 1, sk)
            return j2, pend, buf, leaves

        j2, pend, buf, leaves = jax.lax.while_loop(
            lambda c: (c[0] < w + 8) & (c[0] < n_real), inner,
            (j, pend, buf, leaves))
        j2 = jnp.where(all_done, n_pad, j2)
        return j2, pend, buf, steps + 1, leaves

    @pl.when(any_live)
    def _():
        pltpu.make_async_copy(
            aabb_ref.at[pl.ds(pl.multiple_of(base, 8), n_pad), :],
            node_scr, sem_n).wait()

    j0 = jnp.where(any_live, 0, n_pad)
    _, pend, buf, steps, leaves = jax.lax.while_loop(
        lambda c: (c[0] < n_real) & (c[3] < max_steps), window,
        (j0, jnp.int32(-1), jnp.int32(0), jnp.int32(0), jnp.int32(0)))

    @pl.when(pend >= 0)
    def _():
        sweep(1 - buf, pend)

    if any_hit:
        out_ref[0:1, :] = best_ref[0:1, :]
        out_ref[1:4, :] = jnp.zeros((3, RT))
    else:
        out_ref[0:4, :] = best_ref[0:4, :]
    out_ref[4:5, :] = jnp.full((1, RT), 1.0) * steps.astype(jnp.float32)
    out_ref[5:6, :] = jnp.full((1, RT), 1.0) * leaves.astype(jnp.float32)
    out_ref[6:8, :] = jnp.zeros((2, RT))


@functools.partial(jax.jit, static_argnames=("n_real", "n_pad", "shift",
                                             "any_hit", "interpret",
                                             "woop", "bs"))
def _run3(link8, aabb8, tri, rays, n_real, n_pad, shift, any_hit,
          interpret, woop=False, bs=BRICK):
    Rp = rays.shape[1]
    # every preorder node is visited at most once; each window resolves
    # >= 1 node
    max_steps = n_real + 64
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Rp // RT,),
        in_specs=[
            pl.BlockSpec((8, RT), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, RT), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, RT), jnp.float32),
            pltpu.VMEM((n_pad, 128), jnp.float32),
            pltpu.VMEM((2 * bs, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_win_kernel3, max_steps, n_real, n_pad, shift,
                          any_hit, bs, woop),
        out_shape=jax.ShapeDtypeStruct((8, Rp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(link8, rays, aabb8, tri)
