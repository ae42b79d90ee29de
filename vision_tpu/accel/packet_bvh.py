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
BRICK = 64      # max triangles per leaf brick
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
    prim_order: jnp.ndarray  # [n_bricks*BRICK] i32 original tri id (-1 pad)
    n_nodes: int = struct.field(pytree_node=False)


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
    r = native.build_bvh_native(p0, p1, p2, max_leaf=brick)
    if r is None:
        return None
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
        prim_order[valid] = order[src[valid]]

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
    )


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


def _closest_kernel(max_steps, skip_ref, brick_ref, lox_ref, loy_ref,
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
            tris_ref.at[pl.ds(pl.multiple_of(brick_id * BRICK, BRICK),
                              BRICK), :],
            tri_scr.at[pl.ds(pl.multiple_of(slot * BRICK, BRICK), BRICK), :],
            sem.at[slot])

    def sweep(slot, brick_id):
        dma(slot, brick_id).wait()
        c0 = best_ref[0:1, :]
        c1 = best_ref[1:2, :]
        c2 = best_ref[2:3, :]
        c3 = best_ref[3:4, :]

        def chunk(k, carry):
            bt_, bi_, bu_, bv_ = carry
            t, u, v, ok = _mt_rows(tri_scr, slot * BRICK + k * TSUB,
                                   ox, oy, oz, dx, dy, dz)
            t = jnp.where(ok, t, _BIG)
            tmin = jnp.min(t, axis=0, keepdims=True)
            gid = (jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
                   + (brick_id * BRICK + k * TSUB)).astype(jnp.float32)
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
            0, BRICK // TSUB, chunk, (c0, c1, c2, c3))
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


def _anyhit_kernel(max_steps, skip_ref, brick_ref, lox_ref, loy_ref,
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
            tris_ref.at[pl.ds(pl.multiple_of(brick_id * BRICK, BRICK),
                              BRICK), :],
            tri_scr.at[pl.ds(pl.multiple_of(slot * BRICK, BRICK), BRICK), :],
            sem.at[slot])

    def sweep(slot, brick_id):
        dma(slot, brick_id).wait()

        def chunk(k, o):
            t, u, v, ok = _mt_rows(tri_scr, slot * BRICK + k * TSUB,
                                   ox, oy, oz, dx, dy, dz)
            hit = jnp.max(jnp.where(ok & (t < tmax), 1.0, 0.0),
                          axis=0, keepdims=True)
            return jnp.maximum(o, hit)

        occ_ref[0:1, :] = jax.lax.fori_loop(
            0, BRICK // TSUB, chunk, occ_ref[0:1, :])

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


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _run(skip, brick, lox, loy, loz, hix, hiy, hiz, tri, rays,
         any_hit, interpret):
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
            pltpu.VMEM((2 * BRICK, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(kern, max_steps),
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

    out = _run(sg(pbvh.skip), sg(pbvh.brick), sg(pbvh.lo_x), sg(pbvh.lo_y),
               sg(pbvh.lo_z), sg(pbvh.hi_x), sg(pbvh.hi_y), sg(pbvh.hi_z),
               sg(pbvh.tri), sg(rays), any_hit, interpret)

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
