"""Pallas TPU packet-traversal kernel — the production traversal path.

Why a kernel: the XLA formulations (`trace.traverse`, per-ray stacks, and
`trace_packet.traverse_packets`, shared-stack packets) both pay multi-µs fixed
cost per `lax.while_loop` step because every step is a chain of separate TPU
ops; a BVH traversal takes hundreds-to-thousands of steps, so step overhead
dominates by 100×.  Here the whole DFS runs inside one Pallas program: the
shared packet stack is an SMEM scratch array, node/triangle tables sit in
VMEM, node fetches are scalar loads, and every per-ray operation is dense
(8, 128)-register math.  A step costs ~100 ns instead of ~20 µs.

Semantics are identical to `trace_packet` (and therefore to the reference's
per-pixel DFS, Raytracing.compute:129-176): pop → slab-test packet vs node →
left child push-or-intersect → right child push-or-intersect, strict-<
acceptance; packet over-visits cannot change any ray's result (box-inclusion
monotonicity — see trace_packet module docstring).

Table layout: VMEM tiles are (8, 128) f32, so a naive (cap, 9)-column table
pads each row to 128 lanes — 16x wasted VMEM (the whole budget is ~16 MB/core).
Instead each table packs 8 records per 128-lane row (16 f32 slots per record);
a record fetch is a dynamic-sublane access with the lane base made static by an
8-way ``lax.switch`` on ``k % 8``.  Child/triangle indices are stored as exact
f32 (capacity < 2^24) so no bitcasting is needed in-kernel.

Capacity: both tables together cost 128 B per element → ≤ ~100K triangles per
kernel launch within VMEM.  Larger scenes use the sharded path
(parallel/dist.py) or the XLA fallback until the HBM-resident variant lands.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unitysimpleraytracing_tpu import constants as C
from unitysimpleraytracing_tpu.core.types import Bvh, HitRecord, Scene

PACKET = 1024  # rays per packet: one (8, 128) f32 register per component
_SUB, _LANE = 8, 128


_SLOTS = 16          # f32 slots per packed record
_PACK = 128 // _SLOTS  # 8 records per 128-lane row


@functools.partial(jax.jit, static_argnames=())
def pack_tables(scene: Scene, bvh: Bvh):
    """Flatten scene+BVH into two packed kernel tables, (cap/8, 128) f32 each.

    Record k lives at row k//8, lanes (k%8)*16 .. +15.

    nodes slots: [bmin.xyz, bmax.xyz, left_idx, right_idx, flags, 0*7] where
        *_idx is the child node id for internal children and the TRIANGLE id
        (sorted_tri[leaf]) for leaf children — the leaf indirection
        (Raytracing.compute:156,172) is pre-resolved; flags bit0/bit1 =
        left/right child is leaf.  Indices/flags stored as exact f32.
    tris slots:  [a.xyz, b.xyz, c.xyz, bmin.xyz, bmax.xyz, 0]
    """
    cap = bvh.capacity
    assert cap % _PACK == 0
    nodes = jnp.zeros((cap, _SLOTS), jnp.float32)
    nodes = nodes.at[:, 0:3].set(bvh.node_aabb_min)
    nodes = nodes.at[:, 3:6].set(bvh.node_aabb_max)

    lc = jnp.clip(bvh.left, 0, cap - 1)
    rc = jnp.clip(bvh.right, 0, cap - 1)
    left_idx = jnp.where(bvh.left_is_leaf, bvh.sorted_tri[lc], lc)
    right_idx = jnp.where(bvh.right_is_leaf, bvh.sorted_tri[rc], rc)
    flags = bvh.left_is_leaf.astype(jnp.int32) | (
        bvh.right_is_leaf.astype(jnp.int32) << 1
    )
    nodes = nodes.at[:, 6].set(left_idx.astype(jnp.float32))
    nodes = nodes.at[:, 7].set(right_idx.astype(jnp.float32))
    nodes = nodes.at[:, 8].set(flags.astype(jnp.float32))

    t = scene.triangles
    tris = jnp.zeros((cap, _SLOTS), jnp.float32)
    tris = tris.at[:, 0:3].set(t.a)
    tris = tris.at[:, 3:6].set(t.b)
    tris = tris.at[:, 6:9].set(t.c)
    tris = tris.at[:, 9:12].set(scene.aabb_min)
    tris = tris.at[:, 12:15].set(scene.aabb_max)
    return (
        nodes.reshape(cap // _PACK, 128),
        tris.reshape(cap // _PACK, 128),
    )


def _d3d_min(a, b):
    return jnp.where(jnp.isnan(a), b, jnp.where(jnp.isnan(b), a, jnp.minimum(a, b)))


def _d3d_max(a, b):
    return jnp.where(jnp.isnan(a), b, jnp.where(jnp.isnan(b), a, jnp.maximum(a, b)))


def _fetch(tab, k, count):
    """Read ``count`` scalar slots of packed record ``k``: dynamic sublane row,
    lane base made static via an 8-way switch on k % 8."""
    r = k // _PACK

    def make(j):
        def branch(_):
            return tuple(tab[r, j * _SLOTS + c] for c in range(count))

        return branch

    return jax.lax.switch(k % _PACK, [make(j) for j in range(_PACK)], None)


def _kernel(nodes, tris, rays, out, stack):
    """One grid program = one packet of PACKET rays."""
    shape = (_SUB, _LANE)

    def row(k):
        return rays[0, k].reshape(shape)

    ox, oy, oz = row(0), row(1), row(2)
    dx, dy, dz = row(3), row(4), row(5)
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz

    def slab(bminx, bminy, bminz, bmaxx, bmaxy, bmaxz):
        t1x = (bminx - ox) * ix
        t2x = (bmaxx - ox) * ix
        t1y = (bminy - oy) * iy
        t2y = (bmaxy - oy) * iy
        t1z = (bminz - oz) * iz
        t2z = (bmaxz - oz) * iz
        tmin = _d3d_max(
            _d3d_min(t1x, t2x), _d3d_max(_d3d_min(t1y, t2y), _d3d_min(t1z, t2z))
        )
        tmax = _d3d_min(
            _d3d_max(t1x, t2x), _d3d_min(_d3d_max(t1y, t2y), _d3d_max(t1z, t2z))
        )
        return (tmax > tmin) & (tmax > 0)

    def leaf_test(tri_idx, gate, state):
        t_cur, tri_cur, u_cur, v_cur = state
        (ax, ay, az, bx, by, bz, cx, cy, cz,
         bmnx, bmny, bmnz, bmxx, bmxy, bmxz) = _fetch(tris, tri_idx, 15)
        box_ok = slab(bmnx, bmny, bmnz, bmxx, bmxy, bmxz)
        e1x, e1y, e1z = bx - ax, by - ay, bz - az
        e2x, e2y, e2z = cx - ax, cy - ay, cz - az
        # pvec = dir × e2 (scalars broadcast against ray registers)
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = 1.0 / det
        tvx, tvy, tvz = ox - ax, oy - ay, oz - az
        u = (tvx * px + tvy * py + tvz * pz) * inv_det
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t_new = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        reject = (
            ((det < 1e-8) & (det > -1e-8))
            | ((u < 0) | (u > 1))
            | ((v < 0) | (u + v > 1))
        )
        t_new = jnp.where(reject, jnp.float32(C.MAX_FLOAT), t_new)
        accept = gate & box_ok & (t_new < t_cur)
        return (
            jnp.where(accept, t_new, t_cur),
            jnp.where(accept, tri_idx, tri_cur),
            jnp.where(accept, u, u_cur),
            jnp.where(accept, v, v_cur),
        )

    stack[0] = 0

    def cond(carry):
        sp, *_ = carry
        return sp > 0

    def body(carry):
        sp, t, tri, u, v = carry
        sp = sp - 1
        node = stack[sp]

        (nx0, ny0, nz0, nx1, ny1, nz1, lf, rf, ff) = _fetch(nodes, node, 9)
        hit = slab(nx0, ny0, nz0, nx1, ny1, nz1)
        any_hit = jnp.any(hit)
        gate = hit & any_hit

        left_idx = lf.astype(jnp.int32)
        right_idx = rf.astype(jnp.int32)
        flags = ff.astype(jnp.int32)
        lleaf = (flags & 1) == 1
        rleaf = (flags & 2) == 2

        # Left child: push internal / intersect leaf. A write above the live
        # top is harmless when sp doesn't advance.
        stack[sp] = left_idx
        sp = sp + jnp.where(any_hit & ~lleaf, 1, 0)
        t, tri, u, v = jax.lax.cond(
            any_hit & lleaf,
            lambda s: leaf_test(left_idx, gate, s),
            lambda s: s,
            (t, tri, u, v),
        )

        stack[sp] = right_idx
        sp = sp + jnp.where(any_hit & ~rleaf, 1, 0)
        t, tri, u, v = jax.lax.cond(
            any_hit & rleaf,
            lambda s: leaf_test(right_idx, gate, s),
            lambda s: s,
            (t, tri, u, v),
        )
        return sp, t, tri, u, v

    t0 = jnp.full(shape, C.MAX_FLOAT, jnp.float32)
    tri0 = jnp.zeros(shape, jnp.int32)
    z = jnp.zeros(shape, jnp.float32)
    _, t, tri, u, v = jax.lax.while_loop(
        cond, body, (jnp.int32(1), t0, tri0, z, z)
    )

    out[0, 0] = t.reshape(PACKET)
    out[0, 1] = pltpu.bitcast(tri, jnp.float32).reshape(PACKET)
    out[0, 2] = u.reshape(PACKET)
    out[0, 3] = v.reshape(PACKET)


@functools.lru_cache(maxsize=64)
def _traversal_fn(T: int, cap: int, interpret: bool):
    """Build + cache the jitted kernel wrapper for a (packets, capacity) shape."""

    rows = cap // _PACK
    call = pl.pallas_call(
        _kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, PACKET), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, PACKET), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, 4, PACKET), jnp.float32),
        scratch_shapes=[pltpu.SMEM((C.TRAVERSAL_STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
    )

    @jax.jit
    def run(nodes, tris, origins, dirs):
        R = T * PACKET
        rays = jnp.concatenate(
            [origins.T, dirs.T, jnp.zeros((2, R), jnp.float32)], axis=0
        )  # (8, R)
        rays = rays.reshape(8, T, PACKET).transpose(1, 0, 2)  # (T, 8, PACKET)
        out = call(nodes, tris, rays)
        out = out.transpose(1, 0, 2).reshape(4, R)
        tri = jax.lax.bitcast_convert_type(out[1], jnp.int32)
        return out[0], tri, out[2], out[3]

    return run


def traverse_packets_pallas(
    scene: Scene,
    bvh: Bvh,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    interpret: bool = False,
) -> HitRecord:
    """Kernel-based nearest-hit traversal over (R, 3) rays.

    R must be a multiple of PACKET (1024); order rays coherently
    (`trace_packet.tiled_ray_order`).  Bit-compatible with `trace.traverse`.
    """
    R = origins.shape[0]
    assert R % PACKET == 0, f"{R} rays not divisible by {PACKET}"
    T = R // PACKET
    nodes, tris = pack_tables(scene, bvh)
    run = _traversal_fn(T, bvh.capacity, interpret)
    t, tri, u, v = run(nodes, tris, origins, dirs)
    return HitRecord(t=t, tri=tri, u=u, v=v)
