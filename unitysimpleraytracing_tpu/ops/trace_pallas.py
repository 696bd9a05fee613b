"""Pallas TPU packet-traversal kernel — the production traversal path.

Why a kernel: the XLA formulations (`trace.traverse`, per-ray stacks, and
`trace_packet.traverse_packets`, shared-stack packets) both pay multi-µs fixed
cost per `lax.while_loop` step because every step is a chain of separate TPU
ops; a BVH traversal takes hundreds-to-thousands of steps, so step overhead
dominates by 100×.  Here the whole DFS runs inside one Pallas program: the
shared packet stack is an SMEM scratch array, node/triangle tables sit in
VMEM, node fetches are scalar loads, and every per-ray operation is dense
(8, 128)-register math.

Traversal scheme (child-pair DFS with ordering + culling): each popped node
record carries BOTH children's AABBs; the packet slab-tests the two child
boxes, intersects leaf children in place, and pushes internal children
far-then-near (packet majority vote on slab tmin), so the near subtree is
explored first.  Two exact refinements over the reference's blind DFS
(Raytracing.compute:129-176):

- **t-culling**: a child is live for a ray only when its slab entry distance
  satisfies ``tmin < t_cur``.  Any triangle inside the child box hits at
  ``t >= tmin`` (the hit point lies in the box, and triangle AABBs are
  inflated by 1e-3 — MeshBufferContainer.cs:55-63 — which dwarfs slab
  rounding for scene extents ≲ 8e3), so a culled subtree can never win the
  strict ``t_new < t_cur`` compare.  Identical hit set, far fewer visits.
- **near-child-first ordering**: shrinks ``t_cur`` as early as possible so the
  cull bites.  Ordering can flip which of two EXACTLY-tied triangles (shared
  edges) is reported — the parity bar bounds those ties (BASELINE.json: ids
  bit-identical except ULP-level t ties; see tests/test_trace.py).

The leaf child's stored box is the triangle's inflated AABB, so the slab gate
already IS the reference's leaf AABB pre-test (Raytracing.compute:91); the
leaf record then only needs the 9 vertex scalars.

Per-step cost anatomy (measured on v5e): the loop is bound by scalar↔vector
boundary crossings, not by VPU math — (a) the scalar fetch of the node
record, (b) cross-lane reductions feeding push decisions.  Hence:

- **One 32-slot record, three layouts** (``pack`` = records per row).  A
  record carries both child boxes, packed index/leaf/axis metadata, AND the
  leaf children's triangle vertices — no second table, one fetch locality
  domain.  ``pack=1``: one record per row, fetched as ``tab[k, c]`` with a
  static lane — the fastest scalar-load form Mosaic emits; rows pad
  32 → 128 lanes (512 B/record), scenes ≤ ~170K tris under the kernel's
  100 MiB VMEM budget.  ``pack=2``/``pack=4``: 2/4 records per row (lane
  base made static by a pack-way ``lax.switch`` on ``k % pack``), 256/128
  B/record, scenes ≤ ~340K/~600K tris; beyond that the chunked/sharded
  paths take over.
- **Multi-pop with packed any-reductions.**  The production step pops EIGHT
  nodes (``popn=8``) and derives all 16 child any() bits from FOUR packed
  integer reductions whose chains pipeline (measured: the later chains'
  ~120 ns latency hides under the first), amortizing reduce latency and
  loop tax to ~15/~7 ns per node.  Near-child ordering comes from the
  build-time split axis (2 bits in the meta slot) against a once-per-packet
  direction-sign vote — zero per-step reductions for ordering.  Measured on
  v5e (65K tris, 512², flat): popn=1 ~10, popn=2 21.8, popn=4 30.9,
  popn=8 34.7, popn=16 28.9 (register spills) Mrays/s.  Gating the 18
  leaf-vertex fetches behind a scalar lax.cond was measured WORSE (14.0 —
  the branch breaks Mosaic's load pipelining); taller packets (rows=16/32)
  trade fewer union steps for slower steps, net ~0/−15%.

Child/triangle indices are stored as exact f32 (capacity < 2^24) so no
bitcasting is needed in-kernel.
"""
from __future__ import annotations

import functools
import weakref

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unitysimpleraytracing_tpu import constants as C
from unitysimpleraytracing_tpu.core.types import Bvh, HitRecord, Scene

_SUB, _LANE = 8, 128
# Default rays per packet: one (8, 128) f32 register per component.  The
# kernel is parametric in the packet HEIGHT (``rows`` sublanes of 128 lanes):
# a taller packet amortizes the step's scalar/sync cost (node fetch +
# cross-lane reduce, the measured bound) over more rays, at the price of the
# union DFS of a larger coherent tile.
PACKET = _SUB * _LANE
# Packets co-traversed per grid step.  MEASURED on v5e (65K tris, 512²):
# G=1: 9.98 Mrays/s, G=2: 8.4, G=4: 6.8, G=8: 5.0 — Mosaic does not overlap
# the independent chains and register pressure grows, so interleaving stays
# available for experiments but the default is no interleaving.
DEFAULT_INTERLEAVE = 1
# Cap on packets per pallas_call: XLA stages the kernel output in scoped
# VMEM (16 MB limit on v5e); 512 packets → 8 MB output window.
MAX_PACKETS_PER_CALL = 512


_SLOTS = 32          # f32 slots per record (boxes, meta, embedded leaf verts)
_PACK = 128 // _SLOTS  # 4 records per 128-lane row (packed layout)

# One record = both children's boxes + metadata + the leaf children's
# triangle vertices — ONE table, one fetch locality domain.  VMEM: a flat
# (cap, 32) table pads its lane dim to 128 → 512 B/record; the packed
# (cap/4, 128) layout is dense → 128 B/record but needs a 4-way switch for
# the lane base.  The kernel raises Mosaic's scoped-VMEM limit to 100 MiB
# (v5e has 128 MiB/core), leaving ~10 MiB for the ray/output windows.
FLAT_MAX_CAPACITY = 170_000    # pack=1: 512 B/record
HALF_MAX_CAPACITY = 340_000    # pack=2: 256 B/record, 2-way switch fetch
PACKED_MAX_CAPACITY = 600_000  # pack=4: 128 B/record, 4-way switch fetch


def auto_pack(capacity: int) -> int:
    """Records-per-row layout for a capacity: densest that still fits the
    kernel's 100 MiB VMEM budget, preferring cheaper fetch forms (pack=1
    single scalar loads > pack=2 2-way switch > pack=4 4-way switch)."""
    if capacity <= FLAT_MAX_CAPACITY:
        return 1
    if capacity <= HALF_MAX_CAPACITY:
        return 2
    return 4


@functools.partial(jax.jit, static_argnames=("pack",))
def pack_tables(scene: Scene, bvh: Bvh, pack: int = 1):
    """Flatten scene+BVH into ONE kernel record table.

    Record slots (32 f32):
      0-5   left child AABB (min.xyz, max.xyz)
      6-11  right child AABB
      12    lmeta = left_idx  + is_leaf<<20                 (exact f32 int)
      13    rmeta = right_idx + is_leaf<<20 + split_axis<<21
            (20-bit indices: every meta value stays < 2^24, the f32
            exact-integer bound; kernel capacity is VMEM-bounded ≤ ~600K
            anyway)
      14-22 left-leaf triangle vertices a.xyz b.xyz c.xyz (0 if internal)
      23-31 right-leaf triangle vertices

    Child boxes are the child NODE AABBs for internal children and the
    triangle's inflated AABB for leaf children (pre-resolving the leaf
    indirection Raytracing.compute:156,172 AND the leaf AABB pre-test box
    :91); *_idx is the child node id for internal children and the TRIANGLE
    id (sorted_tri[leaf]) for leaf children.  Embedding the leaf vertices
    removes the second (triangle) table and its separate scalar fetches.

    ``pack`` = records per row: 1 → (cap, 32), one record per row (fast
    static-lane fetch); 2/4 → (cap/pack, pack*32), record k at row k//pack,
    lane base (k%pack)*32 (pack-way-switch fetch, pack-times denser VMEM).
    """
    cap = bvh.capacity
    assert pack in (1, 2, 4) and cap % pack == 0
    assert cap < (1 << 20), "meta packing needs indices < 2^20 (f32-exact)"

    lc = jnp.clip(bvh.left, 0, cap - 1)
    rc = jnp.clip(bvh.right, 0, cap - 1)
    left_idx = jnp.where(bvh.left_is_leaf, bvh.sorted_tri[lc], lc)
    right_idx = jnp.where(bvh.right_is_leaf, bvh.sorted_tri[rc], rc)
    lmeta = left_idx + (bvh.left_is_leaf.astype(jnp.int32) << 20)
    rmeta = (
        right_idx
        + (bvh.right_is_leaf.astype(jnp.int32) << 20)
        + (jnp.clip(bvh.split_axis, 0, 2) << 21)
    )

    def child_box(child, is_leaf, tri_of_child):
        bmin = jnp.where(
            is_leaf[:, None], scene.aabb_min[tri_of_child], bvh.node_aabb_min[child]
        )
        bmax = jnp.where(
            is_leaf[:, None], scene.aabb_max[tri_of_child], bvh.node_aabb_max[child]
        )
        return bmin, bmax

    lmin, lmax = child_box(lc, bvh.left_is_leaf, left_idx)
    rmin, rmax = child_box(rc, bvh.right_is_leaf, right_idx)

    # Cull soundness beyond the ~8e3 scene-extent bound (module docstring):
    # the t-cull's exactness leans on the 1e-3 AABB inflation dominating
    # slab rounding, whose absolute size scales with coordinate magnitude
    # (measured safe at extent 7800, tests/test_trace_pallas.py).  Larger
    # scenes get the packed child boxes widened by 4e-6 per unit of excess
    # extent (~32 f32 ULPs/unit — an order of magnitude above the measured
    # rounding) so the margin dominates again.  Widening only loosens the
    # cull and the leaf pre-test gate (extra visits, never lost hits);
    # scenes within the tested bound widen by exactly 0 and stay
    # bit-identical.
    root = jnp.maximum(
        jnp.max(jnp.abs(bvh.node_aabb_min[0])), jnp.max(jnp.abs(bvh.node_aabb_max[0]))
    )
    widen = jnp.maximum(root - 8192.0, 0.0) * 4e-6
    lmin, lmax = lmin - widen, lmax + widen
    rmin, rmax = rmin - widen, rmax + widen

    t = scene.triangles

    def leaf_verts(is_leaf, tri):
        m = is_leaf[:, None]
        return (
            jnp.where(m, t.a[tri], 0.0),
            jnp.where(m, t.b[tri], 0.0),
            jnp.where(m, t.c[tri], 0.0),
        )

    la, lb, lcv = leaf_verts(bvh.left_is_leaf, left_idx)
    ra, rb, rcv = leaf_verts(bvh.right_is_leaf, right_idx)

    nodes = jnp.concatenate(
        [
            lmin, lmax, rmin, rmax,
            lmeta.astype(jnp.float32)[:, None],
            rmeta.astype(jnp.float32)[:, None],
            la, lb, lcv, ra, rb, rcv,
        ],
        axis=1,
    )  # (cap, 32)
    if pack == 1:
        return nodes
    # (A transposed (32, cap) layout — static sublane, dynamic lane, zero
    # padding — was tried and REJECTED by Mosaic on hardware: scalar loads
    # cannot take a dynamic lane index ("cannot statically prove that index
    # in dimension 1 is a multiple of 128").  The pack-way switch making the
    # lane base static is the only dense-layout fetch that compiles.)
    return nodes.reshape(cap // pack, pack * _SLOTS)


def _d3d_min(a, b):
    return jnp.where(jnp.isnan(a), b, jnp.where(jnp.isnan(b), a, jnp.minimum(a, b)))


def _d3d_max(a, b):
    return jnp.where(jnp.isnan(a), b, jnp.where(jnp.isnan(b), a, jnp.maximum(a, b)))


def _fetch_range(tab, k, lo, hi, pack):
    """Read scalar slots [lo, hi) of record ``k``.

    pack=1: dynamic row, static lane — single scalar load each (the fastest
    form Mosaic emits).  pack=2/4: dynamic row, lane base made static via a
    pack-way switch on ``k % pack``.
    """
    if pack == 1:
        return tuple(tab[k, c] for c in range(lo, hi))
    r = k // pack

    def make(j):
        def branch(_):
            return tuple(tab[r, j * _SLOTS + c] for c in range(lo, hi))

        return branch

    return jax.lax.switch(k % pack, [make(j) for j in range(pack)], None)


def _fetch(tab, k, count, pack):
    return _fetch_range(tab, k, 0, count, pack)


def _fetch_verts(tab, k, side, leaf, pack, gated):
    """The 9 leaf-vertex slots of record ``k``'s left (side=0) / right child.

    ``gated=True`` skips the 9 scalar loads for internal children behind a
    scalar ``lax.cond`` on the (already-fetched) leaf bit — the fetch chain
    is the measured per-step bound, and most visited records near the tree
    top have no leaf child.  The false branch returns zeros, whose leaf test
    rejects via det == 0, so downstream masking is unchanged.
    """
    lo = 14 + 9 * side
    if not gated:
        return _fetch_range(tab, k, lo, lo + 9, pack)
    return jax.lax.cond(
        leaf,
        lambda: _fetch_range(tab, k, lo, lo + 9, pack),
        lambda: tuple(jnp.zeros((), jnp.float32) for _ in range(9)),
    )


def _make_kernel(
    pack, G=1, count_steps=False, order="axis", leaf_cond=False, unroll=1,
    popn=1, rows=_SUB, gated_verts=False,
):
    assert popn == 1 or (order == "axis" and not leaf_cond), (
        "popn>1 requires axis ordering and branch-free leaves"
    )
    assert popn in (1, 2, 4, 8, 16)
    """Build the traversal kernel body.

    ``G`` packets are traversed INTERLEAVED inside one grid step: the while
    body advances each of the G independent DFS's by one node.  A single
    packet's step is a serial dependency chain (scalar node fetch → vector
    slab → cross-lane reduction → scalar push decision); G independent chains
    in one straight-line body let Mosaic overlap their latencies.  A packet
    whose stack empties keeps stepping (node forced to 0) with every effect
    masked by ``alive`` — no per-packet branch, so the ILP survives; the
    waste is bounded by duration skew within a G-group, small for adjacent
    image tiles.  Per-packet results are bit-identical to G=1.
    """

    def _kernel(nodes, rays, out, *rest):
        if count_steps:
            steps_out, stack = rest
        else:
            (stack,) = rest
        shape = (rows, _LANE)
        packet = rows * _LANE

        def rowg(g, k):
            return rays[g, k].reshape(shape)

        origin = [(rowg(g, 0), rowg(g, 1), rowg(g, 2)) for g in range(G)]
        direc = [(rowg(g, 3), rowg(g, 4), rowg(g, 5)) for g in range(G)]
        inv = [(1.0 / dx, 1.0 / dy, 1.0 / dz) for (dx, dy, dz) in direc]
        # Ray row 7: any-hit threshold (occlusion queries).  0 → inert
        # (nearest-hit mode).  See _anyhit_collapse.
        thr = [rowg(g, 7) for g in range(G)]

        def _anyhit_collapse(g, t):
            """Once a hit lands strictly below the ray's threshold, its
            running t collapses to 0: every remaining subtree then fails the
            ``tmin < t_cur`` cull (occlusion rays start OUTSIDE the scene —
            dispatch.occluded — so every slab entry is positive) and the ray
            leaves the union DFS.  Exact for the occlusion boolean: the
            nearest hit is minimal, so SOME hit < thr exists iff the final
            nearest t would be < thr.  Two vector ops; free when inert."""
            return jnp.where((thr[g] > 0) & (t < thr[g]), jnp.float32(0.0), t)

        # order="axis": majority direction sign per axis, ONCE per packet —
        # each node's near child then comes from its build-time split axis
        # (2 bits in flags) with zero per-step reductions.
        sgn = []
        if order == "axis":
            for g in range(G):
                dx, dy, dz = direc[g]
                sgn.append(
                    tuple(
                        jnp.sum(jnp.where(c > 0, 1, -1)) >= 0
                        for c in (dx, dy, dz)
                    )
                )

        def slab(g, bminx, bminy, bminz, bmaxx, bmaxy, bmaxz, t_cur):
            """Reference slab accept (tmax>tmin && tmax>0,
            Raytracing.compute:86) with D3D NaN propagation, refined with the
            exact ``tmin < t_cur`` cull; also returns tmin for ordering.
            (A plain-min/max fast path was tried behind a per-packet
            finiteness vote: ~0 measured gain — the step is scalar/sync
            bound, not VPU bound — and it doubled the compile; removed.)"""
            ox, oy, oz = origin[g]
            ix, iy, iz = inv[g]
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
            return (tmax > tmin) & (tmax > 0) & (tmin < t_cur), tmin

        def leaf_test(g, tri_idx, verts, gate, state):
            """Möller–Trumbore with the reference's acceptance quirks
            (det∈(−1e-8,1e-8) reject, no t>0 test, strict < keep;
            Raytracing.compute:37-73,95-99).  ``gate`` is the leaf-box slab
            mask — the reference's CheckTriangle AABB pre-test, already
            evaluated on the child box.  ``verts`` are the 9 vertex scalars
            embedded in the node record (zeros for an internal child →
            det == 0 → reject, so an ungated call is harmless)."""
            ox, oy, oz = origin[g]
            dx, dy, dz = direc[g]
            t_cur, tri_cur, u_cur, v_cur = state
            (ax, ay, az, bx, by, bz, cx, cy, cz) = verts
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
            accept = gate & (t_new < t_cur)
            return (
                jnp.where(accept, t_new, t_cur),
                jnp.where(accept, tri_idx, tri_cur),
                jnp.where(accept, u, u_cur),
                jnp.where(accept, v, v_cur),
            )

        for g in range(G):
            stack[g, 0] = 0

        def cond(carry):
            sps = carry[0]
            live = sps[0] > 0
            for g in range(1, G):
                live = live | (sps[g] > 0)
            return live

        def unpack_meta(g, lm, rm):
            """Record meta slots → indices, leaf bits, near-child bool."""
            lmi = lm.astype(jnp.int32)
            rmi = rm.astype(jnp.int32)
            left_idx = lmi & ((1 << 20) - 1)
            right_idx = rmi & ((1 << 20) - 1)
            lleaf = (lmi >> 20) == 1
            rleaf = ((rmi >> 20) & 1) == 1
            if order == "axis":
                axis = rmi >> 21
                sx, sy, sz = sgn[g]
                l_near = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))
            else:  # "fixed" (reference blind order); "vote" is handled inline
                l_near = jnp.bool_(True)
            return left_idx, right_idx, lleaf, rleaf, l_near

        def step_one(g, sp, t, tri, u, v):
            alive = sp > 0
            sp = jnp.where(alive, sp - 1, 0)
            node = jnp.where(alive, stack[g, sp], 0)

            # pack>1 fetches switch on k%pack — ONE switch covering all 32
            # slots beats three (14+9+9): the switch itself serializes.
            # pack=1 loads are plain scalar fetches, so splitting is free
            # and lets the verts loads issue after the slab starts.
            split = gated_verts or pack == 1
            rec = _fetch(nodes, node, 14 if split else 32, pack)
            (lx0, ly0, lz0, lx1, ly1, lz1,
             rx0, ry0, rz0, rx1, ry1, rz1, lf, rf) = rec[:14]
            hit_l, tmin_l = slab(g, lx0, ly0, lz0, lx1, ly1, lz1, t)
            hit_r, tmin_r = slab(g, rx0, ry0, rz0, rx1, ry1, rz1, t)
            hit_l = hit_l & alive
            hit_r = hit_r & alive

            # ONE packed reduction for both any() votes (counts ≤ packet size,
            # so a field of bit_length(packet) bits cannot carry into hit_r's).
            shift = packet.bit_length()
            counts = jnp.sum(
                hit_l.astype(jnp.int32) + (hit_r.astype(jnp.int32) << shift)
            )
            any_l = (counts & ((1 << shift) - 1)) > 0
            any_r = (counts >> shift) > 0

            left_idx, right_idx, lleaf, rleaf, l_near = unpack_meta(g, lf, rf)
            if order == "vote":
                both_mask = hit_l & hit_r
                vote = jnp.sum(
                    jnp.where(both_mask, jnp.where(tmin_l <= tmin_r, 1, -1), 0)
                )
                l_near = vote >= 0

            if split:
                lverts = _fetch_verts(nodes, node, 0, lleaf, pack, gated_verts)
                rverts = _fetch_verts(nodes, node, 1, rleaf, pack, gated_verts)
            else:
                lverts, rverts = rec[14:23], rec[23:32]

            # Leaf children: intersect in place, gated by their own box mask.
            if leaf_cond:
                t, tri, u, v = jax.lax.cond(
                    any_l & lleaf,
                    lambda s: leaf_test(g, left_idx, lverts, hit_l, s),
                    lambda s: s,
                    (t, tri, u, v),
                )
                t, tri, u, v = jax.lax.cond(
                    any_r & rleaf,
                    lambda s: leaf_test(g, right_idx, rverts, hit_r, s),
                    lambda s: s,
                    (t, tri, u, v),
                )
            else:
                # Branch-free: always run both Möller–Trumbore tests, gated
                # by mask (measured faster than lax.cond regions).
                t, tri, u, v = leaf_test(
                    g, left_idx, lverts, hit_l & lleaf & any_l, (t, tri, u, v)
                )
                t, tri, u, v = leaf_test(
                    g, right_idx, rverts, hit_r & rleaf & any_r, (t, tri, u, v)
                )

            t = _anyhit_collapse(g, t)

            # Internal children: push far-then-near so the near subtree is
            # explored first.
            push_l = any_l & ~lleaf
            push_r = any_r & ~rleaf
            both = push_l & push_r

            first = jnp.where(
                both,
                jnp.where(l_near, right_idx, left_idx),
                jnp.where(push_l, left_idx, right_idx),
            )
            second = jnp.where(l_near, left_idx, right_idx)
            # A write above the live top is harmless when sp doesn't advance.
            stack[g, sp] = first
            sp = sp + jnp.where(push_l | push_r, 1, 0)
            stack[g, sp] = second
            sp = sp + jnp.where(both, 1, 0)
            return sp, t, tri, u, v

        def step_multi(n):
            """Pop ``n`` nodes per iteration; ⌈n/2⌉ packed reductions (which
            pipeline — the second's latency hides under the first, measured
            on v5e) yield all ``2n`` any-bits, amortizing the ~120 ns reduce
            latency and the loop tax over ``n`` nodes.  Traversal order
            becomes ``n`` interleaved DFS lanes on one stack (exact — order
            never changes the hit set; ties stay within the parity bound)."""

            def step(g, sp, t, tri, u, v):
                # Pop up to n nodes (dead pops read node 0, masked by alive).
                alives, nodes_k = [], []
                for _ in range(n):
                    alive = sp > 0
                    sp = jnp.where(alive, sp - 1, sp)
                    nodes_k.append(jnp.where(alive, stack[g, sp], 0))
                    alives.append(alive)

                split = gated_verts or pack == 1
                recs, masks = [], []
                for i in range(n):
                    rec = _fetch(nodes, nodes_k[i], 14 if split else 32, pack)
                    hl, _ = slab(g, *rec[:6], t)
                    hr, _ = slab(g, *rec[6:12], t)
                    masks.append(hl & alives[i])
                    masks.append(hr & alives[i])
                    recs.append(rec)

                # Packed cross-lane reduces, 4 any-bits each: 8-bit fields
                # sublane-sum (counts ≤ rows ≤ 32, no carry), squash each
                # field to 1 bit, lane-sum (counts ≤ 128/field; int32 wrap is
                # modular so the bit fields survive even when the top field
                # hits 128).  Independent reduce chains pipeline.
                anys = []
                for base in range(0, 2 * n, 4):
                    grp = masks[base:base + 4]
                    packed = grp[0].astype(jnp.int32)
                    for j in range(1, len(grp)):
                        packed = packed + (grp[j].astype(jnp.int32) << (8 * j))
                    part = jnp.sum(packed, axis=0, keepdims=True)  # (1, LANE)
                    bits = ((part & 255) > 0).astype(jnp.int32)
                    for j in range(1, len(grp)):
                        bits = bits + (
                            (((part >> (8 * j)) & 255) > 0).astype(jnp.int32)
                            << (8 * j)
                        )
                    s = jnp.sum(bits)
                    for j in range(len(grp)):
                        anys.append(((s >> (8 * j)) & 255) > 0)

                metas = [unpack_meta(g, rec[12], rec[13]) for rec in recs]
                for i in range(n):
                    li, ri, lleaf, rleaf, _ = metas[i]
                    if split:
                        vl = _fetch_verts(nodes, nodes_k[i], 0, lleaf, pack, gated_verts)
                        vr = _fetch_verts(nodes, nodes_k[i], 1, rleaf, pack, gated_verts)
                    else:
                        vl, vr = recs[i][14:23], recs[i][23:32]
                    t, tri, u, v = leaf_test(
                        g, li, vl, masks[2 * i] & lleaf, (t, tri, u, v)
                    )
                    t, tri, u, v = leaf_test(
                        g, ri, vr, masks[2 * i + 1] & rleaf, (t, tri, u, v)
                    )

                t = _anyhit_collapse(g, t)

                # Push in reverse pop order (the first pop's near child ends
                # topmost, preserving near-first progression).
                for i in reversed(range(n)):
                    li, ri, lleaf, rleaf, ln = metas[i]
                    push_l = anys[2 * i] & ~lleaf
                    push_r = anys[2 * i + 1] & ~rleaf
                    both = push_l & push_r
                    first = jnp.where(
                        both,
                        jnp.where(ln, ri, li),
                        jnp.where(push_l, li, ri),
                    )
                    second = jnp.where(ln, li, ri)
                    stack[g, sp] = first
                    sp = sp + jnp.where(push_l | push_r, 1, 0)
                    stack[g, sp] = second
                    sp = sp + jnp.where(both, 1, 0)
                return sp, t, tri, u, v

            return step

        step_fn = step_one if popn == 1 else step_multi(popn)

        def body(carry):
            sps, ts, tris_, us, vs, nsteps = carry
            for _ in range(unroll):  # sequential: identical DFS order
                outs = [
                    step_fn(g, sps[g], ts[g], tris_[g], us[g], vs[g])
                    for g in range(G)
                ]
                sps = tuple(o[0] for o in outs)
                ts = tuple(o[1] for o in outs)
                tris_ = tuple(o[2] for o in outs)
                us = tuple(o[3] for o in outs)
                vs = tuple(o[4] for o in outs)
            return (sps, ts, tris_, us, vs, nsteps + 1)

        # Ray row 6 seeds the running best t (MAX_FLOAT normally; a known
        # bound from an earlier chunk/ring hop prunes the whole DFS against
        # it — exact, since a culled candidate can never win the strict-<).
        tri0 = jnp.zeros(shape, jnp.int32)
        z = jnp.zeros(shape, jnp.float32)
        init = (
            tuple(jnp.int32(1) for _ in range(G)),
            tuple(rowg(g, 6) for g in range(G)),
            tuple(tri0 for _ in range(G)),
            tuple(z for _ in range(G)),
            tuple(z for _ in range(G)),
            jnp.int32(0),
        )

        _, ts, tris_, us, vs, nsteps = jax.lax.while_loop(cond, body, init)
        if count_steps:
            steps_out[pl.program_id(0), 0] = nsteps

        for g in range(G):
            out[g, 0] = ts[g].reshape(packet)
            out[g, 1] = pltpu.bitcast(tris_[g], jnp.float32).reshape(packet)
            out[g, 2] = us[g].reshape(packet)
            out[g, 3] = vs[g].reshape(packet)

    return _kernel


@functools.lru_cache(maxsize=64)
def _traversal_fn(
    T: int, cap: int, pack: int, interpret: bool, G: int = 1,
    count_steps: bool = False, order: str = "axis", leaf_cond: bool = False,
    unroll: int = 1, popn: int = 1, rows: int = _SUB,
    gated_verts: bool = False,
):
    """Build + cache the jitted kernel wrapper for a (packets, capacity) shape.

    ``G`` = packets interleaved per grid step (ILP over independent DFS
    chains); must divide T.  ``rows`` = packet height in 128-lane sublanes
    (packet = rows*128 rays).  ``count_steps`` adds a per-grid-step while-loop
    iteration count output (profiling/roofline accounting)."""

    assert T % G == 0
    packet = rows * _LANE
    tab_shape = (cap, _SLOTS) if pack == 1 else (cap // pack, pack * _SLOTS)
    out_shape = [jax.ShapeDtypeStruct((T, 4, packet), jnp.float32)]
    out_specs = [
        pl.BlockSpec((G, 4, packet), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ]
    if count_steps:
        # SMEM outputs need whole-array blocks on TPU; each grid step writes
        # its own row (the block is grid-invariant, so it stays resident).
        out_shape.append(jax.ShapeDtypeStruct((T // G, 1), jnp.int32))
        out_specs.append(
            pl.BlockSpec((T // G, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )
    call = pl.pallas_call(
        _make_kernel(
            pack, G, count_steps, order, leaf_cond, unroll, popn, rows,
            gated_verts,
        ),
        grid=(T // G,),
        in_specs=[
            pl.BlockSpec(tab_shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 8, packet), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if count_steps else out_specs[0],
        out_shape=out_shape if count_steps else out_shape[0],
        # popn interleaves that many DFS lanes on one stack, so give the
        # scratch popn x the single-DFS depth bound (SMEM cost is trivial).
        scratch_shapes=[
            pltpu.SMEM((G, C.TRAVERSAL_STACK_DEPTH * max(popn, 1)), jnp.int32)
        ],
        # The default scoped-VMEM budget is 16 MiB; the packed tables for
        # 96K-600K-triangle scenes need up to ~77 MiB (measured OOM at 260K
        # without this).  v5e has 128 MiB/core.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )

    @jax.jit
    def run(nodes, origins, dirs, t_init=None, anyhit=None):
        R = T * packet
        t_row = (
            jnp.full((1, R), C.MAX_FLOAT, jnp.float32)
            if t_init is None
            else t_init.reshape(1, R)
        )
        thr_row = (
            jnp.zeros((1, R), jnp.float32)
            if anyhit is None
            else anyhit.reshape(1, R)
        )
        rays = jnp.concatenate(
            [origins.T, dirs.T, t_row, thr_row], axis=0
        )  # (8, R)
        rays = rays.reshape(8, T, packet).transpose(1, 0, 2)  # (T, 8, packet)
        res = call(nodes, rays)
        out, steps = res if count_steps else (res, None)
        out = out.transpose(1, 0, 2).reshape(4, R)
        tri = jax.lax.bitcast_convert_type(out[1], jnp.int32)
        if count_steps:
            return out[0], tri, out[2], out[3], steps
        return out[0], tri, out[2], out[3]

    return run


def traversal_step_counts(
    scene: Scene, bvh: Bvh, origins, dirs,
    interpret: bool = False, interleave: int | None = None, rows: int = _SUB,
):
    """While-loop steps per grid step (profiling): returns (hits, steps)."""
    R = origins.shape[0]
    packet = rows * _LANE
    assert R % packet == 0
    T = R // packet
    pack = auto_pack(bvh.capacity)
    if interleave is None:
        interleave = next(g for g in (DEFAULT_INTERLEAVE, 2, 1) if T % g == 0)
    nodes = prepare_tables(scene, bvh, pack=pack)
    run = _traversal_fn(
        T, bvh.capacity, pack, interpret, interleave, True, "axis", False,
        rows=rows,
    )
    t, tri, u, v, steps = run(nodes, origins, dirs)
    return HitRecord(t=t, tri=tri, u=u, v=v), steps


# id(bvh) -> (weakref(bvh), weakref(scene), flat, tables).  Bvh can't key a
# WeakKeyDictionary (its dataclass __hash__ hashes jax.Array fields, which
# raise), so key by id with a weakref finalizer evicting the entry when the
# Bvh dies; the stored weakrefs are validated on lookup so a recycled id can
# never alias stale geometry.
_TABLE_CACHE: dict = {}


def _resolve_pack(capacity: int, flat: bool | None, pack: int | None) -> int:
    """Back-compat layout resolution: explicit ``pack`` wins; legacy ``flat``
    maps True → 1 and False → 4 (the original two layouts); None → auto."""
    if pack is not None:
        return pack
    if flat is not None:
        return 1 if flat else 4
    return auto_pack(capacity)


def prepare_tables(
    scene: Scene, bvh: Bvh, flat: bool | None = None, pack: int | None = None
):
    """Packed kernel tables for (scene, bvh), cached per Bvh instance.

    Packing costs several HBM passes (~4 ms at 65K tris); a static scene
    re-traced every frame must not repay it — the reference likewise packs
    once in Awake and only dispatches per frame (RaytracingMeshDrawer.cs:76).
    Inside a jit trace (tracer inputs) the cache is bypassed and packing
    fuses into the caller's program.
    """
    pack = _resolve_pack(bvh.capacity, flat, pack)
    if isinstance(jnp.asarray(bvh.left), jax.core.Tracer):
        return pack_tables(scene, bvh, pack=pack)
    key = id(bvh)
    ent = _TABLE_CACHE.get(key)
    if (
        ent is not None
        and ent[0]() is bvh
        and ent[1]() is scene
        and ent[2] == pack
    ):
        return ent[3]
    tables = pack_tables(scene, bvh, pack=pack)
    try:
        bvh_ref = weakref.ref(bvh, lambda _ref, _k=key: _TABLE_CACHE.pop(_k, None))
        scene_ref = weakref.ref(scene)
    except TypeError:
        return tables
    _TABLE_CACHE[key] = (bvh_ref, scene_ref, pack, tables)
    return tables


def traverse_packets_pallas(
    scene: Scene,
    bvh: Bvh,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    interpret: bool = False,
    tables=None,
    flat: bool | None = None,
    interleave: int | None = None,
    order: str = "axis",
    leaf_cond: bool = False,
    unroll: int = 1,
    popn: int | None = None,
    rows: int = _SUB,
    gated_verts: bool = False,
    pack: int | None = None,
    t_init: jnp.ndarray | None = None,
    anyhit_thresh: jnp.ndarray | None = None,
) -> HitRecord:
    """Kernel-based nearest-hit traversal over (R, 3) rays.

    ``t_init`` (optional (R,) f32) seeds each ray's running best t — hits at
    or beyond it are pruned AND rejected exactly as if a previous traversal
    had already found a hit there (cross-chunk / ring-hop culling).
    ``anyhit_thresh`` (optional (R,) f32, 0 = off) turns a ray's query into
    an occlusion test: the first accepted hit strictly below the threshold
    collapses its running t to 0 and exits its traversal early — the
    returned ``t`` is then 0, not the nearest hit (dispatch.occluded).

    R must be a multiple of the packet size ``rows*128``; order rays coherently
    (`trace_packet.tiled_ray_order`).  Hit-compatible with `trace.traverse`
    up to exact-t ties (traversal order is near-child-first here; the strict-<
    keep makes every non-tied result identical).  ``tables`` may carry the
    `prepare_tables` result to skip per-call packing.  ``pack`` (1/2/4
    records per row; legacy ``flat`` True/False = 1/4) overrides the
    capacity-based table-layout choice (tests force dense layouts with
    small scenes this way).
    """
    R = origins.shape[0]
    packet = rows * _LANE
    assert R % packet == 0, f"{R} rays not divisible by {packet}"
    T = R // packet
    pack = _resolve_pack(bvh.capacity, flat, pack)
    if popn is None:
        # Layout-dependent default, MEASURED on v5e (same-day A/B): pack=1
        # fetches are single scalar loads, so deep multi-pop wins (popn=8:
        # 34.7 vs popn=2: 21.8 Mrays/s at 65K/512²); a pack-way-switch
        # fetch multiplies popn-fold into pack·popn straight-line fetch
        # blocks whose code size erodes deep multi-pop (config 3 pack=4:
        # popn=8 2.97 vs popn=2 3.8 Mrays/s), and at 260K tris pack=2
        # popn=4 beats pack=4 popn=2 by 1.36x.
        popn = {1: 8, 2: 4, 4: 2}[pack]
    nodes = tables if tables is not None else prepare_tables(scene, bvh, pack=pack)

    # Bounded launches: XLA stages a pallas_call's whole output in scoped
    # VMEM (observed OOM at 1980 packets / 32 MB out), so large batches are
    # split into kernel calls whose output window stays ≤ 8 MB.
    max_packets = max(1, MAX_PACKETS_PER_CALL * _SUB // rows)
    outs = []
    for lo in range(0, T, max_packets):
        Tseg = min(max_packets, T - lo)
        g = interleave
        if g is None:
            g = next(gg for gg in (DEFAULT_INTERLEAVE, 2, 1) if Tseg % gg == 0)
        run = _traversal_fn(
            Tseg, bvh.capacity, pack, interpret, g,
            False, order, leaf_cond, unroll, popn, rows, gated_verts,
        )
        sl = slice(lo * packet, (lo + Tseg) * packet)
        outs.append(
            run(
                nodes, origins[sl], dirs[sl],
                None if t_init is None else t_init[sl],
                None if anyhit_thresh is None else anyhit_thresh[sl],
            )
        )
    if len(outs) == 1:
        t, tri, u, v = outs[0]
    else:
        t, tri, u, v = (jnp.concatenate(parts) for parts in zip(*outs))
    return HitRecord(t=t, tri=tri, u=u, v=v)
