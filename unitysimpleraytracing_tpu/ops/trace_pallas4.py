"""Wide-record (BVH4) Pallas traversal — the per-visit-floor attack.

The BVH2 kernel (ops/trace_pallas.py) measures at ~0.78 of its own per-visit
component floor, so the next win must cut VISITS, not the visit: this kernel
pops a 4-child record per stack entry, built by collapsing Karras pairs — one
scalar fetch + four slab tests advance a ray TWO tree levels.  Per node-pair
visited it replaces 2 record fetches, 2 stack pops/pushes and 2 packed
reductions with 1 of each.

Structure (bit-compatible hit contract with the BVH2 kernel up to traversal-
order ties — same bound as BASELINE's parity bar):

- **Node set**: internal Karras nodes at EVEN depth (root = 0).  Each BVH4
  node X expands its two BVH2 children in place: an internal child
  contributes its OWN two children (X's grandchildren) as entries, a leaf
  child contributes itself, the vacant slot is an inert EMPTY entry
  (inverted box → slab always fails; leaf bit + zero verts → det==0 reject).
  Internal entries are even-depth nodes again, so traversal only ever sees
  BVH4 nodes.  Even-depth node count is ≤ (2n-1)/3 (each non-root even node
  has an odd parent, each odd node an even parent), and ~n/3 for balanced
  trees — the table is allocated at the ACTUAL compacted count (host-known
  scene), cutting VMEM per triangle ~3x vs the BVH2 record at equal fetch
  form.
- **Record = 64 f32 slots** (4 child boxes 24, 4 metas 4, 4×9 embedded leaf
  triangles 36 — stored PRE-DIFFERENCED as (a, e1=b−a, e2=c−a) so the kernel
  skips 6 vector subtractions per entry; the f32 subtraction moves from the
  kernel to pack time bit-unchanged, so hit parity is exact).  ``pack=1``: one record per 128-lane row (512 B/record,
  static-lane scalar fetch — the SAME bytes/record as the BVH2 flat layout,
  at less than half the records, so the fast fetch form now covers ~260K-tri
  scenes: config 3 no longer needs a switch fetch).  ``pack=2``: two records
  per row, 256 B/record, 2-way-switch fetch, ~600K tris.
- **Meta slot** (f32-exact, < 2^24): ``idx + is_leaf<<21 + axis<<22`` where
  idx is the entry's BVH4 node id (internal) or triangle id (leaf); meta0's
  axis is X's own split axis (orders the two pairs), meta1/meta2's axes are
  X's left/right BVH2 children's split axes (order within each pair) — the
  same build-time near-child ordering as the BVH2 kernel, extended to the
  4-way push with zero per-step reductions.

Traversal order within a record: nearest-first over
(pair by X's axis) × (entry by the pair's axis), pushed in reverse; the
strict-< hit keep makes order affect only exact-t ties.

Reference mapping: same acceptance contract as Raytracing.compute:37-103
(slab ``tmax>tmin && tmax>0``, Möller–Trumbore det/u/v rejects, no t>0 test),
reached through two collapsed levels per iteration instead of one.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unitysimpleraytracing_tpu import constants as C
from unitysimpleraytracing_tpu.core.types import Bvh, HitRecord, Scene
from unitysimpleraytracing_tpu.ops import lbvh
from unitysimpleraytracing_tpu.ops.trace_pallas import (
    _LANE,
    _SUB,
    MAX_PACKETS_PER_CALL,
    _d3d_max,
    _d3d_min,
)

_SLOTS4 = 64
_SLOTS4C = 52  # compressed record: 12 bf16-pair box slots + 4 metas + 36 verts
# A record is 512 B at pack=1 (64 slots padded to 128 lanes) / 256 B dense at
# pack=2; records ≈ n/3 for balanced trees → auto thresholds on TRIANGLES:
FLAT4_MAX_CAPACITY = 280_000    # pack=1 static-lane fetch
PACKED4_MAX_CAPACITY = 580_000  # pack=2 2-way switch
# VMEM budget for a flat (pack=1) record table: the kernel's 100 MB scoped
# limit minus ray/output windows.  Single source — the pack switch
# (prepare_tables4, render.make_animated_renderer) and the chunked build
# contract (pipeline/chunked._check_chunk_records) all derive from it.
FLAT4_VMEM_BUDGET = 88 * 2**20


def auto_pack4(capacity: int) -> int:
    return 1 if capacity <= FLAT4_MAX_CAPACITY else 2


# id(bvh.left) -> (weakref(left), mask, new_id, count, plans).  Keyed by the
# TOPOLOGY array's identity, not the Bvh object's: refit_bvh replaces only the
# box fields (flax .replace keeps the child-link array references), so a
# refit-per-frame dynamic loop reuses the even-depth membership — the
# pointer-doubling depth pass is the expensive part of repacking.  ``plans``
# maps cap4 -> the (src_idx, metas) pack plan: everything topology-dependent
# about the record table, so a deform/refit frame repays only the geometry
# gathers (_apply_plan4), not the entry derivation + 64-column compaction.
_TOPO_CACHE: dict = {}


def _node_mask_compute(bvh: Bvh):
    cap = bvh.left.shape[0]
    ids = jnp.arange(cap, dtype=jnp.int32)
    valid = ids < bvh.count - 1
    # Parent links may be absent (-1-filled non-diagnostic build): recompute.
    drop = jnp.int32(cap)
    iparent = jnp.full(cap, -1, jnp.int32)
    li = jnp.where(valid & ~bvh.left_is_leaf, bvh.left, drop)
    ri = jnp.where(valid & ~bvh.right_is_leaf, bvh.right, drop)
    iparent = iparent.at[li].set(ids, mode="drop")
    iparent = iparent.at[ri].set(ids, mode="drop")
    depth = lbvh.compute_depths(iparent, bvh.count)
    mask = valid & (depth % 2 == 0)
    new_id = jnp.cumsum(mask.astype(jnp.int32)) - 1
    return mask, new_id


def bvh4_node_mask(bvh: Bvh):
    """(mask, new_id): even-depth internal nodes and their compacted ids.

    Cached per topology (id of the child-link array) for concrete inputs, so
    refit-only rebuilds skip the depth chase."""
    mask, new_id, _ = _node_mask_cached(bvh)
    return mask, new_id


def _node_mask_cached(bvh: Bvh):
    """(mask, new_id, count|None): count is the host int record count,
    available only for concrete inputs (cached — it costs a device→host
    sync, which a refit-per-frame render loop must not repay)."""
    import weakref

    left = jnp.asarray(bvh.left)
    if isinstance(left, jax.core.Tracer):
        mask, new_id = _node_mask_compute(bvh)
        return mask, new_id, None
    key = id(bvh.left)
    ent = _TOPO_CACHE.get(key)
    if ent is not None and ent[0]() is bvh.left:
        return ent[1], ent[2], ent[3]
    mask, new_id = jax.jit(_node_mask_compute)(bvh)
    count = int(jnp.sum(mask))
    try:
        ref = weakref.ref(bvh.left, lambda _r, _k=key: _TOPO_CACHE.pop(_k, None))
        _TOPO_CACHE[key] = (ref, mask, new_id, count, {})
    except TypeError:
        pass
    return mask, new_id, count


@functools.partial(jax.jit, static_argnames=("cap4",))
def _pack_plan4(bvh: Bvh, mask, new_id, cap4: int):
    """Topology-only half of the table pack: per-record-row entry SOURCE
    indices into the unified geometry source array (_apply_plan4's ``S``)
    plus the constant meta columns.

    A deforming mesh changes boxes and vertices but not the tree (refit_bvh
    keeps the child links), so this plan — the entry derivation, the
    even-depth compaction and the meta packing — is computed once per
    topology and cached (_TOPO_CACHE); the per-frame repack replays only
    the geometry gathers."""
    cap = bvh.capacity

    Lc = jnp.clip(bvh.left, 0, cap - 1)
    Rc = jnp.clip(bvh.right, 0, cap - 1)
    Ll, Rl = bvh.left_is_leaf, bvh.right_is_leaf

    def grand(c):
        """BVH2 children of node c (as entry candidates)."""
        gl = jnp.clip(bvh.left[c], 0, cap - 1)
        gr = jnp.clip(bvh.right[c], 0, cap - 1)
        return gl, bvh.left_is_leaf[c], gr, bvh.right_is_leaf[c]

    LL, LLl, LR, LRl = grand(Lc)
    RL, RLl, RR, RRl = grand(Rc)

    def entry(node2, is_leaf, present):
        """Source row + meta fields for one entry: leaf entries read row
        cap+tri (triangle geometry), internal entries read row node2 (node
        boxes), absent entries read the inert EMPTY row 2·cap."""
        tri = bvh.sorted_tri[node2]
        src = jnp.where(is_leaf, cap + tri, node2)
        src = jnp.where(present, src, 2 * cap)
        idx = jnp.where(is_leaf, tri, new_id[node2])
        idx = jnp.where(present, idx, 0)
        leaf_bit = jnp.where(present, is_leaf.astype(jnp.int32), 1)
        return src, idx, leaf_bit

    true_ = jnp.ones((cap,), bool)
    e0 = entry(jnp.where(Ll, Lc, LL), jnp.where(Ll, True, LLl), true_)
    e1 = entry(LR, LRl, ~Ll)
    e2 = entry(jnp.where(Rl, Rc, RL), jnp.where(Rl, True, RLl), true_)
    e3 = entry(RR, RRl, ~Rl)

    # Near-child ordering axes: record's own split axis + each pair's axis.
    ax_self = jnp.clip(bvh.split_axis, 0, 2)
    ax_l = jnp.where(Ll, 0, jnp.clip(bvh.split_axis[Lc], 0, 2))
    ax_r = jnp.where(Rl, 0, jnp.clip(bvh.split_axis[Rc], 0, 2))
    axes = (ax_self, ax_l, ax_r, jnp.zeros((cap,), jnp.int32))

    srcs = jnp.stack([e[0] for e in (e0, e1, e2, e3)], axis=1)  # (cap, 4)
    metas = jnp.stack(
        [
            (e[1] + (e[2] << 21) + (ax << 22)).astype(jnp.float32)
            for e, ax in zip((e0, e1, e2, e3), axes)
        ],
        axis=1,
    )  # (cap, 4)

    # Compact mask rows to their new ids (record-table row r reads BVH2 node
    # rows[r]); padding rows replicate node 0's entries — never referenced.
    ids = jnp.arange(cap, dtype=jnp.int32)
    rows = jnp.zeros((cap4,), jnp.int32).at[
        jnp.where(mask, new_id, cap4)
    ].set(ids, mode="drop")
    return srcs[rows], metas[rows]  # (cap4, 4) each


@functools.partial(jax.jit, static_argnames=("pack",))
def _apply_plan4(scene: Scene, bvh: Bvh, src_idx, metas, pack: int):
    """Geometry-only half of the table pack: build the unified source array
    and gather each entry's 15 slots (6 box + 9 pre-differenced verts) by the
    plan's source rows — 4 row gathers of ≤16 columns (the measured-fast
    gather form on v5e) instead of the full entry derivation + 64-column
    compaction.  Bit-identical to the one-shot pack (same values flow through
    the same f32 ops; selection by gather instead of jnp.where)."""
    cap = bvh.capacity
    cap4 = src_idx.shape[0]
    t = scene.triangles
    BIG = jnp.float32(3.0e38)
    zeros9 = jnp.zeros((cap, 9), jnp.float32)
    # Rows [0, cap): internal BVH2 nodes (boxes; verts inert zeros).
    # Rows [cap, 2cap): triangles (leaf box + (a, e1=b−a, e2=c−a) — the
    # pre-differenced Möller–Trumbore form, computed elementwise here so a
    # deform frame repays only this elementwise pass + the gathers).
    # Row 2cap: the inert EMPTY entry (inverted box, zero verts).
    S = jnp.concatenate(
        [
            jnp.concatenate([bvh.node_aabb_min, bvh.node_aabb_max, zeros9], axis=1),
            jnp.concatenate(
                [scene.aabb_min, scene.aabb_max, t.a, t.b - t.a, t.c - t.a], axis=1
            ),
            jnp.concatenate(
                [jnp.full((1, 3), BIG), jnp.full((1, 3), -BIG),
                 jnp.zeros((1, 9), jnp.float32)],
                axis=1,
            ),
        ],
        axis=0,
    )  # (2·cap + 1, 15)

    # Cull-margin widening for scene extents beyond the tested ~8e3 bound —
    # identical policy to trace_pallas.pack_tables.
    root = jnp.maximum(
        jnp.max(jnp.abs(bvh.node_aabb_min[0])), jnp.max(jnp.abs(bvh.node_aabb_max[0]))
    )
    widen = jnp.maximum(root - 8192.0, 0.0) * 4e-6

    g = [S[src_idx[:, e]] for e in range(4)]  # 4 × (cap4, 15)
    table = jnp.concatenate(
        [jnp.concatenate([ge[:, 0:3] - widen, ge[:, 3:6] + widen], axis=1)
         for ge in g]
        + [metas]
        + [ge[:, 6:15] for ge in g],
        axis=1,
    )  # (cap4, 64): boxes 0-23, metas 24-27, verts 28-63
    if pack == 1:
        return table
    return table.reshape(cap4 // pack, pack * _SLOTS4)


def pack_tables4(
    scene: Scene, bvh: Bvh, pack: int = 1, cap4: int | None = None,
    mask=None, new_id=None,
):
    """Flatten scene+BVH into the 4-child record table (see module doc).

    Two-stage: a topology-only PLAN (_pack_plan4 — entry sources + metas,
    cached per topology) applied to the current geometry (_apply_plan4 —
    4 grouped gathers).  A refit-per-frame animation loop therefore repays
    only the apply stage: the reference rebuilds everything each Awake
    (RaytracingMeshDrawer.cs:30-74) and has no animated path at all.

    ``cap4`` is the static record count (host-computed actual even-depth node
    count, padded; defaults to the worst-case (2·cap+1)/3 bound).
    ``mask``/``new_id`` optionally carry a bvh4_node_mask result (the
    topology cache — refit-per-frame loops skip the depth chase)."""
    cap = bvh.capacity
    assert pack in (1, 2)
    if cap4 is None:
        cap4 = (2 * cap) // 3 + 2
    cap4 = -(-cap4 // pack) * pack
    assert cap4 < (1 << 21), "meta packing needs node ids < 2^21"
    assert cap < (1 << 21), "meta packing needs triangle ids < 2^21"

    if mask is None:
        mask, new_id = bvh4_node_mask(bvh)
    plan = None
    if not isinstance(jnp.asarray(bvh.left), jax.core.Tracer):
        ent = _TOPO_CACHE.get(id(bvh.left))
        if ent is not None and ent[0]() is bvh.left:
            plan = ent[4].get(cap4)
            if plan is None:
                plan = _pack_plan4(bvh, mask, new_id, cap4)
                ent[4][cap4] = plan
    if plan is None:
        plan = _pack_plan4(bvh, mask, new_id, cap4)
    return _apply_plan4(scene, bvh, *plan, pack)


@jax.jit
def compress_tables4(table: jnp.ndarray) -> jnp.ndarray:
    """(cap4, 64) record table → (cap4, 52) COMPRESSED table: each entry's
    six box floats become three f32 slots, each packing (min, max) of one
    axis as a bf16 pair (min in the high 16 bits, max in the low).

    Rounding is DIRECTED so the stored box always CONTAINS the f32 box
    (min rounded down, max rounded up): a conservatively widened box can
    only admit extra slab passes, which the strict-< Möller–Trumbore fold
    rejects — the same argument as the >8e3-extent cull-margin widening
    (pack_tables4).  The one semantic edge: a triangle entirely BEHIND the
    ray origin whose true box has tmax within the ~0.4% bf16 rounding of 0
    can now reach the (t>0-free) triangle test — the reference would have
    culled it at the box stage (Raytracing.compute:86).  Parity is asserted
    on-device by benchmarks/bvh4_ab.py --compress.

    Layout: slots 0-11 packed boxes (entry-major, axes x/y/z), 12-15 metas,
    16-51 verts — 52 fetches per record instead of 64 on the fetch-bound
    flat path (VERDICT r3 item 4's experiment)."""
    cap4 = table.shape[0]
    assert table.shape[1] == _SLOTS4, table.shape

    def down(v):  # largest bf16 ≤ v
        b = jax.lax.bitcast_convert_type(v, jnp.uint32)
        trunc = b & jnp.uint32(0xFFFF0000)
        bump = (v < 0) & ((b & jnp.uint32(0xFFFF)) != 0)
        return trunc + jnp.where(bump, jnp.uint32(1 << 16), jnp.uint32(0))

    def up(v):  # smallest bf16 ≥ v
        b = jax.lax.bitcast_convert_type(v, jnp.uint32)
        trunc = b & jnp.uint32(0xFFFF0000)
        bump = (v > 0) & ((b & jnp.uint32(0xFFFF)) != 0)
        return trunc + jnp.where(bump, jnp.uint32(1 << 16), jnp.uint32(0))

    boxes = []
    for e in range(4):
        bmin, bmax = table[:, 6 * e:6 * e + 3], table[:, 6 * e + 3:6 * e + 6]
        lo16 = down(bmin)                       # bf16 pattern in high bits
        hi16 = up(bmax) >> jnp.uint32(16)       # bf16 pattern to low bits
        boxes.append(
            jax.lax.bitcast_convert_type(lo16 | hi16, jnp.float32)
        )  # (cap4, 3): x, y, z packed (min, max) pairs
    return jnp.concatenate(boxes + [table[:, 24:]], axis=1)  # (cap4, 52)


def _fetch4(tab, k, lo, hi, pack):
    """Scalar slots [lo, hi) of record k (static lane at pack=1; 2-way
    switch at pack=2 — one switch covering the whole requested range)."""
    if pack == 1:
        return tuple(tab[k, c] for c in range(lo, hi))
    r = k // 2

    def make(j):
        def branch(_):
            return tuple(tab[r, j * _SLOTS4 + c] for c in range(lo, hi))

        return branch

    return jax.lax.switch(k % 2, [make(0), make(1)], None)


def _make_kernel4(pack, count_steps=False, popn=2, rows=_SUB, compress=False,
                  hbm=False):
    assert popn in (1, 2, 4, 8, 16)
    assert not (compress and pack != 1), "compressed records are pack=1 only"
    assert not (hbm and (pack != 1 or compress)), "hbm records are plain pack=1"
    # Slot layout: plain (24 box | 4 meta | 36 vert) vs compressed
    # (12 bf16-pair box | 4 meta | 36 vert) — see compress_tables4.
    meta_base = 12 if compress else 24
    vert_base = meta_base + 4
    total = _SLOTS4C if compress else _SLOTS4

    def unpack2(v):
        """One f32 slot → (min, max) bf16 pair (min high bits, max low).

        Decoded through VECTOR ops: Mosaic's ``tpu.bitcast`` is vector-only
        (a scalar bitcast fails verification), so the scalar slot is
        broadcast to the packet tile first — ~6 vector ops per packed slot,
        which the fetch-floor model prices ABOVE the 3 scalar fetches it
        replaces; measured by benchmarks/bvh4_ab.py --compress."""
        vec = jnp.full((rows, _LANE), v, jnp.float32)
        iv = pltpu.bitcast(vec, jnp.uint32)
        mn = pltpu.bitcast(iv & jnp.uint32(0xFFFF0000), jnp.float32)
        mx = pltpu.bitcast(iv << 16, jnp.float32)
        return mn, mx

    def _kernel(nodes, rays, out, *rest):
        rest = list(rest)
        steps_out = rest.pop(0) if count_steps else None
        stack = rest.pop(0)
        rec_scratch, dma_sems = rest if hbm else (None, None)
        shape = (rows, _LANE)
        packet = rows * _LANE

        def row(k):
            return rays[0, k].reshape(shape)

        origin = (row(0), row(1), row(2))
        direc = (row(3), row(4), row(5))
        inv = tuple(1.0 / c for c in direc)
        thr = row(7)

        def anyhit_collapse(t):
            return jnp.where((thr > 0) & (t < thr), jnp.float32(0.0), t)

        sgn = tuple(
            jnp.sum(jnp.where(c > 0, 1, -1)) >= 0 for c in direc
        )

        def axis_near(ax):
            sx, sy, sz = sgn
            return jnp.where(ax == 0, sx, jnp.where(ax == 1, sy, sz))

        def slab(bminx, bminy, bminz, bmaxx, bmaxy, bmaxz, t_cur):
            ox, oy, oz = origin
            ix, iy, iz = inv
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
            return (tmax > tmin) & (tmax > 0) & (tmin < t_cur)

        def leaf_test(tri_idx, verts, gate, state):
            ox, oy, oz = origin
            dx, dy, dz = direc
            t_cur, tri_cur, u_cur, v_cur = state
            # Slots carry (a, e1, e2) pre-differenced at pack time.
            (ax, ay, az, e1x, e1y, e1z, e2x, e2y, e2z) = verts
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

        stack[0, 0] = 0

        def cond(carry):
            return carry[0] > 0

        def step(carry):
            sp, t, tri, u, v, nsteps = carry
            # Pop up to popn records (dead pops read record 0, masked).
            alives, ks = [], []
            for _ in range(popn):
                alive = sp > 0
                sp = jnp.where(alive, sp - 1, sp)
                ks.append(jnp.where(alive, stack[0, sp], 0))
                alives.append(alive)

            # hbm: the record table lives in HBM — issue ALL popn row copies
            # back-to-back (indices are known now, from the stack), then
            # drain in order: record i's DMA latency hides behind records
            # 0..i-1's slab/leaf math (the per-iteration analog of double
            # buffering; cross-iteration prefetch is impossible — the next
            # pops depend on this iteration's pushes).
            dmas = None
            if hbm:
                dmas = [
                    pltpu.make_async_copy(
                        nodes.at[ks[i]], rec_scratch.at[i], dma_sems.at[i]
                    )
                    for i in range(popn)
                ]
                for d in dmas:
                    d.start()
            # pack=1: plain scalar loads — split the fetch so the vert loads
            # issue after the slabs start.  pack=2: ONE switch covering the
            # whole 64-slot record (splitting a packed fetch into multiple
            # switches measured 3x slower on the BVH2 layouts).
            split = pack == 1
            recs, masks = [], []
            for i in range(popn):
                if hbm:
                    # Wait, then read only boxes+metas — the vert reads
                    # issue later, after the slabs start (the same split
                    # that the VMEM pack=1 path uses; the record is fully
                    # landed, so the later reads need no second wait).
                    dmas[i].wait()
                    rec = tuple(rec_scratch[i, c] for c in range(meta_base + 4))
                else:
                    rec = _fetch4(
                        nodes, ks[i], 0, (meta_base + 4) if split else total, pack
                    )
                for e in range(4):
                    if compress:
                        mnx, mxx = unpack2(rec[3 * e + 0])
                        mny, mxy = unpack2(rec[3 * e + 1])
                        mnz, mxz = unpack2(rec[3 * e + 2])
                        m = slab(mnx, mny, mnz, mxx, mxy, mxz, t)
                    else:
                        m = slab(*rec[6 * e:6 * e + 6], t)
                    masks.append(m & alives[i])
                recs.append(rec)

            # One packed cross-lane reduce per record → its 4 any-bits
            # (8-bit fields, counts ≤ rows ≤ 32; chains pipeline).
            anys = []
            for i in range(popn):
                grp = masks[4 * i:4 * i + 4]
                packed = grp[0].astype(jnp.int32)
                for j in range(1, 4):
                    packed = packed + (grp[j].astype(jnp.int32) << (8 * j))
                part = jnp.sum(packed, axis=0, keepdims=True)
                bits = ((part & 255) > 0).astype(jnp.int32)
                for j in range(1, 4):
                    bits = bits + (
                        (((part >> (8 * j)) & 255) > 0).astype(jnp.int32)
                        << (8 * j)
                    )
                s = jnp.sum(bits)
                for j in range(4):
                    anys.append(((s >> (8 * j)) & 255) > 0)

            # Decode metas + leaf tests in place.
            metas = []
            for i in range(popn):
                mt = [recs[i][meta_base + e].astype(jnp.int32) for e in range(4)]
                idxs = [m & ((1 << 21) - 1) for m in mt]
                leafs = [((m >> 21) & 1) == 1 for m in mt]
                ax_self = mt[0] >> 22
                ax_l = mt[1] >> 22
                ax_r = mt[2] >> 22
                metas.append((idxs, leafs, ax_self, ax_l, ax_r))

            for i in range(popn):
                if hbm:
                    verts = tuple(
                        rec_scratch[i, c] for c in range(vert_base, total)
                    )
                elif split:
                    verts = _fetch4(nodes, ks[i], vert_base, total, pack)
                else:
                    verts = recs[i][vert_base:total]
                idxs, leafs, _, _, _ = metas[i]
                for e in range(4):
                    t, tri, u, v = leaf_test(
                        idxs[e], verts[9 * e:9 * e + 9],
                        masks[4 * i + e] & leafs[e], (t, tri, u, v),
                    )

            t = anyhit_collapse(t)

            # Push internal entries farthest-first (near order = pair by the
            # record's axis, entry by the pair's axis), reverse pop order so
            # the first pop's nearest entry ends topmost.
            for i in reversed(range(popn)):
                idxs, leafs, ax_self, ax_l, ax_r = metas[i]
                push = [
                    anys[4 * i + e] & ~leafs[e] for e in range(4)
                ]
                nl = axis_near(ax_l)
                nr = axis_near(ax_r)
                npair = axis_near(ax_self)

                def ordered(a, b, near):
                    return (
                        jnp.where(near, a[0], b[0]), jnp.where(near, a[1], b[1]),
                        jnp.where(near, b[0], a[0]), jnp.where(near, b[1], a[1]),
                    )

                l0i, l0p, l1i, l1p = ordered(
                    (idxs[0], push[0]), (idxs[1], push[1]), nl
                )
                r0i, r0p, r1i, r1p = ordered(
                    (idxs[2], push[2]), (idxs[3], push[3]), nr
                )
                s0i, s0p, s2i, s2p = (
                    jnp.where(npair, l0i, r0i), jnp.where(npair, l0p, r0p),
                    jnp.where(npair, r0i, l0i), jnp.where(npair, r0p, l0p),
                )
                s1i, s1p, s3i, s3p = (
                    jnp.where(npair, l1i, r1i), jnp.where(npair, l1p, r1p),
                    jnp.where(npair, r1i, l1i), jnp.where(npair, r1p, l1p),
                )
                for ii, pp in ((s3i, s3p), (s2i, s2p), (s1i, s1p), (s0i, s0p)):
                    stack[0, sp] = ii
                    sp = sp + jnp.where(pp, 1, 0)

            return (sp, t, tri, u, v, nsteps + 1)

        tri0 = jnp.zeros(shape, jnp.int32)
        z = jnp.zeros(shape, jnp.float32)
        init = (jnp.int32(1), row(6), tri0, z, z, jnp.int32(0))
        _, t, tri, u, v, nsteps = jax.lax.while_loop(cond, step, init)
        if count_steps:
            steps_out[pl.program_id(0), 0] = nsteps

        out[0, 0] = t.reshape(packet)
        out[0, 1] = pltpu.bitcast(tri, jnp.float32).reshape(packet)
        out[0, 2] = u.reshape(packet)
        out[0, 3] = v.reshape(packet)

    return _kernel


@functools.lru_cache(maxsize=64)
def _traversal_fn4(
    T: int, cap4: int, pack: int, interpret: bool,
    count_steps: bool = False, popn: int = 2, rows: int = _SUB,
    compress: bool = False, hbm: bool = False,
):
    packet = rows * _LANE
    slots = _SLOTS4C if compress else _SLOTS4
    tab_shape = (cap4, slots) if pack == 1 else (cap4 // 2, 2 * slots)
    out_shape = [jax.ShapeDtypeStruct((T, 4, packet), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, 4, packet), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ]
    if count_steps:
        out_shape.append(jax.ShapeDtypeStruct((T, 1), jnp.int32))
        out_specs.append(
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )
    # 4-ary DFS stack bound: ≤ 3 entries per level over ≤32 collapsed
    # levels, times the popn interleave.
    scratch = [
        pltpu.SMEM((1, 2 * C.TRAVERSAL_STACK_DEPTH * max(popn, 1)), jnp.int32)
    ]
    if hbm:
        # Per-pop record landing rows + one DMA semaphore per pop slot: the
        # record table itself stays in HBM (memory_space ANY below).  Rows
        # are full 128-lane tiles — Mosaic requires DMA slices aligned to
        # the (1,128) tiling, so HBM tables are padded to 128 slots/record.
        scratch += [
            pltpu.VMEM((popn, _LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((popn,)),
        ]
    call = pl.pallas_call(
        _make_kernel4(pack, count_steps, popn, rows, compress, hbm),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM)
            if hbm
            else pl.BlockSpec(tab_shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, packet), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if count_steps else out_specs[0],
        out_shape=out_shape if count_steps else out_shape[0],
        scratch_shapes=scratch,
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
        rays = jnp.concatenate([origins.T, dirs.T, t_row, thr_row], axis=0)
        rays = rays.reshape(8, T, packet).transpose(1, 0, 2)
        res = call(nodes, rays)
        out, steps = res if count_steps else (res, None)
        out = out.transpose(1, 0, 2).reshape(4, R)
        tri = jax.lax.bitcast_convert_type(out[1], jnp.int32)
        if count_steps:
            return out[0], tri, out[2], out[3], steps
        return out[0], tri, out[2], out[3]

    return run


# id(bvh) -> (weakref(bvh), weakref(scene), pack, cap4, tables)
_TABLE4_CACHE: dict = {}


@jax.jit
def pad_tables_hbm(tables: jnp.ndarray) -> jnp.ndarray:
    """(cap4, 64) pack=1 table → (cap4, 128) HBM-layout table (full 128-lane
    rows so per-record DMA slices match Mosaic's (1,128) tiling).  Callers
    tracing per-frame should pad ONCE and pass the padded table."""
    assert tables.shape[-1] == _SLOTS4, tables.shape
    return jnp.pad(tables, ((0, 0), (0, _LANE - _SLOTS4)))


def table_geometry(tables) -> tuple[int, int]:
    """(cap4, pack) recovered from a packed table's static shape
    (pack=1 → (cap4, 64) or compressed (cap4, 52); pack=2 → (cap4/2, 128))."""
    if tables.shape[1] in (_SLOTS4, _SLOTS4C):
        return tables.shape[0], 1
    assert tables.shape[1] == 2 * _SLOTS4, tables.shape
    return 2 * tables.shape[0], 2


def prepare_tables4(scene: Scene, bvh: Bvh, pack: int | None = None):
    """BVH4 kernel table for (scene, bvh), cached per Bvh instance.

    The table is sized to the scene's ACTUAL compacted even-depth node count
    (host-read scalar, padded to the pack multiple), not the worst-case
    (2n+1)/3 bound — cap4 is recoverable from the static shape
    (`table_geometry`).  Inside a jit trace the worst-case bound is used
    (the count is not host-readable there)."""
    import weakref

    if isinstance(jnp.asarray(bvh.left), jax.core.Tracer):
        if pack is None:
            pack = auto_pack4(bvh.capacity)
        cap4 = (2 * bvh.capacity) // 3 + 2
        cap4 = -(-cap4 // pack) * pack
        return pack_tables4(scene, bvh, pack=pack, cap4=cap4)
    key = id(bvh)
    ent = _TABLE4_CACHE.get(key)
    if (
        ent is not None
        and ent[0]() is bvh
        and ent[1]() is scene
        and (pack is None or ent[2] == pack)
    ):
        return ent[3]
    mask, new_id, cap4 = _node_mask_cached(bvh)
    if pack is None:
        # The ACTUAL record count decides the layout (records measure ~0.50n
        # on terrain trees vs the 2/3 worst case): flat static-lane while
        # 512 B/record fits the VMEM budget with room for the ray windows.
        pack = 1 if cap4 * 512 <= FLAT4_VMEM_BUDGET else 2
    cap4 = max(-(-cap4 // pack) * pack, pack)
    tables = pack_tables4(scene, bvh, pack=pack, cap4=cap4, mask=mask, new_id=new_id)
    try:
        bvh_ref = weakref.ref(bvh, lambda _r, _k=key: _TABLE4_CACHE.pop(_k, None))
        scene_ref = weakref.ref(scene)
    except TypeError:
        return tables
    _TABLE4_CACHE[key] = (bvh_ref, scene_ref, pack, tables)
    return tables


def traverse_packets_pallas4(
    scene: Scene,
    bvh: Bvh,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    interpret: bool = False,
    tables=None,
    cap4: int | None = None,
    pack: int | None = None,
    popn: int | None = None,
    rows: int = _SUB,
    count_steps: bool = False,
    t_init: jnp.ndarray | None = None,
    anyhit_thresh: jnp.ndarray | None = None,
    hbm: bool = False,
) -> HitRecord:
    """BVH4 kernel nearest-hit traversal over (R, 3) rays (see module doc).

    Same contract as trace_pallas.traverse_packets_pallas: R must be a
    multiple of rows*128, coherent ray order expected, ``t_init`` seeds the
    running best, ``anyhit_thresh`` enables occlusion early-exit.  ``tables``
    carries a prepare_tables4 result (cap4/pack recovered from its shape).

    ``hbm=True`` keeps the record table in HBM and streams each popped
    record into VMEM scratch with an async copy (all popn copies issued
    before the first wait) — the SINGLE-TREE path for scenes whose table
    exceeds the ~88 MB VMEM budget (VERDICT r4 item 1): one global tree
    instead of the chunked path's per-chunk union traversal.  pack=1 plain
    records only; bit-identical hits to the VMEM kernel (same fetch values
    through the same ops)."""
    R = origins.shape[0]
    packet = rows * _LANE
    assert R % packet == 0, f"{R} rays not divisible by {packet}"
    T = R // packet
    if tables is None:
        # pack=None lets prepare_tables4 pick from the ACTUAL record count.
        tables = prepare_tables4(scene, bvh, pack=1 if hbm else pack)
    if hbm:
        if tables.shape[-1] == _SLOTS4:
            tables = pad_tables_hbm(tables)
        assert tables.shape[-1] == _LANE, tables.shape
        cap4, pack = tables.shape[0], 1
    elif cap4 is None:
        cap4, pack = table_geometry(tables)
    if popn is None:
        # Measured on v5e at 512² (same-session A/Bs, benchmarks/bvh4_ab.py):
        # 65K tris popn 1/2/4/8/16 → 20.98/28.8/33.77/36.82/**30.65** Mrays/s
        # (16 is past the pipelining knee — dead pops dominate); 260K tris
        # popn 2/4 → 11.4/13.96.  The 2-way-switch fetch (pack=2) erodes
        # deep multi-pop like the BVH2 layouts did — keep it shallow.
        popn = {1: 8, 2: 2}[pack]

    compress = tables.shape[-1] in (_SLOTS4C,)
    max_packets = max(1, MAX_PACKETS_PER_CALL * _SUB // rows)
    outs = []
    steps_acc = []
    for lo in range(0, T, max_packets):
        Tseg = min(max_packets, T - lo)
        run = _traversal_fn4(
            Tseg, cap4, pack, interpret, count_steps, popn, rows, compress, hbm
        )
        sl = slice(lo * packet, (lo + Tseg) * packet)
        res = run(
            tables, origins[sl], dirs[sl],
            None if t_init is None else t_init[sl],
            None if anyhit_thresh is None else anyhit_thresh[sl],
        )
        if count_steps:
            *res, steps = res
            steps_acc.append(steps)
        outs.append(tuple(res))
    if len(outs) == 1:
        t, tri, u, v = outs[0]
    else:
        t, tri, u, v = (jnp.concatenate(parts) for parts in zip(*outs))
    hits = HitRecord(t=t, tri=tri, u=u, v=v)
    if count_steps:
        return hits, jnp.concatenate(steps_acc)
    return hits
