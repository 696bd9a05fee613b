"""Multi-device SPMD rendering: Morton-range triangle partitioning + ray
data-parallelism over a `jax.sharding.Mesh`.

The reference is strictly single-GPU (SURVEY §2: no NCCL/MPI/multi-process
anywhere); this layer is the new first-class component the TPU build adds.
Parallel axes:

- ``dp`` (data parallel): the ray/pixel batch is sharded; each device traces
  its block. Exact — every ray sees a full BVH of the triangles it's tested
  against.
- ``tp`` (tensor/spatial parallel — the Morton-range a.k.a. sequence-parallel
  axis): triangles are partitioned into Morton-contiguous ranges after the
  global sort; each device builds a local LBVH over its range and traces the
  rays against it; per-ray results combine across ``tp`` with an
  ``all_gather`` + lexicographic (t, shard) min — the ICI collective replacing
  the reference's nonexistent communication layer.

Tie-breaking across shards is (t, then lowest shard = lowest Morton range);
within a shard it is the same DFS order as single-chip traversal.  A miss
carries shard-local triangle 0's attributes — composited output is identical
(alpha 0), raw RGB on misses may differ from single-chip, as in the reference
where miss pixels shade with triangleData[0] (Raytracing.compute:178-182).
"""
from __future__ import annotations

import math
from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unitysimpleraytracing_tpu import constants as C
from unitysimpleraytracing_tpu.core.types import Bvh, Scene, Triangles
from unitysimpleraytracing_tpu.ops import lbvh, sort, trace, unique


@flax.struct.dataclass
class ShardedScene:
    """Scene partitioned into Morton-contiguous triangle ranges.

    Every per-triangle array gains a leading shard axis (S, shard_cap, ...).
    ``counts[s]`` is the number of real triangles in shard s; ``global_tri``
    maps shard-local ids back to original mesh triangle ids.
    """

    tri_a: jnp.ndarray      # (S, cap, 3)
    tri_b: jnp.ndarray
    tri_c: jnp.ndarray
    a_uv: jnp.ndarray       # (S, cap, 2)
    b_uv: jnp.ndarray
    c_uv: jnp.ndarray
    a_normal: jnp.ndarray   # (S, cap, 3)
    b_normal: jnp.ndarray
    c_normal: jnp.ndarray
    aabb_min: jnp.ndarray   # (S, cap, 3)
    aabb_max: jnp.ndarray
    morton: jnp.ndarray     # (S, cap) uint32, sorted within shard; pad 0xFFFFFFFF
    global_tri: jnp.ndarray  # (S, cap) int32 original triangle ids
    counts: jnp.ndarray      # (S,) int32
    range_min: jnp.ndarray   # (S, 3) f32 — per-shard root AABB (early-out tests)
    range_max: jnp.ndarray   # (S, 3) f32

    @property
    def num_shards(self) -> int:
        return self.morton.shape[0]

    @property
    def shard_capacity(self) -> int:
        return self.morton.shape[1]


def partition_scene(
    scene: Scene,
    num_shards: int,
    pad_multiple: int = C.LANE,
    balance: str = "count",
) -> ShardedScene:
    """Split a scene into ``num_shards`` Morton-contiguous ranges.

    Triangles are globally sorted by Morton code, then divided into contiguous
    chunks (the Morton-range partitioning of SURVEY §5 / the BASELINE north
    star): spatial locality per shard, so most rays terminate against few
    shards.

    ``balance`` is the skew-handling policy for choosing range boundaries:
    - "count": equal triangle counts per shard (balances build work).
    - "area":  equal summed triangle surface area per shard (a SAH-style
      traversal-cost proxy — hot, large-area ranges get split across more
      shards, cold ranges get merged).
    """
    n = scene.count
    keys, order = sort.sort_key_val(scene.morton, scene.tri_index)
    keys = np.asarray(keys)
    order = np.asarray(order)

    if balance == "count":
        bounds = np.minimum(
            math.ceil(n / num_shards) * np.arange(num_shards + 1), n
        )
    elif balance == "area":
        t = scene.triangles
        a = np.asarray(t.a)[order[:n]]
        b = np.asarray(t.b)[order[:n]]
        c = np.asarray(t.c)[order[:n]]
        area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
        cum = np.cumsum(area)  # cum[i] = weight of triangles [0..i]
        targets = cum[-1] * np.arange(num_shards + 1) / num_shards
        # Boundary = the triangle whose cumulative range contains the target;
        # that straddling triangle starts the NEXT shard (so one dominant
        # triangle gets isolated rather than dragging everything into shard 0).
        bounds = np.searchsorted(cum, targets)
        bounds[0], bounds[-1] = 0, n
        bounds = np.maximum.accumulate(bounds)  # monotone, possibly-empty tails
    else:
        raise ValueError(f"unknown balance policy {balance!r}")

    per = int(np.max(bounds[1:] - bounds[:-1]))
    cap = C.pad_count(max(per, 2), pad_multiple)

    def shard_gather(arr, fill=0.0):
        arr = np.asarray(arr)
        out = np.full((num_shards, cap) + arr.shape[1:], fill, arr.dtype)
        for s in range(num_shards):
            lo, hi = bounds[s], bounds[s + 1]
            out[s, : hi - lo] = arr[order[lo:hi]]
        return jnp.asarray(out)

    counts = (bounds[1:] - bounds[:-1]).astype(np.int32)
    morton = np.full((num_shards, cap), C.KEY_PADDING, np.uint32)
    gtri = np.zeros((num_shards, cap), np.int32)
    rmin = np.zeros((num_shards, 3), np.float32)
    rmax = np.zeros((num_shards, 3), np.float32)
    amin_np, amax_np = np.asarray(scene.aabb_min), np.asarray(scene.aabb_max)
    for s in range(num_shards):
        lo, hi = bounds[s], bounds[s + 1]
        morton[s, : hi - lo] = keys[lo:hi]
        gtri[s, : hi - lo] = order[lo:hi]
        if hi > lo:
            rmin[s] = amin_np[order[lo:hi]].min(axis=0)
            rmax[s] = amax_np[order[lo:hi]].max(axis=0)
        else:  # empty shard: inverted box no ray can hit
            rmin[s] = np.inf
            rmax[s] = -np.inf

    t = scene.triangles
    return ShardedScene(
        tri_a=shard_gather(t.a),
        tri_b=shard_gather(t.b),
        tri_c=shard_gather(t.c),
        a_uv=shard_gather(t.a_uv),
        b_uv=shard_gather(t.b_uv),
        c_uv=shard_gather(t.c_uv),
        a_normal=shard_gather(t.a_normal),
        b_normal=shard_gather(t.b_normal),
        c_normal=shard_gather(t.c_normal),
        aabb_min=shard_gather(scene.aabb_min),
        aabb_max=shard_gather(scene.aabb_max),
        morton=jnp.asarray(morton),
        global_tri=jnp.asarray(gtri),
        counts=jnp.asarray(counts),
        range_min=jnp.asarray(rmin),
        range_max=jnp.asarray(rmax),
    )


def make_mesh(dp: int, tp: int, devices=None) -> Mesh:
    """Device mesh with ray-parallel (dp) × triangle-parallel (tp) axes."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= dp * tp, f"need {dp*tp} devices, have {devices.size}"
    return Mesh(devices[: dp * tp].reshape(dp, tp), ("dp", "tp"))


def _local_build(morton_l, aabb_min_l, aabb_max_l, count):
    """Per-shard LBVH over already-sorted local keys (sort is a no-op pass
    kept for generality when shards are re-fed unsorted data).

    Skewed partitions can leave a shard with 0 or 1 real triangles, for which
    the Karras topology is undefined (the reference requires >= 2 leaves too);
    clamping the effective count to 2 folds padding rows in as extra leaves —
    harmless, since padding geometry is degenerate (a=b=c=0 → Möller–Trumbore
    det≈0 reject) and can never win a hit."""
    cap = morton_l.shape[0]
    iota = jnp.arange(cap, dtype=jnp.int32)
    keys, sorted_tri = jax.lax.sort_key_val(morton_l, iota, is_stable=True)
    count = jnp.maximum(count, 2)
    keys = unique.distribute_keys(keys, count)
    return lbvh.build_bvh_from_sorted(
        keys, sorted_tri, aabb_min_l, aabb_max_l, count, static_count=cap
    )


def _shard_scene_view(ss_fields, cap: int) -> Scene:
    """Wrap one shard's local arrays in the Scene container traverse expects."""
    (ta, tb, tc, auv, buv, cuv, an, bn, cn, amin, amax, morton, gtri) = ss_fields
    tris = Triangles(
        a=ta, b=tb, c=tc,
        a_uv=auv, b_uv=buv, c_uv=cuv,
        a_normal=an, b_normal=bn, c_normal=cn,
        count=cap,
    )
    return Scene(
        triangles=tris,
        aabb_min=amin,
        aabb_max=amax,
        morton=morton,
        tri_index=gtri,
        count=cap,
    )


def _trace_and_payload(ss_fields, count, origins, dirs):
    """Local build + trace + shading payload for one shard."""
    cap = ss_fields[11].shape[0]
    scene_l = _shard_scene_view(ss_fields, cap)
    bvh = _local_build(ss_fields[11], ss_fields[9], ss_fields[10], count)
    hits = trace.traverse(scene_l, bvh, origins, dirs)

    tri = hits.tri
    w = 1.0 - hits.u - hits.v
    bary = (w[:, None], hits.u[:, None], hits.v[:, None])
    uv = bary[0] * scene_l.triangles.a_uv[tri] + bary[1] * scene_l.triangles.b_uv[tri] + bary[2] * scene_l.triangles.c_uv[tri]
    normal = (
        bary[0] * scene_l.triangles.a_normal[tri]
        + bary[1] * scene_l.triangles.b_normal[tri]
        + bary[2] * scene_l.triangles.c_normal[tri]
    )
    g_tri = ss_fields[12][tri]
    return hits.t, g_tri, hits.u, hits.v, uv, normal


def render_hits_sharded(
    sscene: ShardedScene,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    mesh: Mesh,
):
    """SPMD build + trace over a (dp, tp) mesh.

    Returns per-ray (t, global_tri, u, v, uv(2), normal(3)) with the shading
    payload already interpolated (so no cross-shard triangle gather is ever
    needed).  Rays sharded over dp; triangle ranges over tp; the per-ray
    combine is an all_gather over tp + first-minimum select.
    """
    fields = (
        sscene.tri_a, sscene.tri_b, sscene.tri_c,
        sscene.a_uv, sscene.b_uv, sscene.c_uv,
        sscene.a_normal, sscene.b_normal, sscene.c_normal,
        sscene.aabb_min, sscene.aabb_max,
        sscene.morton, sscene.global_tri,
    )
    tp_size = mesh.shape["tp"]
    assert sscene.num_shards == tp_size, (
        f"scene has {sscene.num_shards} shards but mesh tp={tp_size}"
    )
    assert origins.shape[0] % mesh.shape["dp"] == 0, "rays must divide dp"

    field_spec = tuple(P("tp") for _ in fields)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(field_spec, P("tp"), P("dp"), P("dp")),
        out_specs=P("dp"),
        check_vma=False,
    )
    def step(fields_blk, counts_blk, origins_blk, dirs_blk):
        local = tuple(f[0] for f in fields_blk)  # drop the size-1 shard axis
        count = counts_blk[0]
        payload = _trace_and_payload(local, count, origins_blk, dirs_blk)
        # Combine across Morton ranges: (tp, R) gathered, first-min wins.
        gathered = tuple(jax.lax.all_gather(p, "tp") for p in payload)
        t_all = gathered[0]
        win = jnp.argmin(t_all, axis=0)  # ties → lowest shard index

        def pick(g):
            idx = win.reshape((1,) + win.shape + (1,) * (g.ndim - 2))
            return jnp.take_along_axis(g, idx, axis=0)[0]

        return tuple(pick(g) for g in gathered)

    return step(fields, sscene.counts, origins, dirs)


def render_hits_ring(
    sscene: ShardedScene,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    mesh: Mesh,
):
    """Ring-pipelined ray exchange over the ``tp`` axis — the ray analog of
    ring attention (SURVEY §5: CP/Ulysses patterns applied to rays).

    Where `render_hits_sharded` replicates every dp ray block across all tp
    shards and all_gathers S payloads per ray, here rays are sharded over the
    FULL (dp × tp) mesh and circulate the tp ring with ``ppermute``: each of
    the S hops traces the resident ray block against the local shard's BVH
    and folds the running best hit.  Per-ray exchanged state is constant
    (6 ray + 14 hit floats), independent of S, and XLA overlaps each hop's
    ppermute with the next traversal (async collectives) — the
    exchange-overlapped-with-traversal design of the BASELINE north star.

    Early-out skew handling: a hop is skipped lane-wise when the running best
    t is closer than the ray's entry distance to the shard's root AABB
    (monotonicity: any hit inside the box is at least entry-distance away).

    Returns the same payload tuple as `render_hits_sharded`.
    """
    fields = (
        sscene.tri_a, sscene.tri_b, sscene.tri_c,
        sscene.a_uv, sscene.b_uv, sscene.c_uv,
        sscene.a_normal, sscene.b_normal, sscene.c_normal,
        sscene.aabb_min, sscene.aabb_max,
        sscene.morton, sscene.global_tri,
    )
    tp_size = mesh.shape["tp"]
    assert sscene.num_shards == tp_size
    total = mesh.shape["dp"] * tp_size
    assert origins.shape[0] % total == 0, "rays must divide dp*tp"

    field_spec = tuple(P("tp") for _ in fields)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(field_spec, P("tp"), P("tp"), P("tp"),
                  P(("dp", "tp")), P(("dp", "tp"))),
        out_specs=P(("dp", "tp")),
        check_vma=False,
    )
    def step(fields_blk, counts_blk, rmin_blk, rmax_blk, origins_blk, dirs_blk):
        local = tuple(f[0] for f in fields_blk)
        count = counts_blk[0]
        rmin, rmax = rmin_blk[0], rmax_blk[0]
        cap = local[11].shape[0]
        scene_l = _shard_scene_view(local, cap)
        bvh = _local_build(local[11], local[9], local[10], count)
        R = origins_blk.shape[0]

        def entry_t(o, d):
            """Slab entry distance to this shard's root box; +inf on miss."""
            inv = 1.0 / d
            t1 = (rmin[None, :] - o) * inv
            t2 = (rmax[None, :] - o) * inv
            tmin = jnp.max(jnp.minimum(t1, t2), axis=1)
            tmax = jnp.min(jnp.maximum(t1, t2), axis=1)
            hit = (tmax > tmin) & (tmax > 0)
            return jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)

        def trace_fold(o, d, best):
            t_b, tri_b, u_b, v_b, uv_b, n_b = best
            gate = entry_t(o, d) < t_b  # early-out: box can't beat best
            h = trace.traverse(scene_l, bvh, o, d)
            win = gate & (h.t < t_b)
            tri = h.tri
            w = 1.0 - h.u - h.v
            uv = (
                w[:, None] * scene_l.triangles.a_uv[tri]
                + h.u[:, None] * scene_l.triangles.b_uv[tri]
                + h.v[:, None] * scene_l.triangles.c_uv[tri]
            )
            nrm = (
                w[:, None] * scene_l.triangles.a_normal[tri]
                + h.u[:, None] * scene_l.triangles.b_normal[tri]
                + h.v[:, None] * scene_l.triangles.c_normal[tri]
            )
            gtri = local[12][tri]
            win2 = win[:, None]
            return (
                jnp.where(win, h.t, t_b),
                jnp.where(win, gtri, tri_b),
                jnp.where(win, h.u, u_b),
                jnp.where(win, h.v, v_b),
                jnp.where(win2, uv, uv_b),
                jnp.where(win2, nrm, n_b),
            )

        best = (
            jnp.full((R,), C.MAX_FLOAT, jnp.float32),
            jnp.zeros((R,), jnp.int32),
            jnp.zeros((R,), jnp.float32),
            jnp.zeros((R,), jnp.float32),
            jnp.zeros((R, 2), jnp.float32),
            jnp.zeros((R, 3), jnp.float32),
        )
        o, d = origins_blk, dirs_blk
        perm = [(i, (i + 1) % tp_size) for i in range(tp_size)]
        for _hop in range(tp_size):
            best = trace_fold(o, d, best)
            if tp_size > 1:
                # Rotate rays+state around the tp ring; after all tp_size
                # rotations every block is back on its home device.
                o, d, *best = [
                    jax.lax.ppermute(x, "tp", perm) for x in (o, d, *best)
                ]
                best = tuple(best)
        return best

    return step(
        fields, sscene.counts, sscene.range_min, sscene.range_max, origins, dirs
    )


def render_hits_dp(scene: Scene, bvh: Bvh, origins, dirs, mesh: Mesh):
    """Pure ray-data-parallel traversal: scene+BVH replicated, rays sharded.

    Exact same results as single-chip `trace.traverse` (each ray sees the
    full BVH)."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("dp"), P("dp")),
        out_specs=P("dp"),
        check_vma=False,
    )
    def step(scene_r, bvh_r, origins_blk, dirs_blk):
        h = trace.traverse(scene_r, bvh_r, origins_blk, dirs_blk)
        return h.t, h.tri, h.u, h.v

    t, tri, u, v = step(scene, bvh, origins, dirs)
    from unitysimpleraytracing_tpu.core.types import HitRecord

    return HitRecord(t=t, tri=tri, u=u, v=v)
