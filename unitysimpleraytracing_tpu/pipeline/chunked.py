"""Large-scene single-chip path: chunked BVH build + traversal.

The Pallas traversal kernel requires its node/triangle tables resident in
VMEM (~16 MB/core → ≤ ~100K triangles, ops/trace_pallas).  Scenes beyond that
are split into Morton-contiguous chunks (the same partitioning the
distributed layer shards across devices, parallel/dist.py), each chunk gets
its own VMEM-sized LBVH, and rays fold a running best hit over the chunks —
streaming table-sized working sets through VMEM as successive kernel launches
instead of randomly gathering from HBM.  The reference has no analog (it is
hard-capped at 524 288 triangles, Constants.cs:6).

Tie semantics: equal-t hits resolve to the chunk traced first (chunks are
scheduled near-first from the ray origin, see trace_chunked); within a
chunk, DFS order.  Same bounded exact-tie class as the distributed combines.
"""
from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp

from unitysimpleraytracing_tpu import constants as C
from unitysimpleraytracing_tpu.core.types import Bvh, HitRecord, Scene, Triangles
from unitysimpleraytracing_tpu.ops import trace_pallas, trace_pallas4
from unitysimpleraytracing_tpu.ops.dispatch import trace_rays
from unitysimpleraytracing_tpu.parallel import dist


@flax.struct.dataclass
class ChunkedBvh:
    """Morton-range chunked scene + per-chunk LBVHs (stacked on axis 0).

    ``tables`` carries the pre-packed traversal kernel tables per chunk —
    packing a ~500K-entry table costs ~10 gather passes, which must happen
    once at build time, not per frame inside the trace jit."""

    sscene: dist.ShardedScene
    bvhs: Bvh  # every field stacked (S, ...)
    tables: jnp.ndarray  # (S, ...) pre-packed kernel tables per chunk

    @property
    def num_chunks(self) -> int:
        return self.sscene.num_shards

    @property
    def capacity(self) -> int:
        return self.sscene.shard_capacity


@functools.partial(jax.jit, static_argnames=("chunk_capacity", "record_format"))
def build_bvh_chunked(
    scene: Scene, chunk_capacity: int = 163840, record_format: str = "bvh4"
) -> ChunkedBvh:
    """Partition + build one LBVH per chunk (vmapped over chunks).

    Fully jittable: the count-balanced partition runs on device
    (dist._partition_scene_device), so the 1M-triangle flow never leaves
    the chip.  The default chunk capacity keeps every chunk in the FLAT
    table layout (fast static-lane fetch) — measured 1.4x faster at 1M tris
    than two 512K packed chunks despite the extra kernel launches.

    ``record_format``: "bvh4" packs the wide 4-child records (the production
    kernel — measured 2.5x the binary kernel at 260K tris, trace_pallas4);
    "bvh2" keeps the binary records.  The table shape tells trace_chunked
    which kernel to launch."""
    n = scene.count
    num_chunks = max(-(-n // chunk_capacity), 1)
    sscene = dist.partition_scene(scene, num_chunks)
    bvhs = jax.vmap(dist._local_build)(
        sscene.morton, sscene.aabb_min, sscene.aabb_max, sscene.counts
    )
    cap = sscene.shard_capacity
    if record_format == "bvh4":
        # Static worst-case record bound (≤ (2n+1)/3 even-depth nodes);
        # unreachable padding rows are inert.
        cap4 = (2 * cap) // 3 + 2
        tables = jnp.stack(
            [
                trace_pallas4.pack_tables4(
                    _chunk_scene(sscene, s, cap), _chunk_bvh(bvhs, s, cap),
                    pack=1, cap4=cap4,
                )
                for s in range(num_chunks)
            ]
        )
    else:
        tables = jnp.stack(
            [
                trace_pallas.pack_tables(
                    _chunk_scene(sscene, s, cap), _chunk_bvh(bvhs, s, cap),
                    pack=trace_pallas.auto_pack(cap),
                )
                for s in range(num_chunks)
            ]
        )
    return ChunkedBvh(sscene=sscene, bvhs=bvhs, tables=tables)


def _chunk_scene(ss: dist.ShardedScene, s: int, cap: int) -> Scene:
    tris = Triangles(
        a=ss.tri_a[s], b=ss.tri_b[s], c=ss.tri_c[s],
        a_uv=ss.a_uv[s], b_uv=ss.b_uv[s], c_uv=ss.c_uv[s],
        a_normal=ss.a_normal[s], b_normal=ss.b_normal[s], c_normal=ss.c_normal[s],
        count=cap,
    )
    return Scene(
        triangles=tris,
        aabb_min=ss.aabb_min[s],
        aabb_max=ss.aabb_max[s],
        morton=ss.morton[s],
        tri_index=ss.global_tri[s],
        count=cap,
    )


def _chunk_bvh(bvhs: Bvh, s: int, cap: int) -> Bvh:
    return Bvh(
        left=bvhs.left[s], right=bvhs.right[s],
        left_is_leaf=bvhs.left_is_leaf[s], right_is_leaf=bvhs.right_is_leaf[s],
        internal_parent=bvhs.internal_parent[s], leaf_parent=bvhs.leaf_parent[s],
        range_first=bvhs.range_first[s], range_last=bvhs.range_last[s],
        split_axis=bvhs.split_axis[s],
        node_aabb_min=bvhs.node_aabb_min[s], node_aabb_max=bvhs.node_aabb_max[s],
        sorted_tri=bvhs.sorted_tri[s], depth=bvhs.depth[s],
        count=cap,
    )


@functools.partial(jax.jit, static_argnames=("impl",))
def trace_chunked(
    cbvh: ChunkedBvh,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    impl: str = "auto",
) -> HitRecord:
    """Nearest hit over all chunks; ``tri`` is the ORIGINAL scene triangle id.

    Chunks are traced NEAR-FIRST (by distance from the mean ray origin to
    each chunk root AABB, a traced argsort — no recompile when the camera
    moves): the running-best ``t_init`` then prunes most of the far chunks'
    DFS at the root, which is what makes streaming S chunks cost much less
    than S full traversals.  Exactness is unaffected (a pruned candidate can
    never win the strict-< fold); only EXACT cross-chunk t-ties resolve to
    the nearer chunk instead of the lower Morton range — the same bounded
    tie class as the distributed combines (parallel/dist.py).
    """
    S, cap = cbvh.num_chunks, cbvh.capacity
    R = origins.shape[0]
    if impl == "auto" and jax.default_backend() == "tpu":
        # The packed record format decides the kernel: 32/128-wide rows are
        # binary records, 64-wide rows are BVH4 records (the binary packed
        # layout and the BVH4 pack=2 layout are both 128-wide — the chunked
        # builder only ever emits BVH4 at pack=1, so the shapes disambiguate).
        impl = "pallas4" if cbvh.tables.shape[-1] == 64 else "pallas"
    # Distance from the representative origin to each chunk's root box
    # (camera rays share one origin; for mixed batches the mean is only a
    # scheduling heuristic — results are exact for any order).
    eye = jnp.mean(origins, axis=0)
    roots_min = cbvh.bvhs.node_aabb_min[:, 0]
    roots_max = cbvh.bvhs.node_aabb_max[:, 0]
    closest = jnp.clip(eye, roots_min, roots_max)
    perm = jnp.argsort(jnp.sum((closest - eye) ** 2, axis=1))
    best_t = jnp.full((R,), C.MAX_FLOAT, jnp.float32)
    best_tri = jnp.zeros((R,), jnp.int32)   # LOCAL tri id within its chunk
    best_chunk = jnp.zeros((R,), jnp.int32)
    best_u = jnp.zeros((R,), jnp.float32)
    best_v = jnp.zeros((R,), jnp.float32)
    for s in range(S):  # static unroll: one VMEM-sized kernel launch per chunk
        idx = perm[s]
        scene_s = _chunk_scene(cbvh.sscene, idx, cap)
        # Later chunks prune against the best found so far (exact: a hit at
        # or beyond best.t loses the strict-< fold anyway); tables come
        # pre-packed from build time.  The dynamic chunk gathers (tables row)
        # cost ~100 µs of HBM traffic against the ~ms kernel; the unused
        # scene_s payload gathers are dead-code-eliminated on the pallas path
        # (the kernel reads only ``tables``).  The fold keeps the LOCAL tri
        # id + winning chunk and resolves the global id with ONE gather after
        # the loop — the per-chunk global_tri[h.tri] gather it replaces cost
        # ~2.5 ms × S at 512² (v5e gathers ~10 ns/row).
        h = trace_rays(
            scene_s, _chunk_bvh(cbvh.bvhs, idx, cap), origins, dirs,
            impl=impl, t_init=best_t, tables=cbvh.tables[idx],
        )
        win = h.t < best_t  # ties → earlier-traced (nearer) chunk
        best_t = jnp.where(win, h.t, best_t)
        best_tri = jnp.where(win, h.tri, best_tri)
        best_chunk = jnp.where(win, idx, best_chunk)
        best_u = jnp.where(win, h.u, best_u)
        best_v = jnp.where(win, h.v, best_v)
    gtri = cbvh.sscene.global_tri[best_chunk, best_tri]
    # Miss ⇒ tri = 0 (the reference's quirk, kept by every engine).
    gtri = jnp.where(best_t < C.MAX_FLOAT, gtri, 0)
    return HitRecord(t=best_t, tri=gtri, u=best_u, v=best_v)


def render_hits_chunked(
    scene: Scene, cbvh: ChunkedBvh, cam, impl: str = "auto"
) -> HitRecord:
    """Primary-ray trace of a chunked scene in tile-major packet order
    (mirrors ops/dispatch.camera_trace — reshape/transpose reordering, no
    permutation gathers); ``scene`` is the original unchunked scene, used
    only for shape/shading downstream."""
    from unitysimpleraytracing_tpu.core.camera import generate_rays
    from unitysimpleraytracing_tpu.ops.dispatch import _row_major, _tile_major

    origins, dirs = generate_rays(cam)
    h, w = cam.height, cam.width
    if h % 32 == 0 and w % 32 == 0:
        hits = trace_chunked(
            cbvh,
            _tile_major(origins, h, w, 32),
            _tile_major(dirs, h, w, 32),
            impl=impl,
        )
        return HitRecord(
            t=_row_major(hits.t, h, w, 32),
            tri=_row_major(hits.tri, h, w, 32),
            u=_row_major(hits.u, h, w, 32),
            v=_row_major(hits.v, h, w, 32),
        )
    return trace_chunked(cbvh, origins, dirs, impl=impl)
