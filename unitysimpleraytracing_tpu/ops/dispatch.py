"""Traversal implementation dispatch.

Four interchangeable traversal engines, one contract (bit-compatible hit
records; see trace_packet.py for the exactness argument):

- ``pallas4`` — the production TPU kernel (trace_pallas4): wide 4-child
  records (collapsed Karras pairs), one fetch advances two tree levels;
  static-lane fetch to ~280K tris, 2-way switch to ~580K.
- ``pallas``  — the binary-record TPU kernel (trace_pallas); kept as the
  measured baseline and for the dynamic paths.
- ``packet``  — XLA shared-stack packets; works everywhere (CPU tests).
- ``perray``  — XLA per-ray stacks, the direct analog of the reference's one
  thread per pixel; reference/debug.

``auto`` picks pallas4 on TPU when the scene fits, else packet.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from unitysimpleraytracing_tpu.core.types import Bvh, HitRecord, Scene
from unitysimpleraytracing_tpu.ops import trace, trace_packet, trace_pallas, trace_pallas4

# VMEM budget: measured 128 MB/core on the bench chip (see trace_pallas).
# Packed node+triangle tables cost 128 B per element → ~600K fits with room
# for the ray/output windows; beyond that the chunked/sharded paths take over.
PALLAS_MAX_CAPACITY = trace_pallas.PACKED_MAX_CAPACITY


class CapacityError(ValueError):
    """Scene exceeds the single-kernel traversal capacity on TPU.

    The reference makes its envelope explicit by allocating everything at a
    hard 524 288-element cap (Constants.cs:3-6).  This framework's explicit
    envelope: the Pallas kernels hold their traversal tables VMEM-resident,
    which bounds a single-BVH dispatch at ~600K triangles — beyond it, use
    ``build_bvh_chunked`` + ``render_frame_chunked``/``trace_chunked`` (the
    measured large-scene path, what the CLI auto-routes to), or pass
    ``impl="packet"`` explicitly to accept the ~100x-slower XLA fallback.
    Raised instead of silently falling off the performance cliff."""


def resolve_impl(impl: str, capacity: int) -> str:
    if impl != "auto":
        return impl
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and capacity <= trace_pallas4.PACKED4_MAX_CAPACITY:
        return "pallas4"
    if on_tpu and capacity <= PALLAS_MAX_CAPACITY:
        return "pallas"
    if on_tpu:
        raise CapacityError(
            f"scene capacity {capacity} exceeds the single-BVH kernel bound "
            f"({PALLAS_MAX_CAPACITY} triangles of VMEM-resident tables). Use "
            f"build_bvh_chunked + render_frame_chunked/trace_chunked for "
            f"large scenes (pipeline/chunked.py — the measured 1M perf "
            f"default), trace_pallas4.traverse_packets_pallas4(..., "
            f"hbm=True) for a single-tree trace with HBM-streamed records "
            f"(no table ceiling; ~1.3x slower than chunked at 1M), or "
            f"request impl='packet' explicitly to accept the slow XLA "
            f"fallback."
        )
    return "packet"


def trace_rays(
    scene: Scene,
    bvh: Bvh,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    impl: str = "auto",
    tables=None,
    t_init=None,
    anyhit_thresh=None,
    rows: int | None = None,
    popn: int | None = None,
) -> HitRecord:
    """Trace an (R, 3) ray batch with the chosen engine, padding R as needed.

    ``rows`` overrides the pallas4 packet height (sublanes of 128 rays;
    default 8 = 1024-ray packets — the measured optimum for coherent loads).
    ``popn`` overrides the pallas4 records-per-iteration pop depth (default
    8 flat / 2 packed, the measured coherent-load optimum).

    Rays should arrive in a coherent order (image-tile order for camera rays).
    ``tables`` optionally carries `trace_pallas.prepare_tables` output so a
    static scene is packed once, not per frame.  ``t_init`` (optional (R,)
    f32) is an exact pruning bound from a previous traversal (chunk/hop);
    engines that cannot exploit it ignore it — results are identical either
    way (a candidate at or beyond the bound can never win the caller's
    strict-< fold).  ``anyhit_thresh`` (optional (R,) f32, 0 = off) is the
    occlusion early-exit: engines that support it collapse a ray's t to 0 at
    the first hit strictly below the threshold (the occlusion BOOLEAN
    ``hit & (t < thresh)`` is identical either way — the nearest hit is
    minimal, so one below-threshold hit exists iff the nearest is below).
    """
    impl = resolve_impl(impl, bvh.capacity)
    if impl == "perray":
        return trace.traverse(scene, bvh, origins, dirs)

    packet = trace_pallas.PACKET
    R = origins.shape[0]
    pad = (-R) % packet
    if pad:
        origins = jnp.concatenate([origins, jnp.broadcast_to(origins[:1], (pad, 3))])
        dirs = jnp.concatenate([dirs, jnp.broadcast_to(dirs[:1], (pad, 3))])
        if t_init is not None:
            t_init = jnp.concatenate(
                [t_init, jnp.zeros((pad,), jnp.float32)]  # padding: cull all
            )
        if anyhit_thresh is not None:
            anyhit_thresh = jnp.concatenate(
                [anyhit_thresh, jnp.zeros((pad,), jnp.float32)]
            )

    if impl == "pallas4":
        hits = trace_pallas4.traverse_packets_pallas4(
            scene, bvh, origins, dirs,
            interpret=jax.default_backend() == "cpu", tables=tables,
            t_init=t_init, anyhit_thresh=anyhit_thresh,
            **({} if rows is None else {"rows": rows}),
            **({} if popn is None else {"popn": popn}),
        )
    elif impl == "pallas":
        hits = trace_pallas.traverse_packets_pallas(
            scene, bvh, origins, dirs,
            interpret=jax.default_backend() == "cpu", tables=tables,
            t_init=t_init, anyhit_thresh=anyhit_thresh,
        )
    elif impl == "packet":
        hits = trace_packet.traverse_packets(scene, bvh, origins, dirs, packet_size=packet)
    else:
        raise ValueError(f"unknown traversal impl {impl!r}")

    if pad:
        hits = HitRecord(
            t=hits.t[:R], tri=hits.tri[:R], u=hits.u[:R], v=hits.v[:R]
        )
    return hits


def occluded(
    scene: Scene,
    bvh: Bvh,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    impl: str = "auto",
    eps: float = 4e-3,
    tables=None,
    origin_bound: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Shadow/occlusion query: True where geometry blocks the ray beyond
    ``eps`` of its origin.  A capability beyond the reference (its shading
    has no shadow rays); BASELINE.json config 3 stresses it.

    Traced BACKWARD from a point outside the scene toward the origin: the
    parity-exact engines inherit the reference's acceptance quirk of keeping
    negative-t intersections whenever the origin sits inside a triangle's
    inflated AABB (Raytracing.compute:89-103 has no t>0 test), which poisons
    forward queries that start ON a surface — the self-hit at t≈-ε wins the
    nearest-hit compare.  Starting from outside the scene no box contains the
    origin, so every accepted t is positive; anything strictly between the
    far point and ``origin + eps·dir`` is a real occluder.

    ``origin_bound``: optional scalar upper bound on ``max|origins|``.  By
    default the far scale is derived from the actual batch, which makes the
    arithmetic depend on which rays share the call — callers that need
    batch-invariant results (the shadow passes, which must be bit-identical
    whether frames are rendered one at a time or batched) pass a bound
    derived from the scene alone.
    """
    ext = jnp.maximum(
        jnp.max(jnp.abs(scene.aabb_min)), jnp.max(jnp.abs(scene.aabb_max))
    )
    if origin_bound is None:
        origin_bound = jnp.max(jnp.abs(origins))
    far = 4.0 * ext + origin_bound + 1.0
    back_origins = origins + dirs * far
    # Occlusion needs a boolean, not the nearest hit: the any-hit threshold
    # lets the kernel retire a ray at its FIRST qualifying hit (t collapses
    # to 0, which still satisfies hit & t < far-eps below).  Engines without
    # any-hit support ignore it and answer via their nearest hit — the
    # boolean is identical (the nearest hit is minimal).
    thresh = jnp.broadcast_to(far - eps, (origins.shape[0],)).astype(jnp.float32)
    hits = trace_rays(
        scene, bvh, back_origins, -dirs, impl=impl, tables=tables,
        anyhit_thresh=thresh,
    )
    return hits.hit & (hits.t < far - eps)


def _tile_major(x: jnp.ndarray, h: int, w: int, tile: int) -> jnp.ndarray:
    """Row-major (H*W, ...) → 2D-tile-major, as a reshape/transpose (the
    permutation of trace_packet.tiled_ray_order without the gather — TPU
    gathers of 262K rows cost milliseconds; transposes are ~free)."""
    rest = x.shape[1:]
    x = x.reshape(h // tile, tile, w // tile, tile, *rest)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(h * w, *rest)


def _row_major(x: jnp.ndarray, h: int, w: int, tile: int) -> jnp.ndarray:
    """Inverse of `_tile_major`."""
    rest = x.shape[1:]
    x = x.reshape(h // tile, w // tile, tile, tile, *rest)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(h * w, *rest)


def camera_trace(
    scene: Scene, bvh: Bvh, cam, impl: str = "auto", tables=None
) -> HitRecord:
    """Primary-ray trace in tile-major order (the reference's 32×32 thread
    groups, RaytracingMeshDrawer.cs:83), results returned in row-major pixel
    order."""
    from unitysimpleraytracing_tpu.core.camera import generate_rays

    origins, dirs = generate_rays(cam)
    h, w = cam.height, cam.width
    if h % 32 == 0 and w % 32 == 0:
        hits = trace_rays(
            scene,
            bvh,
            _tile_major(origins, h, w, 32),
            _tile_major(dirs, h, w, 32),
            impl=impl,
            tables=tables,
        )
        return HitRecord(
            t=_row_major(hits.t, h, w, 32),
            tri=_row_major(hits.tri, h, w, 32),
            u=_row_major(hits.u, h, w, 32),
            v=_row_major(hits.v, h, w, 32),
        )
    return trace_rays(scene, bvh, origins, dirs, impl=impl, tables=tables)
