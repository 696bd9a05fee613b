"""End-to-end BVH build: sort → uniquify → topology → refit.

The reference performs this once in ``Awake`` as a sequence of host-driven
GPU dispatches with CPU round-trips between stages
(``RaytracingMeshDrawer.cs:30-55``, SURVEY §3.1).  Here the whole build is a
single jitted device program: XLA fuses the stages and nothing returns to the
host.  The sort carries the triangle indices exactly like the reference's
(key, value) pair sort; ``distribute_keys`` then replaces the reference's
GPU→CPU→GPU uniquification round-trip (MeshBufferContainer.cs:154-169).
"""
from __future__ import annotations

import functools

import jax

from unitysimpleraytracing_tpu import constants as C
from unitysimpleraytracing_tpu.core.types import Bvh, Scene
from unitysimpleraytracing_tpu.ops import lbvh, sort, unique


@functools.partial(jax.jit, static_argnames=("sort_impl",))
def build_bvh(scene: Scene, sort_impl: str = "xla") -> Bvh:
    """Construct the LBVH for a scene. Requires scene.count >= 2."""
    if isinstance(scene.count, int) and scene.count < 2:
        raise ValueError("LBVH needs at least 2 triangles (reference assumes the same)")
    keys, sorted_tri = sort.sort_key_val(
        scene.morton, scene.tri_index, impl=sort_impl
    )
    keys = unique.distribute_keys(keys, scene.count)
    return lbvh.build_bvh_from_sorted(
        keys, sorted_tri, scene.aabb_min, scene.aabb_max, scene.count
    )
