"""Frame rendering: camera rays → traversal → shading → composition.

The reference's per-frame path (``RaytracingMeshDrawer.cs:76-89``) dispatches
the traversal kernel into an RGBA16F UAV and composites in ``OnRenderImage``.
Here `render_frame` is one jitted program producing the final (H, W, 4) image;
`render_rgba` returns just the traced layer (the UAV analog).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from unitysimpleraytracing_tpu.core.camera import Camera
from unitysimpleraytracing_tpu.core.texture import Texture
from unitysimpleraytracing_tpu.core.types import Bvh, HitRecord, Scene
from unitysimpleraytracing_tpu.ops import trace
from unitysimpleraytracing_tpu.ops.dispatch import camera_trace, resolve_impl


@functools.partial(jax.jit, static_argnames=("impl",))
def _render_hits_impl(scene: Scene, bvh: Bvh, cam: Camera, impl: str) -> HitRecord:
    return camera_trace(scene, bvh, cam, impl=impl)


def render_hits(scene: Scene, bvh: Bvh, cam: Camera, impl: str = "auto") -> HitRecord:
    # Resolve "auto" outside jit so backend/capacity checks stay Python-level.
    return _render_hits_impl(scene, bvh, cam, resolve_impl(impl, bvh.capacity))


@functools.partial(jax.jit, static_argnames=("impl",))
def _render_rgba_impl(scene, bvh, cam, tex, impl) -> jnp.ndarray:
    hits = camera_trace(scene, bvh, cam, impl=impl)
    rgba = trace.shade(scene, tex, hits)
    return rgba.reshape(cam.height, cam.width, 4)


def render_rgba(scene: Scene, bvh: Bvh, cam: Camera, tex: Texture, impl: str = "auto"):
    """Traced layer as (H, W, 4), row 0 = bottom (Unity UAV orientation)."""
    return _render_rgba_impl(scene, bvh, cam, tex, resolve_impl(impl, bvh.capacity))


@functools.partial(jax.jit, static_argnames=("impl",))
def _render_frame_impl(scene, bvh, cam, tex, background, impl) -> jnp.ndarray:
    traced = _render_rgba_impl(scene, bvh, cam, tex, impl)
    bg = jnp.broadcast_to(
        jnp.asarray(background, jnp.float32), (cam.height, cam.width, 3)
    )
    return trace.compose(bg, traced)


def render_frame(
    scene: Scene,
    bvh: Bvh,
    cam: Camera,
    tex: Texture,
    background: jnp.ndarray,  # (H, W, 3) or (3,) solid color
    impl: str = "auto",
) -> jnp.ndarray:
    """Full composited frame (H, W, 4)."""
    return _render_frame_impl(
        scene, bvh, cam, tex, background, resolve_impl(impl, bvh.capacity)
    )


def frame_to_image(frame: jnp.ndarray):
    """(H, W, 4) device frame (row 0 = bottom) → top-down numpy for PNG."""
    import numpy as np

    return np.asarray(frame)[::-1]
