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

from unitysimpleraytracing_tpu.core.camera import Camera, generate_rays
from unitysimpleraytracing_tpu.core.texture import Texture
from unitysimpleraytracing_tpu.core.types import Bvh, HitRecord, Scene
from unitysimpleraytracing_tpu.ops import trace


@jax.jit
def render_hits(scene: Scene, bvh: Bvh, cam: Camera) -> HitRecord:
    origins, dirs = generate_rays(cam)
    return trace.traverse(scene, bvh, origins, dirs)


@jax.jit
def render_rgba(scene: Scene, bvh: Bvh, cam: Camera, tex: Texture) -> jnp.ndarray:
    """Traced layer as (H, W, 4), row 0 = bottom (Unity UAV orientation)."""
    hits = render_hits(scene, bvh, cam)
    rgba = trace.shade(scene, tex, hits)
    return rgba.reshape(cam.height, cam.width, 4)


@jax.jit
def render_frame(
    scene: Scene,
    bvh: Bvh,
    cam: Camera,
    tex: Texture,
    background: jnp.ndarray,  # (H, W, 3) or (3,) solid color
) -> jnp.ndarray:
    """Full composited frame (H, W, 4)."""
    traced = render_rgba(scene, bvh, cam, tex)
    bg = jnp.broadcast_to(
        jnp.asarray(background, jnp.float32), (cam.height, cam.width, 3)
    )
    return trace.compose(bg, traced)


def frame_to_image(frame: jnp.ndarray):
    """(H, W, 4) device frame (row 0 = bottom) → top-down numpy for PNG."""
    import numpy as np

    return np.asarray(frame)[::-1]
