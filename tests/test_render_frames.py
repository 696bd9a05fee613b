"""Batched animation rendering (pipeline/render.render_frames).

The batched path flattens F frames into one ray dispatch; it must be
bit-identical to F independent render_frame calls (same packets per frame —
tile-major order is applied per frame before concatenation).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import unitysimpleraytracing_tpu as rt


@pytest.fixture(scope="module")
def setup():
    mesh = rt.terrain_mesh(res=12, size=8.0, amplitude=1.5, seed=0)
    scene = rt.build_scene(mesh)
    bvh = rt.build_bvh(scene)
    tex = rt.solid_texture((0.8, 0.7, 0.6, 1.0))
    cams = [
        rt.make_camera(
            eye=(5 * np.cos(a), 4.0, 5 * np.sin(a)), target=(0.0, 0.0, 0.0),
            width=64, height=64,
        )
        for a in (0.1, 1.3, 2.9)
    ]
    stack = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    return scene, bvh, tex, cams, stack


@pytest.mark.parametrize("shadows", [False, True])
def test_batched_frames_bit_identical(setup, shadows):
    scene, bvh, tex, cams, stack = setup
    bg = jnp.asarray([0.1, 0.1, 0.12], jnp.float32)
    batched = rt.render_frames(scene, bvh, stack, tex, bg, shadows=shadows)
    assert batched.shape == (len(cams), 64, 64, 4)
    for i, c in enumerate(cams):
        single = rt.render_frame(scene, bvh, c, tex, bg, shadows=shadows)
        np.testing.assert_array_equal(np.asarray(batched[i]), np.asarray(single))


def test_batched_frames_background_image(setup):
    scene, bvh, tex, cams, stack = setup
    rng = np.random.default_rng(3)
    bg = jnp.asarray(rng.uniform(size=(64, 64, 3)), jnp.float32)
    batched = rt.render_frames(scene, bvh, stack, tex, bg)
    single = rt.render_frame(scene, bvh, cams[1], tex, bg)
    np.testing.assert_array_equal(np.asarray(batched[1]), np.asarray(single))
