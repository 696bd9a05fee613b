"""Parity of the production Pallas traversal kernel (interpret mode on CPU)
against the reference-ordered XLA traversal.

The kernel traverses near-child-first with exact t-culling, so every
non-tied result must match `trace.traverse` bit-for-bit up to cross-substrate
fp-contraction ULPs; ties (shared edges, equal t) may flip ids — the same
bound as the BASELINE.json parity bar (see tests/test_trace.py).
"""
import jax.numpy as jnp
import numpy as np
import pytest

import unitysimpleraytracing_tpu as rt
from unitysimpleraytracing_tpu.ops import dispatch, trace

_TIE_RTOL = 4e-6


def _rays(n, seed, bound=8.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-bound, bound, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _assert_hit_parity(got, ref):
    t_r, t_g = np.asarray(ref.t), np.asarray(got.t)
    tri_r, tri_g = np.asarray(ref.tri), np.asarray(got.tri)
    hit_r, hit_g = t_r != rt.constants.MAX_FLOAT, t_g != rt.constants.MAX_FLOAT
    # Hit/miss flips would mean a wrongly culled (or added) subtree.
    np.testing.assert_array_equal(hit_g, hit_r)
    hit = hit_r
    np.testing.assert_allclose(t_g[hit], t_r[hit], rtol=_TIE_RTOL)
    mism = (tri_g != tri_r) & hit
    tied = np.abs(t_g - t_r) <= _TIE_RTOL * np.abs(t_r)
    assert not np.any(mism & ~tied), "hit-id mismatch that is not an exact-t tie"
    same = hit & ~mism
    np.testing.assert_allclose(np.asarray(got.u)[same], np.asarray(ref.u)[same], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.v)[same], np.asarray(ref.v)[same], atol=1e-5)


@pytest.mark.parametrize(
    "mesh_fn,n_rays",
    [
        (lambda: rt.cube_mesh(size=2.0), 2048),
        (lambda: rt.random_triangle_soup(300, seed=7, bound=5.0, tri_size=1.0), 2048),
        (lambda: rt.terrain_mesh(res=24, size=40.0, amplitude=6.0, seed=0), 1024),
    ],
    ids=["cube", "soup", "terrain"],
)
def test_pallas_kernel_matches_reference_order(mesh_fn, n_rays):
    scene = rt.build_scene(mesh_fn())
    bvh = rt.build_bvh(scene)
    o, d = _rays(n_rays, seed=1)
    ref = trace.traverse(scene, bvh, o, d)
    got = dispatch.trace_rays(scene, bvh, o, d, impl="pallas")
    _assert_hit_parity(got, ref)


def test_pallas_kernel_shared_edge_ties_bounded():
    """Rays aimed exactly at cube edges/corners — the tie-heavy worst case."""
    scene = rt.build_scene(rt.cube_mesh(size=2.0))
    bvh = rt.build_bvh(scene)
    targets = np.array(
        [[1, 1, 1], [1, 1, -1], [-1, -1, -1], [1, 1, 0], [0, 1, 1], [1, 0, 1],
         [1, 0, 0], [0, 0, 1], [0, 1, 0]],
        np.float32,
    )
    eye = np.array([4.0, 3.0, 5.0], np.float32)
    d = targets - eye
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(eye, d.shape).astype(np.float32)
    ref = trace.traverse(scene, bvh, jnp.asarray(o), jnp.asarray(d))
    got = dispatch.trace_rays(scene, bvh, jnp.asarray(o), jnp.asarray(d), impl="pallas")
    t_r, t_g = np.asarray(ref.t), np.asarray(got.t)
    assert np.all(t_r != rt.constants.MAX_FLOAT)
    np.testing.assert_allclose(t_g, t_r, rtol=_TIE_RTOL)
