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
from unitysimpleraytracing_tpu.ops import dispatch, trace, trace_pallas

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


@pytest.mark.parametrize("popn", [2, 8])
def test_popn_variant_parity(popn):
    """Multi-pop (popn nodes/iteration, packed any-reductions — popn=8 is
    the production default) keeps the same hit set; order changes stay
    within the tie bound."""
    scene = rt.build_scene(rt.terrain_mesh(res=24, size=40.0, amplitude=6.0, seed=0))
    bvh = rt.build_bvh(scene)
    o, d = _rays(2048, seed=2)
    ref = trace.traverse(scene, bvh, o, d)
    got = trace_pallas.traverse_packets_pallas(
        scene, bvh, o, d, interpret=True, popn=popn
    )
    _assert_hit_parity(got, ref)


def test_t_init_culling_is_exact():
    """Seeding the running best from a prior bound changes nothing: rays
    re-traced with their own previous t as t_init return no new hits, and a
    below-best bound suppresses the hit."""
    scene = rt.build_scene(
        rt.random_triangle_soup(300, seed=7, bound=5.0, tri_size=1.0)
    )
    bvh = rt.build_bvh(scene)
    o, d = _rays(1024, seed=9)
    ref = trace_pallas.traverse_packets_pallas(scene, bvh, o, d, interpret=True)
    again = trace_pallas.traverse_packets_pallas(
        scene, bvh, o, d, interpret=True, t_init=ref.t
    )
    # With t_init == its own best, every strict-< accept fails → t == t_init.
    np.testing.assert_array_equal(np.asarray(again.t), np.asarray(ref.t))
    assert not np.any(np.asarray(again.hit) & ~np.asarray(ref.hit))


def test_pallas_parity_at_large_scene_extent():
    """The kernel's ``tmin < t_cur`` cull leans on the 1e-3 AABB inflation
    (MeshBufferContainer.cs:55-63) dominating slab rounding, an argument
    that is tightest at scene extents ~8e3 (f32 eps * 8e3 ~ 1e-3).  Pin
    hit-mask parity near that bound so a margin regression is caught."""
    scene = rt.build_scene(
        rt.terrain_mesh(res=24, size=7800.0, amplitude=1100.0, seed=2)
    )
    bvh = rt.build_bvh(scene)
    o, d = _rays(1024, seed=5, bound=5500.0)
    ref = trace.traverse(scene, bvh, o, d)
    got = dispatch.trace_rays(scene, bvh, o, d, impl="pallas")
    _assert_hit_parity(got, ref)


def test_pallas_parity_beyond_extent_bound_auto_widens():
    """Above the ~8e3 tested extent the packed child boxes auto-widen
    (pack_tables) so the t-cull margin again dominates slab rounding — a
    50 000-unit scene must keep hit-mask parity (it silently risked wrongly
    culled hits before, VERDICT r2 weak #8)."""
    scene = rt.build_scene(
        rt.terrain_mesh(res=24, size=50000.0, amplitude=7000.0, seed=2)
    )
    bvh = rt.build_bvh(scene)
    o, d = _rays(1024, seed=5, bound=35000.0)
    ref = trace.traverse(scene, bvh, o, d)
    got = dispatch.trace_rays(scene, bvh, o, d, impl="pallas")
    _assert_hit_parity(got, ref)
    # And the widen is exactly zero within the bound: a small scene's packed
    # child boxes must equal the child node/leaf boxes bit for bit.
    small = rt.build_scene(rt.cube_mesh(size=2.0))
    sbvh = rt.build_bvh(small)
    tab = np.asarray(trace_pallas.pack_tables(small, sbvh, pack=1))
    lc = int(np.asarray(sbvh.left)[0])
    want = (
        np.asarray(small.aabb_min)[np.asarray(sbvh.sorted_tri)[lc]]
        if bool(np.asarray(sbvh.left_is_leaf)[0])
        else np.asarray(sbvh.node_aabb_min)[lc]
    )
    np.testing.assert_array_equal(tab[0, 0:3], want)


def test_packed_table_layout_parity():
    """Force the densest (pack=4) 4-records-per-row layout on a small
    scene — exercises the 4-way-switch `_fetch` path that production uses
    for 340K–600K-triangle scenes (trace_pallas.py packed layout)."""
    scene = rt.build_scene(
        rt.random_triangle_soup(300, seed=7, bound=5.0, tri_size=1.0)
    )
    bvh = rt.build_bvh(scene)
    o, d = _rays(2048, seed=3)
    ref = trace.traverse(scene, bvh, o, d)
    got = trace_pallas.traverse_packets_pallas(
        scene, bvh, o, d, interpret=True, flat=False
    )
    _assert_hit_parity(got, ref)


def test_prepare_tables_cache_engages_and_evicts():
    """The per-Bvh table cache must return the SAME tables on repeat calls
    (packing is ~4 ms/frame at 65K tris) and evict when the Bvh dies."""
    import gc

    scene = rt.build_scene(rt.cube_mesh(size=2.0))
    bvh = rt.build_bvh(scene)
    t1 = trace_pallas.prepare_tables(scene, bvh)
    t2 = trace_pallas.prepare_tables(scene, bvh)
    assert t1 is t2, "cache miss on identical (scene, bvh)"
    key = id(bvh)
    assert key in trace_pallas._TABLE_CACHE
    # A different scene with the same bvh must not serve the stale entry.
    scene2 = rt.build_scene(rt.cube_mesh(size=2.0))
    t3 = trace_pallas.prepare_tables(scene2, bvh)
    assert t3 is not t1
    del bvh
    gc.collect()
    assert key not in trace_pallas._TABLE_CACHE, "dead Bvh entry not evicted"


def test_anyhit_occlusion_matches_nearest_hit_boolean():
    """The kernel's any-hit early-exit (ray row 7 threshold) collapses t to 0
    at the first below-threshold hit; the occlusion boolean must equal the
    nearest-hit engine's, and an inert (zero) threshold must change nothing."""
    scene = rt.build_scene(rt.terrain_mesh(res=24, size=20.0, amplitude=4.0, seed=0))
    bvh = rt.build_bvh(scene)
    cam = rt.make_camera(eye=(14, 12, 18), target=(0, 0, 0), width=64, height=64)
    from unitysimpleraytracing_tpu.core.camera import generate_rays

    o, d = generate_rays(cam)
    base = trace_pallas.traverse_packets_pallas(scene, bvh, o, d, interpret=True)
    inert = trace_pallas.traverse_packets_pallas(
        scene, bvh, o, d, interpret=True,
        anyhit_thresh=jnp.zeros((o.shape[0],), jnp.float32),
    )
    np.testing.assert_array_equal(np.asarray(inert.t), np.asarray(base.t))
    np.testing.assert_array_equal(np.asarray(inert.tri), np.asarray(base.tri))

    hits = rt.render_hits(scene, bvh, cam)
    pts = np.asarray(o) + np.asarray(d) * np.asarray(hits.t)[:, None]
    pts = np.where(np.asarray(hits.hit)[:, None], pts, 0.0).astype(np.float32)
    ldir = np.broadcast_to(
        np.float32([1, 1, 1]) / np.sqrt(np.float32(3)), pts.shape
    ).astype(np.float32)
    occ_any = dispatch.occluded(scene, bvh, jnp.asarray(pts), jnp.asarray(ldir), impl="pallas")
    occ_ref = dispatch.occluded(scene, bvh, jnp.asarray(pts), jnp.asarray(ldir), impl="packet")
    np.testing.assert_array_equal(np.asarray(occ_any), np.asarray(occ_ref))
    assert float(np.asarray(occ_ref).mean()) > 0.1  # scene actually shadows
