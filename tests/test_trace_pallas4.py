"""Parity of the wide-record (BVH4) Pallas kernel (interpret mode) against
the reference-ordered XLA traversal — same tie bound as the BVH2 kernel
(tests/test_trace_pallas.py): identical hit masks, ULP-bounded t, id flips
only at exact-t ties."""
import jax.numpy as jnp
import numpy as np
import pytest

import unitysimpleraytracing_tpu as rt
from unitysimpleraytracing_tpu.ops import lbvh, trace, trace_pallas4

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
    np.testing.assert_array_equal(hit_g, hit_r)
    hit = hit_r
    np.testing.assert_allclose(t_g[hit], t_r[hit], rtol=_TIE_RTOL)
    mism = (tri_g != tri_r) & hit
    tied = np.abs(t_g - t_r) <= _TIE_RTOL * np.abs(t_r)
    assert not np.any(mism & ~tied), "hit-id mismatch that is not an exact-t tie"


def _run(scene, bvh, o, d, **kw):
    return trace_pallas4.traverse_packets_pallas4(
        scene, bvh, o, d, interpret=True, **kw
    )


def test_bvh4_mask_counts_and_root():
    scene = rt.build_scene(rt.random_triangle_soup(97, seed=1, bound=5.0))
    bvh = rt.build_bvh(scene)
    mask, new_id = trace_pallas4.bvh4_node_mask(bvh)
    mask = np.asarray(mask)
    n = scene.count
    assert mask[0]  # root is a BVH4 node
    m = int(mask.sum())
    assert (n - 1) / 3 - 1 <= m <= (2 * n - 1) / 3 + 1
    assert int(np.asarray(new_id)[0]) == 0


@pytest.mark.parametrize("pack,popn", [(1, 2), (1, 1), (2, 2), (1, 4)])
def test_bvh4_parity_soup(pack, popn):
    scene = rt.build_scene(rt.random_triangle_soup(300, seed=7, bound=5.0, tri_size=1.0))
    bvh = rt.build_bvh(scene)
    o, d = _rays(2048, seed=3)
    ref = trace.traverse(scene, bvh, o, d)
    got = _run(scene, bvh, o, d, pack=pack, popn=popn)
    _assert_hit_parity(got, ref)


def test_bvh4_parity_terrain():
    scene = rt.build_scene(rt.terrain_mesh(res=20, size=20.0, amplitude=4.0, seed=0))
    bvh = rt.build_bvh(scene)
    o, d = _rays(2048, seed=9, bound=14.0)
    ref = trace.traverse(scene, bvh, o, d)
    got = _run(scene, bvh, o, d)
    _assert_hit_parity(got, ref)


def test_bvh4_two_triangles():
    """n=2: the root's children are both leaves → two EMPTY entries."""
    scene = rt.build_scene(rt.cube_mesh(size=2.0))
    bvh = rt.build_bvh(scene)
    o, d = _rays(1024, seed=2, bound=4.0)
    ref = trace.traverse(scene, bvh, o, d)
    got = _run(scene, bvh, o, d)
    _assert_hit_parity(got, ref)


@pytest.mark.parametrize("popn", [1, 2, 8])
def test_bvh4_hbm_streamed_records_bit_identical(popn):
    """hbm=True (record table in HBM, per-pop async copies into VMEM
    scratch) is BIT-identical to the VMEM kernel: same fetched values
    through the same ops, only the fetch transport differs.

    Runs with the persistent compilation cache DISABLED: serializing the
    interpret-mode DMA-semaphore executable after a full suite's state
    segfaults the interpreter inside put/get_executable_and_time
    (reproduced 4x at exactly this test, in both cache directions; the
    same test passes standalone and the cache adds nothing here)."""
    import jax

    jax.config.update("jax_enable_compilation_cache", False)
    try:
        scene = rt.build_scene(
            rt.random_triangle_soup(300, seed=7, bound=5.0, tri_size=1.0)
        )
        bvh = rt.build_bvh(scene)
        o, d = _rays(2048, seed=3)
        want = _run(scene, bvh, o, d, popn=popn)
        got = _run(scene, bvh, o, d, popn=popn, hbm=True)
        np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(want.tri))
        np.testing.assert_array_equal(np.asarray(got.t), np.asarray(want.t))
        np.testing.assert_array_equal(np.asarray(got.u), np.asarray(want.u))
        np.testing.assert_array_equal(np.asarray(got.v), np.asarray(want.v))
    finally:
        jax.config.update("jax_enable_compilation_cache", True)


def test_bvh4_t_init_pruning_exact():
    scene = rt.build_scene(rt.random_triangle_soup(200, seed=5, bound=5.0, tri_size=1.0))
    bvh = rt.build_bvh(scene)
    o, d = _rays(1024, seed=4)
    ref = trace.traverse(scene, bvh, o, d)
    t_ref = np.asarray(ref.t)
    # Seed half the rays with a bound just ABOVE their true hit: result
    # must still find the hit; bound just BELOW: must miss.
    # Additive margin: t can be NEGATIVE (the reference keeps behind-origin
    # hits — no t>0 test), so a multiplicative 1.01 would move the wrong way.
    MAXF = np.float32(rt.constants.MAX_FLOAT)
    eps = np.float32(0.01) * np.maximum(np.abs(t_ref), 1.0).astype(np.float32)
    above = jnp.asarray(np.where(t_ref < 1e30, t_ref + eps, MAXF), jnp.float32)
    got = _run(scene, bvh, o, d, t_init=above)
    _assert_hit_parity(got, ref)
    below = jnp.asarray(np.where(t_ref < 1e30, t_ref - eps, MAXF), jnp.float32)
    got2 = _run(scene, bvh, o, d, t_init=below)
    assert not np.any(np.asarray(got2.t) < np.asarray(below))


def test_bvh4_anyhit_occlusion_matches_nearest():
    scene = rt.build_scene(rt.random_triangle_soup(200, seed=8, bound=5.0, tri_size=1.0))
    bvh = rt.build_bvh(scene)
    o, d = _rays(1024, seed=6)
    ref = trace.traverse(scene, bvh, o, d)
    thr = jnp.full((1024,), 20.0, jnp.float32)
    got = _run(scene, bvh, o, d, anyhit_thresh=thr)
    want = np.asarray(ref.hit) & (np.asarray(ref.t) < 20.0)
    have = np.asarray(got.hit) & (np.asarray(got.t) < 20.0)
    np.testing.assert_array_equal(have, want)


def test_bvh4_node_count_vs_depth_parity():
    """The compacted table indexes agree with an explicit host walk."""
    scene = rt.build_scene(rt.random_triangle_soup(64, seed=12, bound=4.0))
    bvh = lbvh.attach_diagnostics(rt.build_bvh(scene))
    mask, _ = trace_pallas4.bvh4_node_mask(bvh)
    depth = np.asarray(bvh.depth)[: scene.count - 1]
    np.testing.assert_array_equal(
        np.asarray(mask)[: scene.count - 1], depth % 2 == 0
    )


def test_bvh4_dispatch_and_render_path():
    """impl="pallas4" end to end through dispatch + render_hits (interpret),
    bit-compatible with the packet engine up to exact-t ties."""
    from unitysimpleraytracing_tpu.ops import dispatch

    scene = rt.build_scene(rt.terrain_mesh(res=16, size=16.0, amplitude=3.0, seed=1))
    bvh = rt.build_bvh(scene)
    cam = rt.make_camera(
        eye=(12.0, 10.0, 15.0), target=(0.0, 0.0, 0.0),
        width=64, height=64, fov_deg=60.0,
    )
    ref = rt.render_hits(scene, bvh, cam, impl="perray")
    got = rt.render_hits(scene, bvh, cam, impl="pallas4")
    _assert_hit_parity(got, ref)
    # Occlusion path (any-hit plumbing through dispatch.occluded).
    o, d = _rays(1024, seed=3, bound=10.0)
    occ4 = dispatch.occluded(scene, bvh, o, d, impl="pallas4")
    occp = dispatch.occluded(scene, bvh, o, d, impl="packet")
    np.testing.assert_array_equal(np.asarray(occ4), np.asarray(occp))


def test_refit_repack_uses_topology_cache_and_stays_exact():
    """refit_bvh keeps the child-link arrays (flax replace) → the even-depth
    membership cache hits, and the repacked tables must equal a from-scratch
    pack of the refit BVH bit for bit."""
    import jax.numpy as jnp

    scene = rt.build_scene(rt.random_triangle_soup(300, seed=9, bound=5.0, tri_size=1.0))
    bvh = rt.build_bvh(scene)
    m1, n1 = trace_pallas4.bvh4_node_mask(bvh)
    t = scene.triangles
    pos = jnp.stack([t.a, t.b, t.c], axis=1).at[..., 1].add(0.25)
    scene2 = rt.deform_scene(scene, pos)
    bvh2 = rt.refit_bvh(scene2, bvh)
    assert bvh2.left is bvh.left  # topology arrays shared
    m2, n2 = trace_pallas4.bvh4_node_mask(bvh2)
    assert m2 is m1 and n2 is n1  # cache hit
    got = trace_pallas4.prepare_tables4(scene2, bvh2, pack=1)
    cap4, _ = trace_pallas4.table_geometry(got)
    fresh = trace_pallas4.pack_tables4(scene2, bvh2, pack=1, cap4=cap4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(fresh))
    # And the refit tables trace correctly.
    o, d = _rays(1024, seed=10)
    ref = trace.traverse(scene2, bvh2, o, d)
    hit = _run(scene2, bvh2, o, d, tables=got)
    _assert_hit_parity(hit, ref)


def test_bvh4_compressed_records_parity():
    """Compressed (bf16-pair box) records: directed-rounded boxes only WIDEN,
    so hit masks/t match the plain table bit-for-bit on these scenes (the
    strict-< fold rejects the extra slab passes) — VERDICT r3 item 4."""
    for mesh, seed in (
        (rt.random_triangle_soup(300, seed=7, bound=5.0, tri_size=1.0), 3),
        (rt.terrain_mesh(res=12, size=12.0, amplitude=3.0, seed=0), 5),
    ):
        scene = rt.build_scene(mesh)
        bvh = rt.build_bvh(scene)
        o, d = _rays(2048, seed=seed, bound=10.0)
        plain = trace_pallas4.pack_tables4(scene, bvh, pack=1)
        comp = trace_pallas4.compress_tables4(plain)
        assert comp.shape == (plain.shape[0], 52)
        a = _run(scene, bvh, o, d, tables=plain)
        b = _run(scene, bvh, o, d, tables=comp)
        # Same candidates and fold; the two table shapes are separate
        # COMPILES, so fp contraction may differ at ULP level in u/v (the
        # BASELINE parity bar: ids exact, t/u/v ULP-bounded).
        np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
        np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
        np.testing.assert_allclose(
            np.asarray(a.u), np.asarray(b.u), atol=2e-6, rtol=1e-6
        )


def test_compressed_rounding_is_conservative():
    """Every stored bf16 box contains its f32 source box."""
    scene = rt.build_scene(rt.random_triangle_soup(200, seed=9, bound=7.0))
    bvh = rt.build_bvh(scene)
    plain = np.asarray(trace_pallas4.pack_tables4(scene, bvh, pack=1))
    comp = np.asarray(trace_pallas4.compress_tables4(jnp.asarray(plain)))
    iv = comp[:, :12].view(np.uint32)
    mn = (iv & 0xFFFF0000).view(np.float32)
    mx = (iv << 16).view(np.float32)
    for e in range(4):
        src_mn = plain[:, 6 * e:6 * e + 3]
        src_mx = plain[:, 6 * e + 3:6 * e + 6]
        assert np.all(mn[:, 3 * e:3 * e + 3] <= src_mn)
        assert np.all(mx[:, 3 * e:3 * e + 3] >= src_mx)
