"""Traversal parity: vectorized TPU traversal vs brute force and vs the exact
scalar DFS replica (including tie-breaking on shared-edge hits)."""
import jax.numpy as jnp
import numpy as np
import pytest

from unitysimpleraytracing_tpu import build_bvh, build_scene, cube_mesh, random_triangle_soup
from unitysimpleraytracing_tpu.ops import trace
from unitysimpleraytracing_tpu.utils import reference_impl


def _random_rays(n, seed, bound=60.0):
    rng = np.random.default_rng(seed)
    origins = rng.uniform(-bound, bound, size=(n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return origins, dirs


@pytest.mark.parametrize("n_tris,n_rays", [(12, 256), (300, 512)])
def test_traverse_matches_brute_force(n_tris, n_rays):
    mesh = random_triangle_soup(n_tris, seed=n_tris, bound=5.0, tri_size=1.0)
    scene = build_scene(mesh)
    bvh = build_bvh(scene)
    origins, dirs = _random_rays(n_rays, seed=1, bound=8.0)

    got = trace.traverse(scene, bvh, jnp.asarray(origins), jnp.asarray(dirs))
    want = trace.brute_force_trace(scene, jnp.asarray(origins), jnp.asarray(dirs))

    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(want.t))
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(want.tri))
    np.testing.assert_array_equal(np.asarray(got.u), np.asarray(want.u))
    np.testing.assert_array_equal(np.asarray(got.v), np.asarray(want.v))


def _scalar_traverse_all(scene, bvh, origins, dirs):
    n = scene.count
    args = dict(
        node_min=np.asarray(bvh.node_aabb_min),
        node_max=np.asarray(bvh.node_aabb_max),
        left=np.asarray(bvh.left),
        right=np.asarray(bvh.right),
        lleaf=np.asarray(bvh.left_is_leaf),
        rleaf=np.asarray(bvh.right_is_leaf),
        sorted_tri=np.asarray(bvh.sorted_tri),
        tri_min=np.asarray(scene.aabb_min),
        tri_max=np.asarray(scene.aabb_max),
        tri_a=np.asarray(scene.triangles.a),
        tri_b=np.asarray(scene.triangles.b),
        tri_c=np.asarray(scene.triangles.c),
    )
    out = [reference_impl.traverse_one_ray(origins[i], dirs[i], **args) for i in range(len(origins))]
    t = np.array([o[0] for o in out], np.float32)
    tri = np.array([o[1] for o in out], np.int64)
    u = np.array([o[2] for o in out], np.float32)
    v = np.array([o[3] for o in out], np.float32)
    return t, tri, u, v


def test_traverse_matches_scalar_replica_exactly():
    """Bit-exact vs the order-preserving scalar DFS — includes rays through
    the cube's shared edges/corners where tie-breaking decides the winner."""
    mesh = cube_mesh(size=2.0)
    scene = build_scene(mesh)
    bvh = build_bvh(scene)

    # Rays aimed at edge/corner/face-center points from outside (exact ties),
    # plus random rays.
    targets = np.array(
        [
            [1, 1, 1], [1, 1, -1], [-1, 1, 1], [-1, -1, -1],  # corners
            [1, 1, 0], [0, 1, 1], [1, 0, 1], [-1, 0, -1],     # edges
            [1, 0, 0], [0, 0, 1], [0, 1, 0],                  # face centers
            [0.3, 0.2, 1], [-1, 0.4, -0.1],
        ],
        np.float32,
    )
    eye = np.array([4.0, 3.0, 5.0], np.float32)
    dirs = targets - eye
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = np.broadcast_to(eye, dirs.shape).astype(np.float32)
    ro, rd = _random_rays(64, seed=2, bound=4.0)
    origins = np.concatenate([origins, ro])
    dirs = np.concatenate([dirs, rd])

    got = trace.traverse(scene, bvh, jnp.asarray(origins), jnp.asarray(dirs))
    t, tri, u, v = _scalar_traverse_all(scene, bvh, origins, dirs)

    # BASELINE.json parity bar: bit-identical hit ids, ULP-bounded t.
    # Cross-substrate caveat: XLA:CPU fuses multiply-adds, so a ray that hits
    # two triangles at the *same* geometric distance (shared cube edges) can
    # see their strict-< ordering flip on 1-ULP differences. Ids must match
    # everywhere except such genuine ties, where both t's agree to tolerance.
    gt, gtri = np.asarray(got.t), np.asarray(got.tri)
    gu, gv = np.asarray(got.u), np.asarray(got.v)
    # Hit/miss may flip only on exact boundary grazes (corner/edge rays where
    # the barycentric acceptance test sits on u/v/u+v boundaries within ULPs).
    ghit, shit = gt != reference_impl.MAX_FLOAT, t != reference_impl.MAX_FLOAT
    flipped = ghit != shit
    if np.any(flipped):
        eps = 2e-6
        bu = np.where(ghit, gu, u)
        bv = np.where(ghit, gv, v)
        graze = np.minimum.reduce([np.abs(bu), np.abs(bv), np.abs(1.0 - bu - bv),
                                   np.abs(1.0 - bu), np.abs(1.0 - bv)]) <= eps
        assert np.all(graze[flipped]), "hit/miss flip on a non-graze ray"
    hit = shit & ghit
    np.testing.assert_allclose(gt[hit], t[hit], rtol=1e-6)
    id_mismatch = (gtri != tri) & hit
    assert np.all(np.abs(gt[id_mismatch] - t[id_mismatch]) <= 2e-6 * np.abs(t[id_mismatch])), (
        "hit-id mismatch that is not a ULP-level tie"
    )
    same = hit & ~id_mismatch
    np.testing.assert_allclose(np.asarray(got.u)[same], u[same], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.v)[same], v[same], atol=1e-5)


def test_ray_from_inside_cube_hits():
    mesh = cube_mesh(size=2.0)
    scene = build_scene(mesh)
    bvh = build_bvh(scene)
    origins = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    hits = trace.traverse(scene, bvh, origins, dirs)
    assert bool(hits.hit[0])
    np.testing.assert_allclose(float(hits.t[0]), 1.0, atol=1e-5)


def test_miss_returns_max_float_and_tri_zero():
    mesh = cube_mesh(size=1.0)
    scene = build_scene(mesh)
    bvh = build_bvh(scene)
    origins = jnp.asarray([[10.0, 10.0, 10.0]], jnp.float32)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    hits = trace.traverse(scene, bvh, origins, dirs)
    assert not bool(hits.hit[0])
    assert float(hits.t[0]) == reference_impl.MAX_FLOAT
    assert int(hits.tri[0]) == 0  # Raytracing.compute:130 default
