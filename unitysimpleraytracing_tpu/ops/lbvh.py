"""Karras LBVH construction: topology + deterministic atomics-free AABB refit.

Topology is the Karras 2012 binary-radix-tree build, one (vmapped) program per
internal node, matching ``Assets/_Shaders/BVH/BVH.compute``:
``delta`` (:23-33), ``DetermineRange`` (:35-52), ``FindSplit`` (:54-92) and the
child/parent linking (:111-148).  Because children are always ``split`` and
``split+1``, the child arrays need no scatter; only parent links do.

The reference's bottom-up refit uses a per-node ``InterlockedCompareExchange``
gate — one thread per leaf races up the parent chain and the second arrival
merges (BVH.compute:172-220).  TPUs have no device-wide atomics, and XLA
programs are deterministic; the refit is redesigned as a *level-ordered sweep*:
compute each internal node's depth (root=0), then iterate levels deepest→0,
each pass merging child AABBs for exactly the nodes at that level with masked
vectorized updates.  Contract identical to the reference: every internal AABB
is the merge of its children; leaf AABBs resolve through the sorted-triangle
indirection (BVH.compute:203,212).  Tree depth for k-bit distinct keys is ≤ k
(the common-prefix length strictly increases per level), so after
``distribute_keys`` (≤31-bit keys) the sweep needs ≤ 32 passes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from unitysimpleraytracing_tpu.core.types import Bvh


def _clz_xor(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Common-prefix length of two uint32 codes (BVH.compute:18-21 clz32)."""
    return jax.lax.clz(a ^ b).astype(jnp.int32)


def _make_delta(codes: jnp.ndarray, n: int):
    """delta(x, y) = clz(code[x] ^ code[y]), or -1 out of range
    (BVH.compute:23-33). Assumes distinct codes (guaranteed by
    distribute_keys)."""

    def delta(x, y):
        valid = (x >= 0) & (x <= n - 1) & (y >= 0) & (y <= n - 1)
        xc = codes[jnp.clip(x, 0, n - 1)]
        yc = codes[jnp.clip(y, 0, n - 1)]
        return jnp.where(valid, _clz_xor(xc, yc), -1)

    return delta


def _determine_range(delta, i):
    """Exponential probe + binary search for node i's key range
    (BVH.compute:35-52)."""
    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1))
    dmin = delta(i, i - d)

    lmax = jax.lax.while_loop(
        lambda l: delta(i, i + l * d) > dmin, lambda l: l * 2, jnp.int32(2)
    )

    def bin_body(carry):
        l, t = carry
        take = delta(i, i + (l + t) * d) > dmin
        return jnp.where(take, l + t, l), t // 2

    l, _ = jax.lax.while_loop(
        lambda c: c[1] >= 1, bin_body, (jnp.int32(0), lmax // 2)
    )
    j = i + l * d
    return jnp.minimum(i, j), jnp.maximum(i, j)


def _find_split(codes, n, first, last):
    """Highest index sharing more prefix bits with ``first`` than the range's
    common prefix (BVH.compute:54-92). The equal-codes fallback (:63-64) is
    kept for safety though unreachable after distribute_keys."""
    first_code = codes[first]
    last_code = codes[jnp.clip(last, 0, n - 1)]
    common = _clz_xor(first_code, last_code)

    def body(carry):
        split, step = carry
        step = (step + 1) >> 1
        new_split = split + step
        in_range = new_split < last
        split_code = codes[jnp.clip(new_split, 0, n - 1)]
        take = in_range & (_clz_xor(first_code, split_code) > common)
        return jnp.where(take, new_split, split), step

    # do { ... } while (step > 1): run once, then loop on the post-condition.
    split, step = body((first, last - first))
    split, _ = jax.lax.while_loop(lambda c: c[1] > 1, body, (split, step))
    return jnp.where(first_code == last_code, (first + last) >> 1, split)


@jax.jit
def build_topology(codes: jnp.ndarray, count):
    """All internal-node ranges/splits at once (vmapped Karras).

    Returns (left, right, left_is_leaf, right_is_leaf, internal_parent,
    leaf_parent), each shaped (capacity,), int32/bool; invalid rows (i >=
    count-1) carry sentinel -1 links.
    """
    cap = codes.shape[0]
    n = jnp.asarray(count, jnp.int32)
    delta = _make_delta(codes, n)

    def one_node(i):
        first, last = _determine_range(delta, i)
        split = _find_split(codes, n, first, last)
        return first, last, split

    ids = jnp.arange(cap, dtype=jnp.int32)
    safe_ids = jnp.clip(ids, 0, jnp.maximum(n - 2, 0))
    first, last, split = jax.vmap(one_node)(safe_ids)

    valid = ids < n - 1
    left = jnp.where(valid, split, -1)
    right = jnp.where(valid, split + 1, -1)
    left_is_leaf = valid & (split == first)
    right_is_leaf = valid & (split + 1 == last)

    # Parent links via masked scatters (drop out-of-range → masked rows inert).
    drop = jnp.int32(cap)
    internal_parent = jnp.full(cap, -1, jnp.int32)
    leaf_parent = jnp.full(cap, -1, jnp.int32)
    li = jnp.where(valid & ~left_is_leaf, left, drop)
    ri = jnp.where(valid & ~right_is_leaf, right, drop)
    internal_parent = internal_parent.at[li].set(ids, mode="drop")
    internal_parent = internal_parent.at[ri].set(ids, mode="drop")
    ll = jnp.where(left_is_leaf, left, drop)
    rl = jnp.where(right_is_leaf, right, drop)
    leaf_parent = leaf_parent.at[ll].set(ids, mode="drop")
    leaf_parent = leaf_parent.at[rl].set(ids, mode="drop")

    return left, right, left_is_leaf, right_is_leaf, internal_parent, leaf_parent


@jax.jit
def compute_depths(internal_parent: jnp.ndarray, count) -> jnp.ndarray:
    """Depth of every internal node from the root (node 0) by parent chasing.

    O(depth) masked gather passes; depth ≤ 32 post-distribute_keys. This
    replaces the role of the reference's atomic visit-counters in ordering the
    bottom-up merge.
    """
    cap = internal_parent.shape[0]
    ids = jnp.arange(cap, dtype=jnp.int32)
    valid = ids < count - 1
    ptr = jnp.where(valid, internal_parent, -1)
    depth = jnp.zeros(cap, jnp.int32)

    def cond(carry):
        ptr, _ = carry
        return jnp.any(ptr >= 0)

    def body(carry):
        ptr, depth = carry
        alive = ptr >= 0
        depth = depth + alive.astype(jnp.int32)
        nxt = internal_parent[jnp.clip(ptr, 0, cap - 1)]
        return jnp.where(alive, nxt, -1), depth

    _, depth = jax.lax.while_loop(cond, body, (ptr, depth))
    return jnp.where(valid, depth, -1)


@jax.jit
def refit(
    left,
    right,
    left_is_leaf,
    right_is_leaf,
    depth,
    sorted_tri,
    tri_aabb_min,
    tri_aabb_max,
    count,
):
    """Level-ordered AABB refit (deterministic replacement for
    BVH.compute:172-220).

    For each level from deepest to root: every node at that level merges its
    children's boxes — internal child boxes from this sweep's earlier passes,
    leaf child boxes via ``tri_aabb[sorted_tri[leaf]]`` exactly like
    BVH.compute:203,212.
    """
    cap = left.shape[0]
    ids = jnp.arange(cap, dtype=jnp.int32)
    valid = ids < count - 1
    node_min = jnp.zeros((cap, 3), jnp.float32)
    node_max = jnp.zeros((cap, 3), jnp.float32)

    lc = jnp.clip(left, 0, cap - 1)
    rc = jnp.clip(right, 0, cap - 1)
    l_tri = sorted_tri[lc]
    r_tri = sorted_tri[rc]
    max_depth = jnp.max(jnp.where(valid, depth, -1))

    def body(carry):
        level, node_min, node_max = carry
        lmin = jnp.where(left_is_leaf[:, None], tri_aabb_min[l_tri], node_min[lc])
        lmax = jnp.where(left_is_leaf[:, None], tri_aabb_max[l_tri], node_max[lc])
        rmin = jnp.where(right_is_leaf[:, None], tri_aabb_min[r_tri], node_min[rc])
        rmax = jnp.where(right_is_leaf[:, None], tri_aabb_max[r_tri], node_max[rc])
        m = (valid & (depth == level))[:, None]
        node_min = jnp.where(m, jnp.minimum(lmin, rmin), node_min)
        node_max = jnp.where(m, jnp.maximum(lmax, rmax), node_max)
        return level - 1, node_min, node_max

    _, node_min, node_max = jax.lax.while_loop(
        lambda c: c[0] >= 0, body, (max_depth, node_min, node_max)
    )
    return node_min, node_max


def build_bvh_from_sorted(
    codes: jnp.ndarray,
    sorted_tri: jnp.ndarray,
    tri_aabb_min: jnp.ndarray,
    tri_aabb_max: jnp.ndarray,
    count,
    static_count: int | None = None,
) -> Bvh:
    """Full LBVH from uniquified sorted codes (the reference's
    ConstructTree + ConstructBVH sequence, BVHConstructor.cs:61-69).

    ``count`` may be traced (ragged shards); pytree containers need static
    metadata, so ``static_count`` (a plain int, e.g. the capacity) must be
    supplied in that case and is what lands in ``Bvh.count``."""
    if static_count is None:
        if not isinstance(count, int):
            raise TypeError("traced count requires an explicit static_count")
        static_count = count
    (
        left,
        right,
        left_is_leaf,
        right_is_leaf,
        internal_parent,
        leaf_parent,
    ) = build_topology(codes, count)
    depth = compute_depths(internal_parent, count)
    node_min, node_max = refit(
        left,
        right,
        left_is_leaf,
        right_is_leaf,
        depth,
        sorted_tri,
        tri_aabb_min,
        tri_aabb_max,
        count,
    )
    return Bvh(
        left=left,
        right=right,
        left_is_leaf=left_is_leaf,
        right_is_leaf=right_is_leaf,
        internal_parent=internal_parent,
        leaf_parent=leaf_parent,
        node_aabb_min=node_min,
        node_aabb_max=node_max,
        sorted_tri=sorted_tri,
        depth=depth,
        count=static_count,
    )
