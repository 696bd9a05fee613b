"""Sorted-key uniquification ("DistributeKeys").

The Karras topology kernel requires strictly distinct keys (BVH.compute:29
"we guarantee that x_code != y_code").  The reference guarantees this with a
GPU→CPU→GPU round-trip: download the sorted keys, rewrite them on the host as
a running sum of ``max(diff, 1)``, re-upload (MeshBufferContainer.cs:154-169).

Here the same rewrite is one fused device expression — no host transfer:
``new[0] = 0; new[i] = cumsum(max(sorted[i] - sorted[i-1], 1))``.  The result
is strictly increasing, preserves the relative spacing of distinct codes (so
tree topology over already-unique keys is unchanged), and stays within 31 bits
for 30-bit inputs (max 2^30-1 + n), which keeps Karras tree depth ≤ 32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def distribute_keys(sorted_keys: jnp.ndarray, count) -> jnp.ndarray:
    """Rewrite the first ``count`` sorted keys to be strictly increasing.

    Padding beyond ``count`` is left untouched (it stays 0xFFFFFFFF, matching
    the reference where DistributeKeys only walks trianglesLength entries).
    ``count`` may be a Python int or a traced scalar (ragged shards in the
    distributed build pass per-shard counts dynamically).
    """
    cap = sorted_keys.shape[0]
    idx = jnp.arange(cap)
    prev = jnp.concatenate([sorted_keys[:1], sorted_keys[:-1]])
    steps = jnp.maximum(sorted_keys - prev, jnp.uint32(1))
    steps = jnp.where((idx >= 1) & (idx < count), steps, jnp.uint32(0))
    new = jnp.cumsum(steps, dtype=jnp.uint32)  # new[0] == 0 by masking
    return jnp.where(idx < count, new, sorted_keys)
