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

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("count",))
def distribute_keys(sorted_keys: jnp.ndarray, count: int) -> jnp.ndarray:
    """Rewrite the first ``count`` sorted keys to be strictly increasing.

    Padding beyond ``count`` is left untouched (it stays 0xFFFFFFFF, matching
    the reference where DistributeKeys only walks trianglesLength entries).
    """
    k = sorted_keys[:count]
    steps = jnp.maximum(k[1:] - k[:-1], jnp.uint32(1))
    new = jnp.concatenate(
        [jnp.zeros((1,), jnp.uint32), jnp.cumsum(steps, dtype=jnp.uint32)]
    )
    return sorted_keys.at[:count].set(new)
