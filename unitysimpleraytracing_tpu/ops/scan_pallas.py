"""Pallas TPU exclusive-prefix-scan kernel — the L2 scan primitive.

The reference runs a 3-kernel hierarchical scan (PreScan → BlockSum →
GlobalScan, ``Assets/_Shaders/Sorting/Scan.compute:15-96``) because GPU thread
blocks execute concurrently and must synchronize through dispatch boundaries.
A TPU core executes Pallas grid steps **sequentially**, so the whole scan is
ONE kernel: each grid step scans its chunk locally and accumulates a running
carry in SMEM scratch — the TPU-native collapse of the reference's
inter-dispatch synchronization.

Within a chunk (R, 128) the lane-axis inclusive prefix is a single MXU matmul
with an upper-triangular ones matrix (the TPU replacement for the reference's
wave-intrinsic ``WavePrefixSum``, Scan.compute:25,37,66,78 — there are no wave
ops on TPU; the systolic array does 128 prefix sums in one pass), and the
cross-row combine is a static unrolled loop over the R sublanes.

Exactness: sums are carried in f32, exact for totals < 2**24 — always true
for the sort's histogram scans (total = number of keys ≤ 2**20 benchmark
sizes; asserted in the wrapper for int inputs).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_ROWS = 8          # sublanes per chunk
CHUNK = _ROWS * _LANE  # 1024 elements per grid step


def _kernel(x, out, carry):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[0] = 0.0

    xb = x[0]  # (R, LANE) f32
    # Inclusive prefix along lanes: one MXU matmul with upper-tri ones.
    upper = (
        jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
    ).astype(jnp.float32)
    incl = jnp.dot(xb, upper, preferred_element_type=jnp.float32)  # (R, LANE)
    excl = incl - xb

    # Cross-row bases: static unroll over the R sublanes (row-major order).
    base = carry[0]
    rows = []
    for r in range(_ROWS):
        rows.append(excl[r] + base)
        base = base + incl[r, _LANE - 1]
    out[0] = jnp.stack(rows)
    carry[0] = base


@functools.lru_cache(maxsize=32)
def _scan_fn(nchunks: int, interpret: bool):
    call = pl.pallas_call(
        _kernel,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((1, _ROWS, _LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, _ROWS, _LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nchunks, _ROWS, _LANE), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )

    @jax.jit
    def run(x):
        n = x.shape[0]
        pad = nchunks * CHUNK - n
        xf = x.astype(jnp.float32)
        if pad:
            xf = jnp.concatenate([xf, jnp.zeros((pad,), jnp.float32)])
        out = call(xf.reshape(nchunks, _ROWS, _LANE))
        return out.reshape(-1)[:n]

    return run


def exclusive_scan(x: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """Exclusive prefix sum of a 1-D array (``out[i] = sum(x[:i])``).

    Integer inputs must have a total below 2**24 (f32-exact carry); the result
    is returned in the input dtype.
    """
    assert x.ndim == 1, "exclusive_scan expects a 1-D array"
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = x.shape[0]
    nchunks = -(-n // CHUNK)
    out = _scan_fn(nchunks, interpret)(x)
    if jnp.issubdtype(x.dtype, jnp.integer):
        out = out.astype(x.dtype)
    return out


def exclusive_scan_reference(x: np.ndarray) -> np.ndarray:
    """Host oracle (the reference's CPU validator recurrence,
    ComputeBufferSorter.cs:256-271)."""
    out = np.zeros_like(x)
    out[1:] = np.cumsum(x)[:-1]
    return out
