"""Headline benchmark: traversal Mrays/s per chip (+ build ms, sort Gkeys/s).

Prints ONE JSON line:
    {"metric": "traversal_mrays_per_s_per_chip", "value": N, "unit": "Mrays/s",
     "vs_baseline": R, "extra": {...}}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` compares
against this framework's own recorded round-1 measurement in
``benchmarks/baseline.json`` (ratio > 1 means faster than round 1).

Scene is procedural (no external assets): BASELINE.json config-2 class —
a ~65K-triangle heightfield surface, 512x512 primary rays from a camera
viewing the whole scene (Stanford-bunny-class workload).
"""
from __future__ import annotations

import json
import os
import time

import sys

import numpy as np


def _note(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


TERRAIN_RES = 182  # 2*(res-1)^2 = 65,522 triangles
WIDTH = HEIGHT = 512
SORT_N = 1 << 20
WARMUP = 2
ITERS = 5


_FETCH_LATENCY = None


def _fetch(x):
    """Force full materialization (block_until_ready can lie through remote
    device tunnels; a value fetch cannot)."""
    import jax

    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def _fetch_latency():
    global _FETCH_LATENCY
    if _FETCH_LATENCY is None:
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda x: x * 2)
        x = jnp.ones(8)
        _fetch(f(x))
        lats = []
        for _ in range(3):
            t0 = time.perf_counter()
            _fetch(f(x))
            lats.append(time.perf_counter() - t0)
        _FETCH_LATENCY = float(np.median(lats))
    return _FETCH_LATENCY


def _timed_reps(fn, reps):
    """Wall time of ``reps`` back-to-back dispatches ending in one value fetch."""
    t0 = time.perf_counter()
    r = None
    for _ in range(reps):
        r = fn()
    _fetch(r)
    return time.perf_counter() - t0


def _median_time(fn, iters=ITERS, warmup=WARMUP, reps=8):
    """Slope-based per-run time: time(reps) − time(1) over (reps − 1) cancels
    every fixed overhead — dispatch latency AND the (volatile, ~30 ms) remote
    value-fetch latency of the device tunnel — without measuring either."""
    for _ in range(warmup):
        _fetch(fn())
    slopes = []
    for _ in range(iters):
        t1 = _timed_reps(fn, 1)
        tn = _timed_reps(fn, reps)
        slopes.append((tn - t1) / (reps - 1))
    return max(float(np.median(slopes)), 1e-9)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    import jax.numpy as jnp

    import unitysimpleraytracing_tpu as rt
    from unitysimpleraytracing_tpu.ops import sort as sort_ops

    mesh = rt.terrain_mesh(res=TERRAIN_RES, size=80.0, amplitude=9.0, seed=0)
    n_tris = mesh.num_triangles
    scene = rt.build_scene(mesh)
    cam = rt.make_camera(
        eye=(55.0, 45.0, 70.0), target=(0.0, 0.0, 0.0),
        width=WIDTH, height=HEIGHT, fov_deg=60.0,
    )

    _note("scene ready")
    # LBVH build (sort + uniquify + topology + refit), ms.
    build_s = _median_time(lambda: rt.build_bvh(scene))
    _note(f"build bench done: {build_s*1e3:.2f} ms")
    bvh = rt.build_bvh(scene)

    # Traversal Mrays/s (the headline).
    trace_s = _median_time(lambda: rt.render_hits(scene, bvh, cam).t)
    _note(f"trace bench done: {trace_s*1e3:.2f} ms")
    mrays = WIDTH * HEIGHT / trace_s / 1e6

    # Radix-capable key/value sort, Gkeys/s.
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 32, size=SORT_N, dtype=np.uint64).astype(np.uint32))
    vals = jnp.arange(SORT_N, dtype=jnp.int32)
    sort_s = _median_time(lambda: sort_ops.sort_key_val(keys, vals)[0])
    _note(f"sort bench done: {sort_s*1e3:.2f} ms")
    gkeys = SORT_N / sort_s / 1e9

    baseline_path = os.path.join(os.path.dirname(__file__), "benchmarks", "baseline.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        base = json.load(open(baseline_path))
        ref = base.get("traversal_mrays_per_s_per_chip")
        if ref:
            vs = mrays / ref

    hit_frac = float(rt.render_hits(scene, bvh, cam).hit.mean())
    print(
        json.dumps(
            {
                "metric": "traversal_mrays_per_s_per_chip",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(vs, 3),
                "extra": {
                    "device": str(jax.devices()[0]),
                    "n_tris": n_tris,
                    "rays": WIDTH * HEIGHT,
                    "hit_frac": round(hit_frac, 4),
                    "lbvh_build_ms": round(build_s * 1e3, 3),
                    "sort_gkeys_per_s": round(gkeys, 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
