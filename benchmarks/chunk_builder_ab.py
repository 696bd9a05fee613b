"""Chunked-1M per-chunk builder A/B: restricted sweep-SAH vs free-order
sweep-SAH chunk trees (VERDICT r4 item 2 at the chunked scale), interleaved
rounds, hit parity.

    python benchmarks/chunk_builder_ab.py [--res 708] [--builders sah sah_free]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH = HEIGHT = 512


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=708)
    ap.add_argument("--builders", nargs="+", default=["sah", "sah_free"])
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    import numpy as np

    import unitysimpleraytracing_tpu as rt
    from unitysimpleraytracing_tpu.core.camera import generate_rays
    from unitysimpleraytracing_tpu.ops.dispatch import _tile_major
    from unitysimpleraytracing_tpu.pipeline import chunked as chunked_mod
    from unitysimpleraytracing_tpu.utils.profiling import measure_interleaved

    mesh = rt.terrain_mesh(res=args.res, size=300.0, amplitude=30.0, seed=0)
    scene = rt.build_scene(mesh)
    cam = rt.make_camera(eye=(210.0, 170.0, 260.0), target=(0.0, 0.0, 0.0),
                         width=WIDTH, height=HEIGHT, fov_deg=60.0)
    o, d = generate_rays(cam)
    o = _tile_major(o, HEIGHT, WIDTH, 32)
    d = _tile_major(d, HEIGHT, WIDTH, 32)
    R = WIDTH * HEIGHT
    out = {"n_tris": scene.count, "rays": R,
           "device": str(jax.devices()[0])}
    print(f"[cbab] scene {scene.count} tris", file=sys.stderr, flush=True)

    import time

    cbvhs = {}
    for b in args.builders:
        t0 = time.perf_counter()
        cbvhs[b] = rt.build_bvh_chunked(scene, builder=b)
        jax.block_until_ready(cbvhs[b].tables)
        out[f"build_s_{b}"] = round(time.perf_counter() - t0, 1)
        print(f"[cbab] built {b} in {out[f'build_s_{b}']}s "
              f"({cbvhs[b].num_chunks} chunks)", file=sys.stderr, flush=True)

    fns = {
        b: (lambda cb=cbvhs[b]: chunked_mod.trace_chunked(cb, o, d).t.sum())
        for b in args.builders
    }
    res = measure_interleaved(fns, iters=args.iters, reps=args.reps)
    for b, (med, mn, samples) in res.items():
        out[b] = {"ms_med": round(med * 1e3, 1),
                  "ms_min_sample": round(mn * 1e3, 1),
                  "mrays_med": round(R / med / 1e6, 2),
                  "ms_samples": [round(s * 1e3, 1) for s in samples]}
        print(f"[cbab] {b}: {out[b]}", file=sys.stderr, flush=True)

    hits = {b: chunked_mod.trace_chunked(cbvhs[b], o, d)
            for b in args.builders}
    b0 = args.builders[0]
    for b in args.builders[1:]:
        t_a, t_b = np.asarray(hits[b0].t), np.asarray(hits[b].t)
        ha, hb = t_a != rt.constants.MAX_FLOAT, t_b != rt.constants.MAX_FLOAT
        out[f"parity_{b}"] = bool(np.array_equal(ha, hb)) and bool(
            np.allclose(t_b[hb], t_a[ha], rtol=4e-6, atol=0))
        print(f"[cbab] parity {b0} vs {b}: {out[f'parity_{b}']}",
              file=sys.stderr, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
