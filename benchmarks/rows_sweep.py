"""Packet-height sweep on the chunked 1M frame (and optionally the single
kernel): rows ∈ {2,4,8} × 128 lanes per packet, interleaved rounds.

Motivation: the 1M residual is PACKET-UNION divergence (hbm1m_ab measured a
single global tree cutting union visits only 14% vs the 7-chunk path —
packets, not chunks, set the visit floor).  Bigger packets (rows 16/32)
measured negative in round 4; the symmetric question — do SMALLER packets
cut the union faster than they multiply packet count? — was never measured.

    python benchmarks/rows_sweep.py [--res 708] [--rows 2 4 8] [--single]
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
    ap.add_argument("--rows", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--single", action="store_true",
                    help="sweep the single-kernel path (res <= ~580K tris) "
                    "instead of the chunked one")
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

    big = args.res >= 400
    size = 300.0 if big else 80.0
    amp = 30.0 if big else 9.0
    mesh = rt.terrain_mesh(res=args.res, size=size, amplitude=amp, seed=0)
    scene = rt.build_scene(mesh)
    eye = (210.0, 170.0, 260.0) if big else (55.0, 45.0, 70.0)
    cam = rt.make_camera(eye=eye, target=(0.0, 0.0, 0.0),
                         width=WIDTH, height=HEIGHT, fov_deg=60.0)
    o, d = generate_rays(cam)
    o = _tile_major(o, HEIGHT, WIDTH, 32)
    d = _tile_major(d, HEIGHT, WIDTH, 32)
    R = WIDTH * HEIGHT
    out = {"n_tris": scene.count, "rays": R, "single": args.single,
           "device": str(jax.devices()[0])}
    print(f"[rows] scene {scene.count} tris", file=sys.stderr, flush=True)

    if args.single:
        bvh = rt.build_bvh(scene)
        from unitysimpleraytracing_tpu.ops import trace_pallas4

        tables = trace_pallas4.prepare_tables4(scene, bvh)
        fns = {
            f"rows{r}": (lambda r=r: trace_pallas4.traverse_packets_pallas4(
                scene, bvh, o, d, tables=tables, rows=r).t.sum())
            for r in args.rows
        }
    else:
        cbvh = rt.build_bvh_chunked(scene)
        out["chunks"] = cbvh.num_chunks
        fns = {
            f"rows{r}": (lambda r=r: chunked_mod.trace_chunked(
                cbvh, o, d, rows=r).t.sum())
            for r in args.rows
        }

    res = measure_interleaved(fns, iters=args.iters, reps=args.reps)
    for k, (med, mn, samples) in res.items():
        out[k] = {"ms_med": round(med * 1e3, 1),
                  "ms_min_sample": round(mn * 1e3, 1),
                  "mrays_med": round(R / med / 1e6, 2),
                  "ms_samples": [round(s * 1e3, 1) for s in samples]}
        print(f"[rows] {k}: {out[k]}", file=sys.stderr, flush=True)

    # Parity across rows (t is order-independent under the strict-< fold).
    if args.single:
        def trace_one(r):
            return trace_pallas4.traverse_packets_pallas4(
                scene, bvh, o, d, tables=tables, rows=r)
    else:
        def trace_one(r):
            return chunked_mod.trace_chunked(cbvh, o, d, rows=r)
    ref = None
    for r in args.rows:
        h = trace_one(r)
        if ref is None:
            ref = h
        else:
            out[f"parity_t_rows{r}"] = bool(
                np.array_equal(np.asarray(h.t), np.asarray(ref.t)))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
