"""Single-tree HBM-streamed traversal vs the chunked path at 1M tris
(VERDICT r4 item 1 — the structural attack on the 1M residual).

Round 4 proved (oracle bound, 1.14x) that no schedule over 7 VMEM-sized
chunk trees gets the 1M camera frame below ~48 ms: a ray crossing k chunks
re-descends k roots, and the per-chunk union traversal is intrinsic.  The
structural fix is ONE global BVH4 over all triangles — whose record table
(~500K records × 256 B ≈ 128 MB) cannot be VMEM-resident — traversed with
per-pop async copies from HBM (trace_pallas4 ``hbm=True``: all popn row
copies issued back-to-back at iteration start, drained in order, so DMA
latency hides behind the preceding records' slab/leaf math).

    python benchmarks/hbm1m_ab.py [--res 708] [--builder sah] [--popns 8]

Emits one JSON line: interleaved A/B (chunked production vs single-tree
HBM) + per-ray record counts + hit parity.  Win condition from the
verdict: >=2x (>=10 Mrays/s at 1M/512^2); a clean negative with the
measured per-record cost closes BASELINE config 5's perf question.
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
    ap.add_argument("--res", type=int, default=708)  # 999,698 tris
    ap.add_argument("--builder", default="sah",
                    choices=["karras", "sah", "sah_free"])
    ap.add_argument("--popns", type=int, nargs="+", default=[8])
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-chunked", action="store_true")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    import numpy as np

    import unitysimpleraytracing_tpu as rt
    from unitysimpleraytracing_tpu.core.camera import generate_rays
    from unitysimpleraytracing_tpu.ops import trace_pallas4
    from unitysimpleraytracing_tpu.ops.dispatch import _tile_major
    from unitysimpleraytracing_tpu.utils.profiling import measure_interleaved

    mesh = rt.terrain_mesh(res=args.res, size=300.0, amplitude=30.0, seed=0)
    scene = rt.build_scene(mesh)
    cam = rt.make_camera(
        eye=(210.0, 170.0, 260.0), target=(0.0, 0.0, 0.0),
        width=WIDTH, height=HEIGHT, fov_deg=60.0,
    )
    o, d = generate_rays(cam)
    o = _tile_major(o, HEIGHT, WIDTH, 32)
    d = _tile_major(d, HEIGHT, WIDTH, 32)
    R = WIDTH * HEIGHT
    out = {"n_tris": scene.count, "rays": R, "builder": args.builder,
           "device": str(jax.devices()[0])}
    print(f"[hbm1m] scene {scene.count} tris", file=sys.stderr, flush=True)

    # Single global tree + its HBM-resident record table.
    bvh = rt.build_bvh(scene, builder=args.builder)
    tables = trace_pallas4.prepare_tables4(scene, bvh, pack=1)
    cap4, _ = trace_pallas4.table_geometry(tables)
    out["records"] = cap4
    out["table_mb"] = round(cap4 * 256 / 2**20, 1)
    print(f"[hbm1m] single tree: {cap4} records ({out['table_mb']} MB)",
          file=sys.stderr, flush=True)

    from unitysimpleraytracing_tpu.pipeline import chunked as chunked_mod

    fns = {}
    if not args.skip_chunked:
        cbvh = rt.build_bvh_chunked(scene)
        out["chunks"] = cbvh.num_chunks
        # Same tile-major rays as the single-tree arm (identical work AND
        # identical output order, so the parity check below compares
        # pixel-for-pixel).
        fns["chunked"] = lambda: chunked_mod.trace_chunked(
            cbvh, o, d).t.sum()
    for p in args.popns:
        fns[f"hbm_popn{p}"] = lambda p=p: trace_pallas4.traverse_packets_pallas4(
            scene, bvh, o, d, tables=tables, popn=p, hbm=True).t.sum()

    res = measure_interleaved(fns, iters=args.iters, reps=args.reps)
    for k, (med, mn, samples) in res.items():
        out[k] = {
            "ms_med": round(med * 1e3, 1),
            "ms_min_sample": round(mn * 1e3, 1),
            "mrays_med": round(R / med / 1e6, 2),
            "ms_samples": [round(s * 1e3, 1) for s in samples],
        }
        print(f"[hbm1m] {k}: {out[k]}", file=sys.stderr, flush=True)

    # Per-ray record count of the single tree (the structural quantity the
    # chunked union inflates) + per-record wall cost.
    try:
        _, recs = trace_pallas4.traverse_packets_pallas4(
            scene, bvh, o, d, tables=tables, popn=1, count_steps=True, hbm=True
        )
        rec_total = int(np.asarray(recs).sum())
        out["records_per_ray"] = round(rec_total / (R / 1024), 1)
        k0 = f"hbm_popn{args.popns[0]}"
        out["ns_per_record_packet"] = round(
            res[k0][0] * 1e9 / rec_total, 1)
        print(f"[hbm1m] records/packet-ray {out['records_per_ray']}, "
              f"{out['ns_per_record_packet']} ns/record",
              file=sys.stderr, flush=True)
    except Exception as e:
        print(f"[hbm1m] record count skipped: {e}", file=sys.stderr, flush=True)

    # Hit parity single-tree vs chunked (t exact-tie class only may differ).
    if not args.skip_chunked:
        h_c = chunked_mod.trace_chunked(cbvh, o, d)
        h_s = trace_pallas4.traverse_packets_pallas4(
            scene, bvh, o, d, tables=tables, hbm=True)
        t_c, t_s = np.asarray(h_c.t), np.asarray(h_s.t)
        hc, hs = t_c != rt.constants.MAX_FLOAT, t_s != rt.constants.MAX_FLOAT
        out["parity_hitmask"] = bool(np.array_equal(hc, hs))
        out["parity_t_close"] = bool(
            np.allclose(t_s[hs], t_c[hc], rtol=4e-6, atol=0)
        ) if out["parity_hitmask"] else False
        out["tri_diff"] = int((np.asarray(h_c.tri) != np.asarray(h_s.tri)).sum())
        print(f"[hbm1m] parity: {out['parity_hitmask']} "
              f"t_close={out['parity_t_close']} tri_diff={out['tri_diff']}",
              file=sys.stderr, flush=True)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
