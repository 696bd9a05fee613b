"""Traversal kernel throughput sweep (Mrays/s) over kernel variants.

Times the production Pallas packet kernel on the BASELINE config-2 class
workload (65K-tri terrain, 512x512 primary rays) for each requested
interleave factor, so kernel experiments have a one-command harness::

    python benchmarks/trace_bench.py --interleave 1 2 4 [--tris N]
        [--width 512 --height 512] [--shadows]

Prints one JSON line per variant.
"""
from __future__ import annotations

import argparse
import json
import math
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--interleave", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--tris", type=int, default=65522)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--platform", choices=["tpu", "cpu"], default=None)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--flat", choices=["auto", "flat", "half", "packed"],
                   default="auto",
                   help="record layout: 1/2/4 records per row")
    p.add_argument("--order", choices=["axis", "vote", "fixed"], default="axis",
                   help="near-child ordering: build-time split axis (default, "
                        "zero per-step reductions), per-step tmin vote, or "
                        "the reference's fixed left-first")
    p.add_argument("--leaf-cond", action="store_true",
                   help="lax.cond-guarded leaf tests (default: branch-free "
                        "masked — measured 15%% faster on v5e)")
    p.add_argument("--count-steps", action="store_true",
                   help="also report while-loop steps per packet (slower run)")
    p.add_argument("--unroll", type=int, default=1,
                   help="DFS steps per while iteration (identical order)")
    p.add_argument("--popn", type=int, default=2, choices=[1, 2, 4, 8, 16],
                   help="nodes popped per iteration (packed any-reduces)")
    p.add_argument("--rows", type=int, nargs="+", default=[8],
                   help="packet heights in 128-lane sublanes (rays per "
                        "packet = rows*128)")
    p.add_argument("--gated-verts", action="store_true",
                   help="skip the 18 leaf-vertex scalar fetches behind a "
                        "lax.cond on the record's leaf bits")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    import unitysimpleraytracing_tpu as rt
    from unitysimpleraytracing_tpu.ops import trace_pallas
    from unitysimpleraytracing_tpu.ops.dispatch import _tile_major
    from unitysimpleraytracing_tpu.core.camera import generate_rays
    from unitysimpleraytracing_tpu.utils.profiling import measure

    res = int(math.ceil(math.sqrt(args.tris / 2.0))) + 1
    mesh = rt.terrain_mesh(res=res, size=80.0, amplitude=9.0, seed=0)
    scene = rt.build_scene(mesh)
    bvh = rt.build_bvh(scene)
    cam = rt.make_camera(
        eye=(55.0, 45.0, 70.0), target=(0.0, 0.0, 0.0),
        width=args.width, height=args.height, fov_deg=60.0,
    )
    o, d = generate_rays(cam)
    o = _tile_major(o, cam.height, cam.width, 32)
    d = _tile_major(d, cam.height, cam.width, 32)
    R = o.shape[0]

    pack = {"auto": None, "flat": 1, "half": 2, "packed": 4}[args.flat]
    tables = trace_pallas.prepare_tables(scene, bvh, pack=pack)
    interp = jax.default_backend() == "cpu"
    print(
        f"[trace_bench] n_tris={scene.count} rays={R} device={jax.devices()[0]}",
        file=sys.stderr, flush=True,
    )

    for rows in args.rows:
        packet = rows * 128
        for g in args.interleave:
            if (R // packet) % g:
                print(f"[trace_bench] skip G={g} (does not divide)", file=sys.stderr)
                continue
            fn = lambda: trace_pallas.traverse_packets_pallas(
                scene, bvh, o, d, interpret=interp, tables=tables,
                pack=pack, interleave=g,
                order=args.order,
                leaf_cond=args.leaf_cond,
                unroll=args.unroll,
                popn=args.popn,
                rows=rows,
                gated_verts=args.gated_verts,
            ).t
            s = measure(fn, iters=args.iters, reps=args.reps)
            rec = {
                "variant": f"rows={rows},interleave={g},flat={args.flat},"
                           f"order={args.order},cond={args.leaf_cond},"
                           f"unroll={args.unroll},popn={args.popn},"
                           f"gv={args.gated_verts}",
                "mrays_per_s": round(R / s / 1e6, 3),
                "ms_per_frame": round(s * 1e3, 3),
            }
            if args.count_steps and g == 1:
                import numpy as np

                _, steps = trace_pallas.traversal_step_counts(
                    scene, bvh, o, d, interpret=interp, interleave=1, rows=rows
                )
                steps = np.asarray(steps).ravel()
                rec["steps_total"] = int(steps.sum())
                rec["steps_mean_per_packet"] = round(float(steps.mean()), 1)
                rec["ns_per_step"] = round(s * 1e9 / steps.sum(), 1)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
