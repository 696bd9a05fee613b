"""BVH2 vs BVH4 (wide-record) traversal A/B on the real chip (VERDICT r2
next-round item 5): same scene, same rays, both kernels, Mrays/s head to head.

    python benchmarks/bvh4_ab.py [--res 182] [--popns 1 2 4] [--pack 0]
    # res 182 -> 65,522 tris (config 2); res 362 -> 260,642 (config 3 class)
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
    ap.add_argument("--res", type=int, default=182)
    ap.add_argument("--scene", default="terrain", choices=["terrain", "soup"],
                    help="terrain (coherent surface, Morton-friendly) or "
                    "random triangle soup (Morton-hostile — the free-order "
                    "builder's best case); soup uses --res^2*2 triangles")
    ap.add_argument("--popns", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--pack", type=int, default=0, help="0 = auto")
    ap.add_argument("--rows", type=int, default=8,
                    help="packet height in 128-lane sublanes (8 = 1024 rays)")
    ap.add_argument("--skip-bvh2", action="store_true")
    ap.add_argument("--builder", default="karras",
                    choices=["karras", "sah", "sah_free"])
    ap.add_argument("--compress", action="store_true",
                    help="also A/B the compressed (bf16-pair box, 52-slot) "
                    "record table against the plain 64-slot one, interleaved")
    ap.add_argument("--builder-ab", action="store_true",
                    help="A/B the restricted sweep-SAH tree vs the free-order "
                    "one (VERDICT r4 item 2): records/ray + Mrays/s, "
                    "interleaved rounds, hit parity")
    ap.add_argument("--hbm", action="store_true",
                    help="A/B the VMEM-resident record table vs HBM-streamed "
                    "records (async-copy per pop, VERDICT r4 item 1), "
                    "interleaved rounds, bit parity")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    import numpy as np

    import unitysimpleraytracing_tpu as rt
    from unitysimpleraytracing_tpu.core.camera import generate_rays
    from unitysimpleraytracing_tpu.ops import trace_pallas, trace_pallas4
    from unitysimpleraytracing_tpu.ops.dispatch import _tile_major
    from unitysimpleraytracing_tpu.utils.profiling import measure

    if args.scene == "soup":
        n = 2 * (args.res - 1) ** 2
        mesh = rt.random_triangle_soup(n, seed=0, bound=40.0, tri_size=1.2)
    else:
        mesh = rt.terrain_mesh(res=args.res, size=80.0, amplitude=9.0, seed=0)
    scene = rt.build_scene(mesh)
    bvh = rt.build_bvh(scene, builder=args.builder)
    cam = rt.make_camera(
        eye=(55.0, 45.0, 70.0), target=(0.0, 0.0, 0.0),
        width=WIDTH, height=HEIGHT, fov_deg=60.0,
    )
    o, d = generate_rays(cam)
    o = _tile_major(o, HEIGHT, WIDTH, 32)
    d = _tile_major(d, HEIGHT, WIDTH, 32)
    R = WIDTH * HEIGHT

    out = {"n_tris": scene.count, "rays": R, "builder": args.builder,
           "device": str(jax.devices()[0])}
    print(f"[ab] scene {scene.count} tris", file=sys.stderr, flush=True)

    ref = None
    if not args.skip_bvh2:
        tables2 = trace_pallas.prepare_tables(scene, bvh)
        pack2 = trace_pallas.auto_pack(bvh.capacity)

        def run2():
            return trace_pallas.traverse_packets_pallas(
                scene, bvh, o, d, tables=tables2
            ).t

        s = measure(run2, iters=3)
        out["bvh2"] = {"pack": pack2, "mrays": round(R / s / 1e6, 2),
                       "ms": round(s * 1e3, 2)}
        print(f"[ab] bvh2 pack={pack2}: {out['bvh2']['mrays']} Mrays/s",
              file=sys.stderr, flush=True)
        ref = run2()

    pack4 = args.pack or trace_pallas4.auto_pack4(bvh.capacity)
    tables4 = trace_pallas4.prepare_tables4(scene, bvh, pack=pack4)
    cap4, _ = trace_pallas4.table_geometry(tables4)
    out["bvh4_records"] = cap4
    out["bvh4_vmem_mb"] = round(cap4 * (512 if pack4 == 1 else 256) / 2**20, 1)
    for popn in args.popns:
        def run4(p=popn):
            return trace_pallas4.traverse_packets_pallas4(
                scene, bvh, o, d, tables=tables4, popn=p, rows=args.rows
            ).t

        s = measure(run4, iters=3)
        key = f"bvh4_pack{pack4}_popn{popn}" + (
            f"_rows{args.rows}" if args.rows != 8 else "")
        out[key] = {"mrays": round(R / s / 1e6, 2), "ms": round(s * 1e3, 2)}
        print(f"[ab] {key}: {out[key]['mrays']} Mrays/s",
              file=sys.stderr, flush=True)
        if ref is not None:
            got = run4()
            t_r, t_g = np.asarray(ref), np.asarray(got)
            hit = t_r != rt.constants.MAX_FLOAT
            ok = bool(np.array_equal(t_g != rt.constants.MAX_FLOAT, hit))
            ok = ok and bool(np.allclose(t_g[hit], t_r[hit], rtol=4e-6, atol=0))
            out[key]["parity_vs_bvh2"] = ok

    if args.compress and pack4 == 1:
        # Interleaved rounds (drift-robust): plain vs compressed records,
        # same popn default, same rays — the fetch-floor experiment of
        # VERDICT r3 item 4 (52 vs 64 fetched slots per record, ~30 scalar
        # decode ops bought back).
        from unitysimpleraytracing_tpu.utils.profiling import measure_interleaved

        tablesc = trace_pallas4.compress_tables4(tables4)
        fns = {
            "plain": lambda: trace_pallas4.traverse_packets_pallas4(
                scene, bvh, o, d, tables=tables4, rows=args.rows
            ).t.sum(),
            "compressed": lambda: trace_pallas4.traverse_packets_pallas4(
                scene, bvh, o, d, tables=tablesc, rows=args.rows
            ).t.sum(),
        }
        res = measure_interleaved(fns, iters=5, reps=4)
        for k, (med, mn, samples) in res.items():
            out[f"bvh4_{k}"] = {
                "mrays_med": round(R / med / 1e6, 2),
                "mrays_min_sample": round(R / mn / 1e6, 2),
                "ms_samples": [round(s * 1e3, 2) for s in samples],
            }
            print(f"[ab] {k}: med {med*1e3:.2f} ms "
                  f"({out[f'bvh4_{k}']['mrays_med']} Mrays/s)",
                  file=sys.stderr, flush=True)
        t_p = np.asarray(trace_pallas4.traverse_packets_pallas4(
            scene, bvh, o, d, tables=tables4, rows=args.rows).t)
        t_c = np.asarray(trace_pallas4.traverse_packets_pallas4(
            scene, bvh, o, d, tables=tablesc, rows=args.rows).t)
        out["compress_parity_t"] = bool(np.array_equal(t_p, t_c))
        print(f"[ab] compress parity: {out['compress_parity_t']}",
              file=sys.stderr, flush=True)

    if args.builder_ab:
        # Restricted sweep SAH vs free-order sweep SAH: same scene/rays, each
        # tree packed to its own table; records/ray via the popn=1 counter.
        from unitysimpleraytracing_tpu.utils.profiling import measure_interleaved

        trees = {
            "sah": rt.build_bvh(scene, builder="sah"),
            "sah_free": rt.build_bvh(scene, builder="sah_free"),
        }
        tabs = {k: trace_pallas4.prepare_tables4(scene, b) for k, b in trees.items()}
        fns = {
            k: (lambda tb=tabs[k], b=trees[k]: trace_pallas4
                .traverse_packets_pallas4(scene, b, o, d, tables=tb,
                                          rows=args.rows).t.sum())
            for k in trees
        }
        res = measure_interleaved(fns, iters=7, reps=4)
        hits = {}
        for k in trees:
            _, recs = trace_pallas4.traverse_packets_pallas4(
                scene, trees[k], o, d, tables=tabs[k], popn=1, count_steps=True
            )
            med, mn, samples = res[k]
            hits[k] = trace_pallas4.traverse_packets_pallas4(
                scene, trees[k], o, d, tables=tabs[k], rows=args.rows)
            out[f"builder_{k}"] = {
                "records_per_ray": round(float(np.asarray(recs).sum())
                                         / (R / 1024), 1),
                "mrays_med": round(R / med / 1e6, 2),
                "mrays_min_sample": round(R / mn / 1e6, 2),
                "ms_samples": [round(s * 1e3, 2) for s in samples],
            }
            print(f"[ab] builder {k}: {out[f'builder_{k}']}",
                  file=sys.stderr, flush=True)
        t_a, t_b = np.asarray(hits["sah"].t), np.asarray(hits["sah_free"].t)
        ha, hb = t_a != rt.constants.MAX_FLOAT, t_b != rt.constants.MAX_FLOAT
        ok = bool(np.array_equal(ha, hb)) and bool(
            np.allclose(t_b[hb], t_a[ha], rtol=4e-6, atol=0))
        out["builder_ab_parity"] = ok
        print(f"[ab] builder parity: {ok}", file=sys.stderr, flush=True)

    if args.hbm:
        from unitysimpleraytracing_tpu.utils.profiling import measure_interleaved

        tables_h = (tables4 if pack4 == 1
                    else trace_pallas4.prepare_tables4(scene, bvh, pack=1))
        fns = {
            "vmem": lambda: trace_pallas4.traverse_packets_pallas4(
                scene, bvh, o, d, tables=tables4, rows=args.rows).t.sum(),
            "hbm": lambda: trace_pallas4.traverse_packets_pallas4(
                scene, bvh, o, d, tables=tables_h, rows=args.rows,
                hbm=True).t.sum(),
        }
        res = measure_interleaved(fns, iters=7, reps=4)
        for k, (med, mn, samples) in res.items():
            out[f"fetch_{k}"] = {
                "mrays_med": round(R / med / 1e6, 2),
                "mrays_min_sample": round(R / mn / 1e6, 2),
                "ms_samples": [round(s * 1e3, 2) for s in samples],
            }
            print(f"[ab] fetch {k}: med {med*1e3:.2f} ms "
                  f"({out[f'fetch_{k}']['mrays_med']} Mrays/s)",
                  file=sys.stderr, flush=True)
        t_v = np.asarray(trace_pallas4.traverse_packets_pallas4(
            scene, bvh, o, d, tables=tables4, rows=args.rows).t)
        t_h = np.asarray(trace_pallas4.traverse_packets_pallas4(
            scene, bvh, o, d, tables=tables_h, rows=args.rows, hbm=True).t)
        out["hbm_parity_t"] = bool(np.array_equal(t_v, t_h))
        print(f"[ab] hbm parity: {out['hbm_parity_t']}",
              file=sys.stderr, flush=True)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
