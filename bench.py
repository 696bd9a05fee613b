"""Headline benchmark: traversal Mrays/s per chip + every BASELINE config.

Prints ONE JSON line:
    {"metric": "traversal_mrays_per_s_per_chip", "value": N, "unit": "Mrays/s",
     "vs_baseline": R, "extra": {...}}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` compares
against this framework's own recorded round-1 measurement in
``benchmarks/baseline.json`` (ratio > 1 means faster than round 1).

Covered configs (BASELINE.md):
- config 2 (headline): ~65K-tri terrain, 512x512 primary rays, flat tables.
- config 3: ~260K-tri terrain, 1920x1056 + shadow rays, packed tables.
- config 4: dynamic per-frame deform -> full re-sort + rebuild Hz, and the
  refit-only fast path Hz.
- scene-parity: the reference's own demo scene (ExampleObject3, 12,800 tris)
  from its wired camera pose (Scene.unity:342-366).
- build: LBVH ms at 65K AND ~1M tris; sort engines head-to-head (Gkeys/s).
- roofline: measured ns per NODE VISIT vs the kernel's MEASURED component
  floor (benchmarks/kernel_probe.py on this chip): the binary kernel
  pops 8 nodes per iteration with FOUR pipelined packed any-reductions, so
  per node ≈ 15 ns amortized reduce latency (~120 ns chain / 8) + ~32
  scalar VMEM fetches at ~3 ns issue (they partially pipeline; 4.5 ns
  un-pipelined) ≈ 96 ns + ~7 ns loop/stack share ≈ 120 ns; vector math
  overlaps.  The fraction reported is floor / measured (visit counts from
  the single-pop counter variant — the same node set up to ordering
  effects), paired with the BVH2 engine's own time.  The BVH4 production
  kernel's analogous floor is ~210 ns per RECORD (64 fetches ≈ 192 ns +
  15 ns amortized reduce + loop share), each record covering two collapsed
  levels.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

WIDTH = HEIGHT = 512
TERRAIN_RES = 182        # 2*(res-1)^2 = 65,522 triangles (config 2)
SPONZA_RES = 362         # 260,642 triangles (config 3 class)
BIG_RES = 708            # 999,698 triangles (config 5 build bound)
SORT_N = 1 << 22         # large enough that the work outweighs tunnel noise
# Physical ceiling for a 4-pass LSD radix sort of (u32 key, i32 value) pairs:
# each pass reads+writes both arrays (32 B/key total over 4 passes) against
# v5e HBM ~819 GB/s -> ~12 Gkeys/s.  Any measurement above it is a timing
# artifact, not a result (round 2 published a clamped-slope 1048576 Gkeys/s).
SORT_GKEYS_CEILING = 12.0
# Measured component floors (see module docstring): per BVH2 node visit and
# per BVH4 record (= two collapsed levels).
STEP_FLOOR_NS = 120.0
RECORD4_FLOOR_NS = 210.0


def _sort_seconds(fn, n_keys):
    """Per-call seconds for one sort, robust to the tunneled chip.

    Round 2's failure mode: the slope ``(t(8) - t(1))/7`` degenerated to <= 0
    under transport noise and the 1e-9 clamp was published verbatim.  Here the
    slope uses a wider rep sweep (2 vs 18 reps) over more samples, and any
    slope that implies a throughput above the HBM roofline (physically
    impossible) falls back to the amortized whole-loop time — which includes
    per-call dispatch overhead and is therefore a strict UNDER-estimate of
    throughput, safe to publish.  Returns (seconds, method).
    """
    import time

    from unitysimpleraytracing_tpu.utils.profiling import fetch

    for _ in range(2):
        fetch(fn())

    def timed(reps):
        t0 = time.perf_counter()
        r = None
        for _ in range(reps):
            r = fn()
        fetch(r)
        return time.perf_counter() - t0

    lo_reps, hi_reps = 2, 18
    slopes, directs = [], []
    for _ in range(5):
        t_lo = timed(lo_reps)
        t_hi = timed(hi_reps)
        slopes.append((t_hi - t_lo) / (hi_reps - lo_reps))
        directs.append(t_hi / hi_reps)
    slope = float(np.median(slopes))
    direct = float(np.median(directs))
    floor_s = n_keys / (SORT_GKEYS_CEILING * 1e9)
    if slope >= floor_s:
        return slope, "slope"
    return max(direct, floor_s), "amortized"


def _note(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    import jax.numpy as jnp

    import unitysimpleraytracing_tpu as rt
    from unitysimpleraytracing_tpu.core.camera import generate_rays
    from unitysimpleraytracing_tpu.ops import sort as sort_ops
    from unitysimpleraytracing_tpu.ops import trace_pallas
    from unitysimpleraytracing_tpu.ops.dispatch import _tile_major
    from unitysimpleraytracing_tpu.pipeline.build import deform_scene
    from unitysimpleraytracing_tpu.utils.profiling import measure

    extra = {"device": str(jax.devices()[0])}

    # ---- config 2 headline: 65K terrain, 512x512 --------------------------
    mesh = rt.terrain_mesh(res=TERRAIN_RES, size=80.0, amplitude=9.0, seed=0)
    scene = rt.build_scene(mesh)
    n_tris = mesh.num_triangles
    cam = rt.make_camera(
        eye=(55.0, 45.0, 70.0), target=(0.0, 0.0, 0.0),
        width=WIDTH, height=HEIGHT, fov_deg=60.0,
    )
    _note("scene ready")

    # Build-SPEED metric stays on the karras radix tree (the LBVH algorithm,
    # round-over-round comparable); the traversal rows below use build_bvh's
    # measured DEFAULT (sweep-SAH for concrete static scenes).
    build_s = measure(lambda: rt.build_bvh(scene, builder="karras"), iters=3)
    _note(f"build 65K (karras): {build_s*1e3:.2f} ms")
    sah_build_s = measure(lambda: rt.build_bvh(scene), iters=3)
    _note(f"build 65K (default quality builder): {sah_build_s*1e3:.2f} ms")
    bvh = rt.build_bvh(scene)

    from unitysimpleraytracing_tpu.ops.dispatch import resolve_impl
    from unitysimpleraytracing_tpu.utils.profiling import measure_interleaved

    def robust_row(fn, reps=16, iters=7):
        """Drift-robust absolute row (VERDICT r4 item 5): amortized
        round-robin rounds + fast-phase min — the slope form produced
        impossible minima under the tunnel's ~2x within-session drift.
        The timed fn must reduce ON DEVICE (scalar fetch).  Returns
        (median_s, min_s); amortized includes 1/reps of the fixed
        dispatch+fetch latency — a strict, method-tagged overestimate."""
        med, mn, _ = measure_interleaved({"x": fn}, iters=iters, reps=reps)["x"]
        return med, mn

    trace_s, trace_s_min = robust_row(
        lambda: rt.render_hits(scene, bvh, cam).t.sum()
    )
    # Slope-median DEVICE-time estimate alongside (cancels the fixed
    # dispatch+fetch latency; used for the roofline rows and for
    # round-over-round continuity with the r1-r4 headline method).
    trace_slope_s = measure(lambda: rt.render_hits(scene, bvh, cam).t.sum())
    mrays = WIDTH * HEIGHT / trace_s / 1e6
    engine = resolve_impl("auto", bvh.capacity)
    _note(f"trace[{engine}]: {trace_s*1e3:.2f} ms = {mrays:.2f} Mrays/s "
          f"(amortized; fast-phase {WIDTH*HEIGHT/trace_s_min/1e6:.2f}; "
          f"device-slope {WIDTH*HEIGHT/trace_slope_s/1e6:.2f})")
    hit_frac = float(rt.render_hits(scene, bvh, cam).hit.mean())
    extra.update(
        n_tris=n_tris, rays=WIDTH * HEIGHT, hit_frac=round(hit_frac, 4),
        lbvh_build_ms=round(build_s * 1e3, 3),
        sah_build_ms=round(sah_build_s * 1e3, 3),
        traversal_engine=engine, builder="sah_free",
        headline_method="interleaved_amortized_reps16",
        headline_mrays_fast_phase=round(WIDTH * HEIGHT / trace_s_min / 1e6, 2),
        headline_mrays_device_slope=round(
            WIDTH * HEIGHT / trace_slope_s / 1e6, 2
        ),
    )

    # The binary-record kernel head-to-head (the round-2 production engine)
    # — same amortized method as the headline so the engine ratio is
    # like-for-like (mixing slope and amortized rows inverted the ordering
    # in one smoke run).
    try:
        if engine == "pallas4":
            s2_med, _ = robust_row(
                lambda: rt.render_hits(scene, bvh, cam, impl="pallas").t.sum()
            )
            s2_slope = measure(
                lambda: rt.render_hits(scene, bvh, cam, impl="pallas").t.sum(),
                iters=3,
            )
            extra["bvh2_mrays"] = round(WIDTH * HEIGHT / s2_med / 1e6, 2)
            extra["bvh2_mrays_method"] = "interleaved_amortized_reps16"
            _note(f"trace[pallas bvh2]: {extra['bvh2_mrays']} Mrays/s")
        else:
            s2_slope = trace_slope_s
    except Exception as e:
        s2_slope = trace_slope_s
        _note(f"bvh2 head-to-head skipped: {e}")

    # Builder contrast: the karras radix tree (the reference's algorithm,
    # the bit-parity surface, and the traced/dynamic default), same engine —
    # same-session amortized contrast with the headline above.
    try:
        sbvh_k = rt.build_bvh(scene, builder="karras")
        s_k, _ = robust_row(lambda: rt.render_hits(scene, sbvh_k, cam).t.sum())
        extra["headline_karras_mrays"] = round(WIDTH * HEIGHT / s_k / 1e6, 2)
        _note(f"trace[karras tree]: {extra['headline_karras_mrays']} Mrays/s")
        del sbvh_k
    except Exception as e:
        _note(f"karras headline skipped: {e}")

    # Roofline: measured ns/step vs each kernel's component floor.
    try:
        from unitysimpleraytracing_tpu.ops import trace_pallas4

        o, d = generate_rays(cam)
        o = _tile_major(o, HEIGHT, WIDTH, 32)
        d = _tile_major(d, HEIGHT, WIDTH, 32)
        _, steps = trace_pallas.traversal_step_counts(scene, bvh, o, d)
        steps_total = int(np.asarray(steps).sum())
        # DEVICE-time roofline (slope-median — amortized rows include
        # dispatch latency that is not kernel time).
        ns_per_step = s2_slope * 1e9 / steps_total
        extra.update(
            traversal_steps_mean=round(steps_total / (WIDTH * HEIGHT / 1024), 1),
            traversal_ns_per_step=round(ns_per_step, 1),
            roofline_floor_fraction=round(STEP_FLOOR_NS / ns_per_step, 3),
        )
        _note(f"bvh2 steps {steps_total}, {ns_per_step:.0f} ns/step, "
              f"floor fraction {STEP_FLOOR_NS/ns_per_step:.2f}")
        if engine == "pallas4":
            # BVH4 records per packet (popn=1 counter — same record set).
            _, rec4 = trace_pallas4.traverse_packets_pallas4(
                scene, bvh, o, d, popn=1, count_steps=True
            )
            rec4_total = int(np.asarray(rec4).sum())
            ns_per_rec = trace_slope_s * 1e9 / rec4_total
            extra.update(
                bvh4_records_mean=round(rec4_total / (WIDTH * HEIGHT / 1024), 1),
                bvh4_ns_per_record=round(ns_per_rec, 1),
                bvh4_floor_fraction=round(RECORD4_FLOOR_NS / ns_per_rec, 3),
            )
            _note(f"bvh4 records {rec4_total}, {ns_per_rec:.0f} ns/record, "
                  f"floor fraction {RECORD4_FLOOR_NS/ns_per_rec:.2f}")
    except Exception as e:  # pragma: no cover - keep the bench alive
        _note(f"roofline skipped: {e}")

    # ---- config 4: dynamic deform -> rebuild / refit ----------------------
    try:
        t = scene.triangles
        base = jnp.stack([t.a, t.b, t.c], axis=1)

        @jax.jit
        def dyn_rebuild(phase):
            pos = base.at[..., 1].add(0.5 * jnp.sin(base[..., 0] * 0.37 + phase))
            return rt.build_bvh(deform_scene(scene, pos)).node_aabb_min

        @jax.jit
        def dyn_refit(phase):
            pos = base.at[..., 1].add(0.5 * jnp.sin(base[..., 0] * 0.37 + phase))
            return rt.refit_bvh(deform_scene(scene, pos), bvh).node_aabb_min

        extra["dynamic_rebuild_hz"] = round(1.0 / measure(lambda: dyn_rebuild(0.7), iters=2), 1)
        extra["dynamic_refit_hz"] = round(1.0 / measure(lambda: dyn_refit(0.7), iters=2), 1)
        _note(f"dynamic rebuild {extra['dynamic_rebuild_hz']} Hz, "
              f"refit {extra['dynamic_refit_hz']} Hz")

        # Full animated RENDER loop (the reference renders every frame):
        # ONE jitted program per frame running deform -> refit -> BVH4 table
        # slot-update -> trace (make_animated_renderer): the topology plan is
        # computed once, each frame repays only the geometry gathers, and the
        # whole frame is a single dispatch (the unfused 5-dispatch loop paid
        # ~45 ms of tunnel round-trips on a ~10 ms device frame).
        anim = rt.make_animated_renderer(scene, bvh, cam)
        pos_fn = jax.jit(
            lambda phase: base.at[..., 1].add(
                0.5 * jnp.sin(base[..., 0] * 0.37 + phase)
            )
        )

        def dyn_frame(phase):
            return anim(pos_fn(phase)).t

        extra["dynamic_render_hz"] = round(
            1.0 / measure(lambda: dyn_frame(0.9), iters=2), 1
        )
        _note(f"dynamic render {extra['dynamic_render_hz']} Hz")
    except Exception as e:
        _note(f"dynamic skipped: {e}")

    # ---- build + chunked trace at ~1M tris (config 5, single chip) --------
    try:
        big = rt.build_scene(
            rt.terrain_mesh(res=BIG_RES, size=300.0, amplitude=30.0, seed=0)
        )
        s = measure(lambda: rt.build_bvh(big, builder="karras"), iters=2, reps=4)
        extra["lbvh_build_1m_ms"] = round(s * 1e3, 2)
        extra["n_tris_1m"] = big.count
        _note(f"build 1M: {s*1e3:.1f} ms")

        # Beyond the packed-table VMEM ceiling (~600K tris) the chunked path
        # streams per-chunk tables through successive kernel launches.
        bcam = rt.make_camera(
            eye=(210.0, 170.0, 260.0), target=(0.0, 0.0, 0.0),
            width=WIDTH, height=HEIGHT, fov_deg=60.0,
        )
        cbvh = rt.build_bvh_chunked(big)
        s = measure(
            lambda: rt.render_hits_chunked(big, cbvh, bcam).t, iters=2, reps=4
        )
        extra["chunked_1m_mrays"] = round(WIDTH * HEIGHT / s / 1e6, 2)
        extra["chunked_1m_chunks"] = cbvh.num_chunks
        extra["chunked_1m_format"] = (
            "bvh4" if cbvh.tables.shape[-1] == 64 else "bvh2"
        )
        # Production default: per-chunk sweep-SAH trees (measured +18% over
        # karras chunks same-session at 1M; pipeline/chunked.py docstring).
        extra["chunked_1m_builder"] = "sah"
        _note(f"chunked 1M trace: {extra['chunked_1m_mrays']} Mrays/s")
        del big, cbvh
    except Exception as e:
        _note(f"1M build/trace skipped: {e}")

    # ---- real-mesh large scene: subdivided male_head through chunked ------
    try:
        obj = "/root/reference/Assets/_Assets/male_head.obj"
        if os.path.exists(obj):
            hmesh = rt.subdivide_mesh(rt.load_obj(obj), levels=4, displace=0.08)
            hscene = rt.build_scene(hmesh)
            hbvh = rt.build_bvh_chunked(hscene)
            lo = hmesh.positions.min(axis=(0, 1))
            hi = hmesh.positions.max(axis=(0, 1))
            center = (lo + hi) / 2
            diag = float(np.linalg.norm(hi - lo))
            hcam = rt.make_camera(
                eye=tuple(center + np.array([0.8, 0.6, 1.2]) * diag),
                target=tuple(center), width=WIDTH, height=HEIGHT, fov_deg=60.0,
            )
            s = measure(
                lambda: rt.render_hits_chunked(hscene, hbvh, hcam).t.sum(),
                iters=2, reps=4,
            )
            extra["real_mesh_chunked"] = {
                "mesh": "male_head x4 subdivision + displacement",
                "n_tris": hscene.count,
                "chunks": hbvh.num_chunks,
                "frame_ms": round(s * 1e3, 1),
                "mrays_per_s": round(WIDTH * HEIGHT / s / 1e6, 2),
            }
            _note(f"real-mesh 1.6M chunked: {extra['real_mesh_chunked']}")
            del hmesh, hscene, hbvh
    except Exception as e:
        _note(f"real-mesh chunked skipped: {e}")

    # ---- sort engines head-to-head ----------------------------------------
    rng = np.random.default_rng(0)
    keys = jnp.asarray(
        rng.integers(0, 1 << 32, size=SORT_N, dtype=np.uint64).astype(np.uint32)
    )
    vals = jnp.arange(SORT_N, dtype=jnp.int32)
    extra["sort_n"] = SORT_N
    # Device-time measurement (drift-robust, VERDICT r4 items 3+5): K
    # data-dependent sorts fused in ONE jit with a scalar on-device checksum
    # — cancels the tunnel's per-dispatch latency entirely (the build
    # pipeline fuses its sort the same way), sampled in interleaved rounds.
    K_CHAIN = 8

    def chained_sort(eng):
        @jax.jit
        def f(k, v):
            for _ in range(K_CHAIN):
                k, v = sort_ops.sort_key_val(k, v, impl=eng)
                k = k ^ (v.astype(jnp.uint32) * jnp.uint32(2654435761))
            return k.sum() + v.astype(jnp.uint32).sum()
        return lambda: f(keys, vals)

    try:
        res = measure_interleaved(
            {eng: chained_sort(eng) for eng in ("lex2", "packed", "xla")},
            iters=7, warmup=2, reps=2,
        )
        for eng, (med, _, _) in res.items():
            val = SORT_N / (med / K_CHAIN) / 1e9
            assert val <= SORT_GKEYS_CEILING + 1e-6, (eng, val)
            extra[f"sort_gkeys_{eng}"] = round(val, 4)
            extra[f"sort_gkeys_{eng}_method"] = f"chained{K_CHAIN}_interleaved"
            _note(f"sort[{eng}]: {extra[f'sort_gkeys_{eng}']} Gkeys/s (chained)")
    except Exception as e:
        _note(f"chained sort rows skipped: {e}")
    try:
        s, method = _sort_seconds(
            lambda: sort_ops.sort_key_val(keys, vals, impl="pallas")[0], SORT_N
        )
        extra["sort_gkeys_pallas"] = round(SORT_N / s / 1e9, 4)
        extra["sort_gkeys_pallas_method"] = method
        _note(f"sort[pallas]: {extra['sort_gkeys_pallas']} Gkeys/s ({method})")
    except Exception as e:
        _note(f"sort[pallas] skipped: {e}")
    # Headline = the build pipeline's production engine (lex2).
    extra["sort_gkeys_per_s"] = extra.get(
        "sort_gkeys_lex2", extra.get("sort_gkeys_xla", 0.0)
    )

    # ---- scene parity: the reference's shipped demo scene -----------------
    try:
        demo_obj = "/root/reference/Assets/_Assets/ExampleObject3.obj"
        if os.path.exists(demo_obj):
            dmesh = rt.load_obj(demo_obj, flip_x=True)
            dscene = rt.build_scene(dmesh)
            dbvh = rt.build_bvh(dscene)
            dcam = rt.make_camera(
                eye=(0.0, 0.0, 15.7), target=(0.0, 0.0, 0.0),
                width=WIDTH, height=HEIGHT, fov_deg=60.0,
            )
            s, s_min = robust_row(
                lambda: rt.render_hits(dscene, dbvh, dcam).t.sum()
            )
            extra["demo_scene_mrays"] = round(WIDTH * HEIGHT / s / 1e6, 2)
            extra["demo_scene_mrays_fast_phase"] = round(
                WIDTH * HEIGHT / s_min / 1e6, 2
            )
            extra["demo_scene_method"] = "interleaved_amortized_reps16"
            _note(f"demo scene: {extra['demo_scene_mrays']} Mrays/s "
                  f"(fast-phase {extra['demo_scene_mrays_fast_phase']})")
    except Exception as e:
        _note(f"demo scene skipped: {e}")

    # ---- config 3: 260K tris, 1080p-class + shadows, packed tables --------
    try:
        smesh = rt.terrain_mesh(res=SPONZA_RES, size=160.0, amplitude=20.0, seed=1)
        sscene = rt.build_scene(smesh)
        sbvh = rt.build_bvh(sscene)
        scam = rt.make_camera(
            eye=(110.0, 90.0, 140.0), target=(0.0, 0.0, 0.0),
            width=1920, height=1056, fov_deg=60.0,
        )
        tex = rt.solid_texture((0.8, 0.7, 0.6, 1.0))
        bg = np.asarray([0.1, 0.1, 0.12], np.float32)

        # Same-session A/B vs the JUNK miss-pixel shadow rays (the round-2
        # behavior): identical output, the artifact carries both times so the
        # substitution win is visible regardless of session speed.
        # INTERLEAVED rounds (not sequential blocks): the chip drifts up to
        # ~2x within a session, and round-robin sampling is the only A/B
        # form that survives it (utils/profiling.measure_interleaved).
        from unitysimpleraytracing_tpu.utils.profiling import measure_interleaved

        # The timed fn reduces the frame to a scalar ON DEVICE: fetching the
        # full 32 MB 1080p frame through the tunnel costs ~0.5 s and would
        # swamp the ~75 ms frame in the amortized form (the slope form it
        # replaced cancelled that fetch; the reduction keeps it cancelled).
        res = measure_interleaved(
            {
                "subst": lambda: rt.render_frame(
                    sscene, sbvh, scam, tex, bg, shadows=True
                ).sum(),
                "junk": lambda: rt.render_frame(
                    sscene, sbvh, scam, tex, bg, shadows=True,
                    shadow_substitute=False,
                ).sum(),
            },
            iters=5, reps=2,
        )
        s, s_junk = res["subst"][0], res["junk"][0]
        s_min, s_junk_min = res["subst"][1], res["junk"][1]
        # shadows => ~2 trace passes per pixel
        extra["sponza_class"] = {
            "n_tris": sscene.count,
            "res": "1920x1056",
            "shadows": True,
            "engine": resolve_impl("auto", sbvh.capacity),
            "frame_ms": round(s * 1e3, 1),
            "frame_ms_junk": round(s_junk * 1e3, 1),
            # Fast-phase samples: the tunnel's speed swings multi-x within a
            # session (CLAUDE.md); the min is what the chip can do, the
            # median is what this session did.
            "frame_ms_min": round(s_min * 1e3, 1),
            "frame_ms_junk_min": round(s_junk_min * 1e3, 1),
            "subst_speedup": round(s_junk / s, 2),
            "mrays_per_s": round(2 * 1920 * 1056 / s / 1e6, 2),
            "mrays_per_s_fast_phase": round(2 * 1920 * 1056 / s_min / 1e6, 2),
        }
        _note(f"260K+shadows 1080p: {extra['sponza_class']}")
    except Exception as e:
        _note(f"sponza-class skipped: {e}")

    baseline_path = os.path.join(os.path.dirname(__file__), "benchmarks", "baseline.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        base = json.load(open(baseline_path))
        ref = base.get("traversal_mrays_per_s_per_chip")
        if ref:
            vs = mrays / ref

    print(
        json.dumps(
            {
                "metric": "traversal_mrays_per_s_per_chip",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(vs, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
