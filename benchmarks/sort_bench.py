"""Sort engine head-to-head (VERDICT r1 item 3): XLA vs Pallas vs radix-XLA.

Times `sort_key_val` for each engine over a size sweep and prints one JSON
line per (engine, n).  The production default in ops/sort.py must match the
winner recorded here.

    python benchmarks/sort_bench.py [--sizes 20 22 24] [--engines xla pallas radix]
"""
from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=[20, 22, 24],
                   help="log2 key counts")
    p.add_argument("--engines", nargs="+",
                   default=["xla", "packed", "lex2", "pallas", "radix"])
    p.add_argument("--realize", nargs="+", default=["pair_scatter"],
                   help="pallas pass realizations to A/B "
                   "(pair_scatter | gather_iota)")
    p.add_argument("--platform", choices=["tpu", "cpu"], default=None)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--interleaved", action="store_true",
                   help="drift-robust A/B: one amortized sample per engine "
                   "per round-robin round (utils.profiling.measure_"
                   "interleaved) instead of sequential slope blocks")
    p.add_argument("--chained", type=int, default=0, metavar="K",
                   help="device-time mode: K data-dependent sorts fused in "
                   "ONE jit, scalar on-device fetch — cancels the tunnel's "
                   "per-dispatch latency entirely (the build pipeline fuses "
                   "its sort the same way).  Implies --interleaved rounds.")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    import jax.numpy as jnp
    import numpy as np

    from unitysimpleraytracing_tpu.ops import sort as sort_ops
    from unitysimpleraytracing_tpu.ops import sort_pallas
    from unitysimpleraytracing_tpu.utils.profiling import measure

    CEILING = 12.0  # 4-pass HBM roofline, Gkeys/s — above it = timing artifact

    def robust_seconds(fn, n):
        """Slope over a 2-vs-10-rep sweep; amortized fallback when the slope
        implies a physically impossible rate (the round-2 clamp artifact)."""
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

        slopes, directs = [], []
        for _ in range(args.iters):
            t_lo, t_hi = timed(2), timed(10)
            slopes.append((t_hi - t_lo) / 8)
            directs.append(t_hi / 10)
        slope = float(np.median(slopes))
        direct = float(np.median(directs))
        floor_s = n / (CEILING * 1e9)
        if slope >= floor_s:
            return slope, "slope"
        return max(direct, floor_s), "amortized"

    print(f"[sort_bench] device={jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    for lg in args.sizes:
        n = 1 << lg
        keys = jnp.asarray(
            rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
        )
        vals = jnp.arange(n, dtype=jnp.int32)
        variants = []
        for eng in args.engines:
            if eng == "pallas":
                for r in args.realize:
                    variants.append((f"pallas[{r}]", jax.jit(
                        lambda k, v, rr=r: sort_pallas.radix_sort_key_val_pallas(
                            k, v, realize=rr)[0])))
            else:
                variants.append((eng, jax.jit(
                    lambda k, v, e=eng: sort_ops.sort_key_val(k, v, impl=e)[0])))
        if args.chained:
            from unitysimpleraytracing_tpu.utils.profiling import (
                measure_interleaved,
            )

            K = args.chained

            def make_chained(eng):
                @jax.jit
                def f(k, v):
                    for _ in range(K):
                        k, v = sort_ops.sort_key_val(k, v, impl=eng)
                        # Data-dependent perturbation so XLA cannot CSE or
                        # dead-code any pass; keys stay ~uniform (v is a
                        # permutation of iota).  Identical for every engine.
                        k = k ^ (v.astype(jnp.uint32) * jnp.uint32(2654435761))
                    return k.sum() + v.astype(jnp.uint32).sum()  # mod-2^32 checksum
                return f

            fns = {}
            for eng in args.engines:
                if eng.startswith("pallas"):
                    continue
                fns[eng] = lambda f=make_chained(eng): f(keys, vals)
            res = measure_interleaved(fns, iters=7, warmup=2, reps=2)
            for name, (med, mn, samples) in res.items():
                disp = (max(samples) - min(samples)) / med if med else 0.0
                print(json.dumps({
                    "engine": name, "n": n, "chained": K,
                    "gkeys_per_s": round(n / (med / K) / 1e9, 4),
                    "gkeys_per_s_min": round(n / (mn / K) / 1e9, 4),
                    "ms_per_sort": round(med / K * 1e3, 3),
                    "dispersion": round(disp, 3),
                    "method": f"chained{K}_interleaved",
                }), flush=True)
            continue
        if args.interleaved:
            from unitysimpleraytracing_tpu.utils.profiling import (
                measure_interleaved,
            )

            fns = {}
            for name, fn in variants:
                if name.startswith("pallas") and n >= (1 << 24):
                    continue
                np.testing.assert_array_equal(
                    np.asarray(fn(keys[:4096], vals[:4096])),
                    np.sort(np.asarray(keys[:4096])),
                )
                fns[name] = lambda f=fn: f(keys, vals)
            res = measure_interleaved(fns, iters=7, warmup=2, reps=16)
            for name, (med, mn, samples) in res.items():
                disp = (max(samples) - min(samples)) / med if med else 0.0
                print(json.dumps({
                    "engine": name, "n": n,
                    "gkeys_per_s": round(n / med / 1e9, 4),
                    "gkeys_per_s_min": round(n / mn / 1e9, 4),
                    "ms": round(med * 1e3, 3),
                    "dispersion": round(disp, 3),
                    "method": "interleaved_amortized",
                }), flush=True)
            continue
        for name, fn in variants:
            if name.startswith("pallas") and n >= (1 << 24):
                print(json.dumps({"engine": name, "n": n, "skipped": "f32-rank bound"}),
                      flush=True)
                continue
            try:
                np.testing.assert_array_equal(
                    np.asarray(fn(keys[:4096], vals[:4096])),
                    np.sort(np.asarray(keys[:4096])),
                )
                s, method = robust_seconds(lambda: fn(keys, vals), n)
                print(
                    json.dumps(
                        {
                            "engine": name,
                            "n": n,
                            "gkeys_per_s": round(n / s / 1e9, 4),
                            "ms": round(s * 1e3, 3),
                            "method": method,
                        }
                    ),
                    flush=True,
                )
            except Exception as e:  # keep the sweep alive per-engine
                print(json.dumps({"engine": name, "n": n, "error": str(e)[:200]}),
                      flush=True)


if __name__ == "__main__":
    main()
