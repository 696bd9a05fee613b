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
    p.add_argument("--engines", nargs="+", default=["xla", "pallas", "radix"])
    p.add_argument("--platform", choices=["tpu", "cpu"], default=None)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--reps", type=int, default=4)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    import jax.numpy as jnp
    import numpy as np

    from unitysimpleraytracing_tpu.ops import sort as sort_ops
    from unitysimpleraytracing_tpu.utils.profiling import measure

    print(f"[sort_bench] device={jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    for lg in args.sizes:
        n = 1 << lg
        keys = jnp.asarray(
            rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
        )
        vals = jnp.arange(n, dtype=jnp.int32)
        for eng in args.engines:
            if eng == "pallas" and n >= (1 << 24):
                print(json.dumps({"engine": eng, "n": n, "skipped": "f32-rank bound"}),
                      flush=True)
                continue
            fn = jax.jit(lambda k, v, e=eng: sort_ops.sort_key_val(k, v, impl=e)[0])
            try:
                np.testing.assert_array_equal(
                    np.asarray(fn(keys[:4096], vals[:4096])),
                    np.sort(np.asarray(keys[:4096])),
                )
                s = measure(lambda: fn(keys, vals), iters=args.iters, reps=args.reps)
                print(
                    json.dumps(
                        {
                            "engine": eng,
                            "n": n,
                            "gkeys_per_s": round(n / s / 1e9, 4),
                            "ms": round(s * 1e3, 3),
                        }
                    ),
                    flush=True,
                )
            except Exception as e:  # keep the sweep alive per-engine
                print(json.dumps({"engine": eng, "n": n, "error": str(e)[:200]}),
                      flush=True)


if __name__ == "__main__":
    main()
