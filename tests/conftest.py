"""Test configuration: force CPU with 8 virtual devices (multi-chip sharding
tests run on a virtual mesh; benches run on real TPU via bench.py)."""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (after env setup)

# The environment may pre-import jax pinned to a TPU platform via
# sitecustomize; config.update overrides it post-import.
jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache DISABLED for the suite (round 5): with
# ~170 tests' process state accumulated, cache writes reproducibly
# abort/segfault the interpreter inside ``executable.serialize()``
# (compilation_cache.py put_executable_and_time) — 5 consecutive full-suite
# runs died at exactly tests/test_trace_pallas4.py::test_bvh4_two_triangles
# while the same test passes standalone and in partial runs; the crash
# survived clearing the cache dir, dropping
# jax_persistent_cache_enable_xla_caches="all", raising the min-compile-time
# threshold to 2 s, and appeared in the READ direction too (corrupt entry).
# A slower green suite beats a faster crashing one; benches keep their own
# cache (/tmp/jax_bench_cache) — the bug needs suite-scale state that a
# single bench process never accumulates.
jax.config.update("jax_enable_compilation_cache", False)
