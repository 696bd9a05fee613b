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
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
# NOTE: jax_persistent_cache_enable_xla_caches="all" was dropped in round 5:
# with ~170 suite tests' state accumulated it segfaulted the interpreter
# inside the cache serialize/deserialize path (put/get_executable_and_time),
# reproducibly at the same test and in both read and write directions.
