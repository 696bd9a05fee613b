"""Debug print/probe helpers.

Analog of the reference's ``Utils.ArrayToString`` dump helper
(``Assets/_Scripts/_utils/Utils.cs:8-31``, capped at 4096 elements) and its
throwaway probe harnesses (``_debugComputeShaderTester.cs:16-27``): small
tools for eyeballing device arrays and probing kernels during development.
"""
from __future__ import annotations

import numpy as np


def array_to_string(arr, limit: int = 4096) -> str:
    """Space-joined dump of up to ``limit`` elements (Utils.cs:13's cap)."""
    a = np.asarray(arr).ravel()
    body = " ".join(str(x) for x in a[:limit])
    return body + (" …" if a.size > limit else "")


def dump(name: str, arr, limit: int = 64) -> None:
    a = np.asarray(arr)
    print(f"{name}: shape={a.shape} dtype={a.dtype} [{array_to_string(a, limit)}]")


def probe_kernel(fn, *args):
    """Dispatch-and-read-back probe (the _debugComputeShaderTester pattern):
    run a jitted/op function and return its outputs as numpy."""
    import jax

    out = fn(*args)
    return jax.tree_util.tree_map(np.asarray, out)
