"""Tracing / profiling subsystem.

The reference has **no** observability — no timers, no profiler markers
(SURVEY §5: grep over Assets/_Scripts finds none); its only instrument is
``Debug.Log`` array dumps.  This module is the subsystem the TPU framework
adds: wall-time measurement that is correct over an asynchronous (and
possibly remote-tunneled) device, JAX profiler trace capture, and roofline
accounting for the three hot operators (sort, build, traverse).

Measurement notes baked in here:

- ``block_until_ready`` can under-report through remote device transports;
  a value fetch cannot, so timers force one.
- Per-call fixed overhead (dispatch + fetch latency) is cancelled by
  slope timing: ``(time(k_reps) - time(1_rep)) / (k - 1)``.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax
import numpy as np


def fetch(x) -> float:
    """Force full materialization of a jitted result (stronger than
    block_until_ready over remote tunnels)."""
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def _timed_reps(fn, reps: int) -> float:
    t0 = time.perf_counter()
    r = None
    for _ in range(reps):
        r = fn()
    fetch(r)
    return time.perf_counter() - t0


def measure(fn, iters: int = 5, warmup: int = 2, reps: int = 8) -> float:
    """Median steady-state seconds per call of ``fn`` (slope-timed)."""
    for _ in range(warmup):
        fetch(fn())
    slopes = []
    for _ in range(iters):
        t1 = _timed_reps(fn, 1)
        tn = _timed_reps(fn, reps)
        slopes.append((tn - t1) / (reps - 1))
    return max(float(np.median(slopes)), 1e-9)


def measure_interleaved(
    fns: dict, iters: int = 5, warmup: int = 1, reps: int = 4
) -> dict:
    """Compare variants under chip-speed drift: one AMORTIZED sample per
    variant per ROUND, round-robin, so a slow minute hits every variant
    equally instead of whichever variant's sequential block it lands on (the
    tunneled chip drifts up to ~2x within a session — sequential-block A/Bs
    produced contradictory orderings on consecutive runs; slope sampling
    under the same drift produced impossible minima).  The amortized form
    t(reps)/reps includes 1/reps of the fixed dispatch+fetch latency — a
    strict overestimate, identical across variants, so RATIOS hold.
    Returns ``{name: (median_s, min_s, samples)}``."""
    for fn in fns.values():
        for _ in range(warmup):
            fetch(fn())
    samples: dict = {k: [] for k in fns}
    for _ in range(iters):
        for k, fn in fns.items():
            samples[k].append(_timed_reps(fn, reps) / reps)
    return {
        k: (max(float(np.median(v)), 1e-9), max(min(v), 1e-9), v)
        for k, v in samples.items()
    }


@dataclass
class OpStats:
    name: str
    seconds: float
    bytes_accessed: int = 0
    flops: int = 0

    def gbytes_per_s(self) -> float:
        return self.bytes_accessed / self.seconds / 1e9

    def gflops_per_s(self) -> float:
        return self.flops / self.seconds / 1e9

    def roofline_fraction(
        self, peak_gbytes_s: float = 819.0, peak_gflops: float = 197_000.0
    ) -> float:
        """Achieved fraction of the roofline bound (defaults: TPU v5e HBM
        ~819 GB/s, bf16 MXU ~197 TFLOP/s; pass your chip's numbers)."""
        t_mem = self.bytes_accessed / (peak_gbytes_s * 1e9)
        t_flop = self.flops / (peak_gflops * 1e9)
        bound = max(t_mem, t_flop)
        return bound / self.seconds if self.seconds > 0 else 0.0


class Profiler:
    """Collects named operator timings; optionally wraps a JAX profiler trace.

    >>> prof = Profiler()
    >>> with prof.op("build", bytes_accessed=scene_bytes):
    ...     bvh = build_bvh(scene); prof.sync(bvh)
    >>> print(prof.report())
    """

    def __init__(self):
        self.stats: list[OpStats] = []

    @contextlib.contextmanager
    def op(self, name: str, bytes_accessed: int = 0, flops: int = 0):
        t0 = time.perf_counter()
        yield
        self.stats.append(
            OpStats(name, time.perf_counter() - t0, bytes_accessed, flops)
        )

    def sync(self, x) -> None:
        fetch(x)

    def report(self) -> str:
        lines = [f"{'op':<24}{'ms':>10}{'GB/s':>10}{'GFLOP/s':>10}"]
        for s in self.stats:
            lines.append(
                f"{s.name:<24}{s.seconds*1e3:>10.3f}"
                f"{s.gbytes_per_s():>10.2f}{s.gflops_per_s():>10.2f}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a JAX/XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# Roofline byte/FLOP models for the three hot operators --------------------

def sort_bytes(n: int, passes: int = 4) -> int:
    """LSD radix sort traffic: each pass reads+writes keys and values (4 B
    each) plus histogram traffic (negligible)."""
    return passes * (2 * 4 + 2 * 4) * n


def build_bytes(n: int) -> int:
    """LBVH build: sort + topology reads (codes) + refit (node AABBs, ~levels
    passes over 32 B/node) — a coarse lower bound."""
    depth = max(int(np.ceil(np.log2(max(n, 2)))) + 1, 1)
    return sort_bytes(n) + n * 4 * 3 + depth * (n * 32)


def traverse_bytes(n_rays: int, mean_steps: float, packet: int = 1024) -> int:
    """Packet traversal traffic: one 36 B node record per step per packet
    (tables are VMEM-resident; HBM traffic is rays in + hits out)."""
    return n_rays * (6 * 4 + 4 * 4) + int(n_rays / packet * mean_steps) * 36
