"""Mosaic primitive cost probe: scalar VMEM fetches, reductions, SMEM ops.

Times tiny Pallas while-loops that isolate one primitive per iteration, so
traversal-kernel design decisions rest on measured per-op costs instead of
guesses:

    python benchmarks/kernel_probe.py [--iters 20000]

Each probe reports ns per loop iteration; subtract the 'empty' baseline.
"""
from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20000)
    args = p.parse_args()
    N = args.iters

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    from unitysimpleraytracing_tpu.utils.profiling import measure

    print(f"[probe] device={jax.devices()[0]} iters={N}", file=sys.stderr, flush=True)

    def run_probe(name, body_fn, tab_shape=(4096, 16)):
        """body_fn(tab, i, acc_scalar, acc_vec) -> (new_scalar, new_vec)."""

        def kernel(tab, out):
            def body(carry):
                i, acc_s, acc_v = carry
                acc_s, acc_v = body_fn(tab, i, acc_s, acc_v)
                return i + 1, acc_s, acc_v

            _, acc_s, acc_v = jax.lax.while_loop(
                lambda c: c[0] < N, body,
                (jnp.int32(0), jnp.float32(0), jnp.zeros((8, 128), jnp.float32)),
            )
            out[0, 0] = acc_s + jnp.sum(acc_v[0, :1])

        call = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(tab_shape, lambda: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda: (0, 0), memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )
        tab = jnp.ones(tab_shape, jnp.float32)
        fn = jax.jit(lambda: call(tab))
        try:
            s = measure(fn, iters=3, reps=4)
        except Exception as e:
            print(json.dumps({"probe": name, "error": str(e)[:120]}), flush=True)
            return None
        print(json.dumps({"probe": name, "ns_per_iter": round(s * 1e9 / N, 2)}),
              flush=True)
        return s * 1e9 / N

    # Baseline: loop bookkeeping only.
    run_probe("empty", lambda tab, i, s, v: (s + 1.0, v))

    # K scalar fetches from a dynamic row (the traversal fetch pattern).
    for k in (1, 4, 8, 16, 32):
        def fetch_k(tab, i, s, v, k=k):
            r = (i * 37 + 11) & 4095
            acc = s
            for c in range(k):
                acc = acc + tab[r, c % 16]
            return acc, v

        run_probe(f"fetch_x{k}", fetch_k)

    # Full-packet (8,128) sum reduction to scalar.
    def reduce_sum(tab, i, s, v):
        return s + jnp.sum(v + 1.0), v

    run_probe("reduce_sum_8x128", reduce_sum)

    # Two chained reductions.
    def reduce_two(tab, i, s, v):
        a = jnp.sum(v + 1.0)
        b = jnp.sum(v + 2.0)
        return s + a + b, v

    run_probe("reduce_sum_x2", reduce_two)

    # Vector math only: ~40 elementwise ops on (8,128).
    def vec40(tab, i, s, v):
        x = v
        for _ in range(10):
            x = x * 1.0001 + 0.5
            x = jnp.minimum(x, 3.0)
            x = jnp.maximum(x, -3.0)
            x = x - 0.1
        return s, x

    run_probe("vector_40ops", vec40)

    # Dynamic-lane fetch via 8-way switch (the packed-layout pattern).
    def fetch_packed8(tab, i, s, v):
        r = (i * 37 + 11) & (4096 * 8 - 1)
        row = r // 8

        def make(j):
            def br(_):
                return tuple(tab[row, j * 2 + c] for c in range(2))

            return br

        a, b = jax.lax.switch(r & 7, [make(j) for j in range(8)], None)
        return s + a + b, v

    run_probe("fetch_packed_switch8_x2", fetch_packed8)

    # --- HBM-row DMA probes (VERDICT r5 item 1): per-record async-copy cost
    # for a data-dependent 512 B record row, the primitive of a hybrid
    # VMEM-top/HBM-deep single-tree traversal.  'serial' = start+wait per
    # row (worst case); 'batchD' = D copies issued back-to-back then drained
    # (the per-iteration popn pattern: all D indices are known at iteration
    # start from the stack).  Reported per ROW.
    N_DMA = max(N // 10, 1000)
    HBM_ROWS = 1 << 15

    def run_dma_probe(name, depth, rows_per_rec=1):
        def kernel(hbm, out, scratch, sems):
            def round_body(carry):
                r, base, acc = carry
                # Indices for this round: LCG chain seeded by base (which
                # depends on the previous round's fetched data — the
                # traversal's stack dependence).
                idxs = []
                x = base
                for _ in range(depth):
                    x = (x * 1103515245 + 12345) & (HBM_ROWS - 1)
                    idxs.append(x)
                for j in range(depth):
                    pltpu.make_async_copy(
                        hbm.at[pl.ds(idxs[j] * rows_per_rec, rows_per_rec)],
                        scratch.at[pl.ds(j * rows_per_rec, rows_per_rec)],
                        sems.at[j],
                    ).start()
                for j in range(depth):
                    pltpu.make_async_copy(
                        hbm.at[pl.ds(idxs[j] * rows_per_rec, rows_per_rec)],
                        scratch.at[pl.ds(j * rows_per_rec, rows_per_rec)],
                        sems.at[j],
                    ).wait()
                    acc = acc + scratch[j * rows_per_rec, 0]
                # Data dependence into the next round's indices.
                base = idxs[-1] ^ scratch[0, 1].astype(jnp.int32)
                return r + 1, base, acc

            rounds = N_DMA // depth
            _, _, acc = jax.lax.while_loop(
                lambda c: c[0] < rounds, round_body,
                (jnp.int32(0), jnp.int32(1), jnp.float32(0)),
            )
            out[0, 0] = acc

        call = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 1), lambda: (0, 0), memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((depth * rows_per_rec, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
        )
        tab = jnp.zeros((HBM_ROWS * rows_per_rec, 128), jnp.float32)
        fn = jax.jit(lambda: call(tab))
        try:
            s = measure(fn, iters=3, reps=4)
        except Exception as e:
            print(json.dumps({"probe": name, "error": str(e)[:200]}), flush=True)
            return None
        rows_done = (N_DMA // depth) * depth
        print(json.dumps({"probe": name,
                          "ns_per_row": round(s * 1e9 / rows_done, 2),
                          "bytes_per_row": 512 * rows_per_rec}),
              flush=True)
        return s * 1e9 / rows_done

    run_dma_probe("dma_row512_serial", depth=1)
    run_dma_probe("dma_row512_batch2", depth=2)
    run_dma_probe("dma_row512_batch4", depth=4)
    run_dma_probe("dma_row512_batch8", depth=8)
    run_dma_probe("dma_row2048_batch8", depth=8, rows_per_rec=4)


if __name__ == "__main__":
    main()
