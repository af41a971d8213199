"""A/B: XLA row scatter-set vs a Pallas pipelined-DMA scatter at huge scale.

At 16M-row tables XLA's scatter costs ~170 ns/row (latency-serialized row
writes); the gather-side verdict (ops/pallas/gather.py: XLA wins) was
measured at SMALL tables where XLA runs ~3.6-10 ns/row. This experiment
checks whether a deep in-flight DMA window (256 outstanding row copies)
beats XLA where latency dominates.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_scatter_pallas.py [rows]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 16 * 1024 * 1024
D = 128
M = 32 * 1024          # rows scattered per step
TILE = 1024
WINDOW = 256
N_ITERS = 50


def _scatter_set_kernel(ids_ref, rows_ref, table_in_ref, out_ref, sems, *, num_rows):
    # table_in_ref is aliased to out_ref (input_output_aliases); DMAs write
    # through out_ref, untouched rows keep their (aliased) contents.
    del table_in_ref

    def make_copy(k, slot):
        return pltpu.make_async_copy(
            rows_ref.at[k], out_ref.at[ids_ref[k]], sems.at[slot]
        )

    def body(k, _):
        @pl.when(k >= WINDOW)
        def _():
            @pl.when(ids_ref[k - WINDOW] < num_rows)
            def _():
                make_copy(k - WINDOW, (k - WINDOW) % WINDOW).wait()

        @pl.when(ids_ref[k] < num_rows)
        def _():
            make_copy(k, k % WINDOW).start()

        return 0

    jax.lax.fori_loop(0, TILE, body, 0)

    def tail(k, _):
        @pl.when(ids_ref[k] < num_rows)
        def _():
            make_copy(k, k % WINDOW).wait()
        return 0

    jax.lax.fori_loop(max(0, TILE - WINDOW), TILE, tail, 0)


def pallas_scatter_set(table, ids, rows):
    num_rows = table.shape[0]
    kern = functools.partial(_scatter_set_kernel, num_rows=num_rows)
    return pl.pallas_call(
        kern,
        grid=(ids.shape[0] // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (TILE, table.shape[1]), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((WINDOW,))],
        input_output_aliases={2: 0},
    )(ids, rows, table)


def main():
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    table = jax.random.normal(k1, (ROWS, D), jnp.float32)
    # Sorted unique-ish ids with a padded (sentinel) tail, like the sorted
    # dedup path produces.
    ids = jnp.sort(jax.random.randint(k2, (M,), 0, ROWS, dtype=jnp.int32))
    ids = ids.at[-M // 8 :].set(ROWS)  # 1/8 padding sentinels
    rows = jax.random.normal(k3, (M, D), jnp.float32)

    def scan_time(name, step, t):
        # Donate the table through the scan: at 16M x 128 f32 the table is
        # 8 GB — an undonated input+output pair OOMs the 16 GB chip.
        @functools.partial(jax.jit, donate_argnums=(0,))
        def prog(t, xs):
            def body(tt, x):
                return step(tt, x), jnp.float32(0)
            return jax.lax.scan(body, t, xs)

        xs = jnp.arange(N_ITERS, dtype=jnp.float32)
        t = prog(t, xs)[0]
        _ = float(t[0, 0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            t = prog(t, xs)[0]
            _ = float(t[0, 0])
            best = min(best, (time.perf_counter() - t0) / N_ITERS)
        print(f"{name:38s} {best*1e3:8.3f} ms/iter  ({best/M*1e9:6.1f} ns/row)")
        return t

    table = scan_time(
        "XLA scatter-set (mode=drop)",
        lambda t, x: t.at[ids].set(rows + x, mode="drop"),
        table,
    )
    scan_time(
        "pallas DMA scatter-set",
        lambda t, x: pallas_scatter_set(t, ids, rows + x),
        table,
    )

    if ROWS <= 1 << 20:  # correctness only at small scale (memory)
        k4 = jax.random.split(key)[0]
        table2 = jax.random.normal(k4, (ROWS, D), jnp.float32)
        got = pallas_scatter_set(table2, ids, rows)
        want = table2.at[ids].set(rows, mode="drop")
        import numpy as np

        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
        print("correctness: OK")


if __name__ == "__main__":
    main()
