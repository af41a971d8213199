"""Exact-mode gather ceiling: lane width + multi-row DMA descriptors.

VERDICT r2 item 4 asks for the unclaimed Pallas half of the exact-mode
gather story: retry the Mosaic gather with multiple rows per DMA
descriptor, or record the measured issue-rate ceiling. This measures:

  a) the (B, H) = 819k-row f32 history gather + fused mean at table
     width 64 vs 128 (the half-lane penalty found at huge tables —
     scripts/profile_lane_width.py — may tax f32 small tables too);
  b) a Pallas DMA loop issuing ONE descriptor per R CONTIGUOUS rows,
     R in {1, 2, 4, 8, 16} — the upper bound multi-row descriptors could
     reach IF random history ids had R-contiguity (they do not; this
     bounds the idea from above);
  c) XLA's own gather at the same shapes, the number to beat.

Run: python scripts/profile_exact_ceiling.py  (real TPU, ~5 min)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I, D, H, B = 91_599, 64, 100, 8192
ITERS = 200
WINDOW = 256


def scan_time(name, body, carry_fn, rows, iters=ITERS, donate=True):
    # donate=False for Pallas bodies: donating the table carry that also
    # feeds a pallas_call HBM operand was observed to fail at runtime
    # (InvalidArgument) where the undonated form runs fine.
    fn = jax.jit(
        lambda c, ks: jax.lax.scan(body, c, ks),
        donate_argnums=(0,) if donate else (),
    )
    keys = jax.random.split(jax.random.key(1), iters)
    out = fn(carry_fn(), keys)
    _ = float(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32))
    del out
    c2 = carry_fn()
    jax.block_until_ready(c2)
    t0 = time.perf_counter()
    out = fn(c2, keys)
    _ = float(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt * 1e3:8.3f} ms/step ({dt / rows * 1e9:6.2f} ns/row)")
    del out
    return dt


def xla_part() -> None:
    from heat_tpu.models.aggregator import history_mean_fused

    his = jax.random.randint(
        jax.random.key(7), (52_643, H), 0, I, dtype=jnp.int32
    )
    masks = jnp.full((52_643,), H, jnp.int32)

    for d in (64, 128):
        def table(d=d):
            return jnp.zeros((I, d), jnp.float32)

        def g_raw(carry, k, d=d):
            users = jax.random.randint(k, (B,), 0, 52_643, dtype=jnp.int32)
            rows = carry[his[users].reshape(-1)]
            return carry, rows.ravel()[0]

        def g_fused(carry, k):
            users = jax.random.randint(k, (B,), 0, 52_643, dtype=jnp.int32)
            m = history_mean_fused(carry, his[users], masks[users])
            return carry, m.ravel()[0]

        scan_time(f"XLA raw (B,H) gather f32 d={d}", g_raw, table, B * H)
        scan_time(f"history_mean_fused f32 d={d}", g_fused, table, B * H)


def _multi_row_kernel(ids_ref, table_ref, out_ref, sems, *, r, tile):
    def make_copy(k, slot):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(ids_ref[k] * r, r)],
            out_ref.at[pl.ds(k * r, r)],
            sems.at[slot],
        )

    def body(k, _):
        @pl.when(k >= WINDOW)
        def _():
            make_copy(k - WINDOW, (k - WINDOW) % WINDOW).wait()

        make_copy(k, k % WINDOW).start()
        return 0

    jax.lax.fori_loop(0, tile, body, 0)

    def tail(k, _):
        make_copy(k, k % WINDOW).wait()
        return 0

    jax.lax.fori_loop(max(0, tile - WINDOW), tile, tail, 0)


def pallas_part() -> None:
    d = 128  # DMA-addressable f32 rows
    rows_total = 64 * 1024  # rows gathered per step

    for r in (1, 2, 4, 8, 16):
        n_desc = rows_total // r
        tile = 1024  # SMEM int32 blocks must align to the (1024) layout
        grid = n_desc // tile
        table = jnp.zeros((I // 16 * 16 + 16, d), jnp.float32)
        nblk = table.shape[0] // r

        kern = functools.partial(_multi_row_kernel, r=r, tile=tile)

        def gather_blocks(table, ids):
            return pl.pallas_call(
                kern,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec(
                        (tile,), lambda i: (i,), memory_space=pltpu.SMEM
                    ),
                    pl.BlockSpec(memory_space=pltpu.HBM),
                ],
                out_specs=pl.BlockSpec(
                    (tile * r, d), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((rows_total, d), jnp.float32),
                scratch_shapes=[pltpu.SemaphoreType.DMA((WINDOW,))],
            )(ids, table)

        def body(carry, k, nblk=nblk, gather_blocks=gather_blocks):
            ids = jax.random.randint(k, (n_desc,), 0, nblk, dtype=jnp.int32)
            out = gather_blocks(carry, ids)
            return carry, out.ravel()[0]

        try:
            scan_time(
                f"pallas {r}-row descriptors ({n_desc} DMAs)",
                body,
                lambda table=table: table,
                rows_total,
                iters=50,
                donate=False,
            )
        except Exception as e:  # Mosaic may reject a shape; record it
            print(f"pallas r={r}: REJECTED: {type(e).__name__}: {e}"[:200])


if __name__ == "__main__":
    xla_part()
    pallas_part()
