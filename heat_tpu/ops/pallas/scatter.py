"""Pallas in-place row scatter-add (experimental; XLA scatter wins).

Measured verdict on v5e (8704 unique rows, d=128, donated buffers):
XLA's ``table.at[ids].add(deltas)`` takes 0.52 ms (~60 ns/row); this
explicit read-modify-write DMA kernel takes 0.80 ms. As with the gather
kernels, XLA's native op is already near the hardware's random-row floor,
so the production update path stays on XLA (train/scatter.py). Kept as a
verified-correct reference for future Mosaic work.

The kernel performs ``table[ids[k]] += deltas[k]`` with explicit RMW DMAs,
pipelined in chunks of _WINDOW rows, with the table aliased in place.

Safety requirements (enforced by the caller, train/scatter.py):
* ids are UNIQUE among real entries (the sort-dedup pass guarantees it) —
  otherwise pipelined RMWs race;
* padding entries use the sentinel id == table.shape[0]; the kernel skips
  them entirely (a pad entry remapped onto a REAL row would race with
  that row's RMW even with a zero delta — its stale read-back can clobber
  the real update);
* table dtype f32 with row width % 128 == 0 (Mosaic lane-tiling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows handled per kernel program.
_TILE = 1024
# RMW pipeline chunk; needs 2 sems per in-flight row (sflag holds ~490).
_WINDOW = 128


def _scatter_add_kernel(
    ids_ref, deltas_ref, table_in_ref, table_ref, scratch, rsems, wsems,
    *, num_rows: int,
):
    # table_in_ref is the aliased input ref (same buffer as table_ref).
    del table_in_ref

    def safe_id(k):
        # Clamp for address computation; pad entries never start a DMA.
        return jnp.minimum(ids_ref[k], num_rows - 1)

    def read_copy(k, slot):
        return pltpu.make_async_copy(
            table_ref.at[safe_id(k)], scratch.at[slot], rsems.at[slot]
        )

    def write_copy(k, slot):
        return pltpu.make_async_copy(
            scratch.at[slot], table_ref.at[safe_id(k)], wsems.at[slot]
        )

    n_chunks = _TILE // _WINDOW
    for c in range(n_chunks):  # static unroll over chunks
        base = c * _WINDOW

        def start_reads(j, _):
            @pl.when(ids_ref[base + j] < num_rows)
            def _():
                read_copy(base + j, j).start()
            return 0

        def rmw(j, _):
            @pl.when(ids_ref[base + j] < num_rows)
            def _():
                read_copy(base + j, j).wait()
                scratch[j] = scratch[j] + deltas_ref[base + j]
                write_copy(base + j, j).start()
            return 0

        def drain(j, _):
            @pl.when(ids_ref[base + j] < num_rows)
            def _():
                write_copy(base + j, j).wait()
            return 0

        jax.lax.fori_loop(0, _WINDOW, start_reads, 0)
        jax.lax.fori_loop(0, _WINDOW, rmw, 0)
        jax.lax.fori_loop(0, _WINDOW, drain, 0)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def scatter_add_rows(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    deltas: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """table[ids[k]] += deltas[k], in place (table is donated/aliased).

    ids: (M,) int32, unique among real entries; padding uses the sentinel
    id == table.shape[0] (skipped). deltas: (M, d) matching table dtype.
    d % 128 == 0, f32.
    """
    n, d = table.shape
    if d % 128 != 0 or table.dtype != jnp.float32:
        raise ValueError(f"need f32 table with d % 128 == 0, got {table.shape} {table.dtype}")
    m = ids.shape[0]
    m_pad = -(-m // _TILE) * _TILE
    if m_pad != m:
        ids = jnp.concatenate(
            [ids, jnp.full((m_pad - m,), n, ids.dtype)]
        )
        deltas = jnp.concatenate(
            [deltas, jnp.zeros((m_pad - m, d), deltas.dtype)]
        )
    kernel = functools.partial(_scatter_add_kernel, num_rows=n)
    return pl.pallas_call(
        kernel,
        grid=(m_pad // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        scratch_shapes=[
            pltpu.VMEM((_WINDOW, d), table.dtype),
            pltpu.SemaphoreType.DMA((_WINDOW,)),
            pltpu.SemaphoreType.DMA((_WINDOW,)),
        ],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(ids, deltas, table)
