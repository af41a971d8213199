"""Pallas embedding-row gather kernels (experimental; XLA gather wins).

Explicit per-row DMA gathers with a rolling in-flight window (the TPU
semaphore space holds only ~490 semaphores, so _WINDOW slots are recycled):

* :func:`gather_rows` — out[j] = table[ids[j]];
* :func:`history_mean_gather` — the behavior-aggregator history mean
  (behavior_aggregators.cpp:96-105) fused with its gather.

Measured verdict on v5e (scripts/profile_gather.py, 819k rows, d=128):
XLA's native gather reaches ~146 GB/s (~2x off realistic speed-of-light for
random 512 B reads); this per-row-DMA kernel is ~10x SLOWER because the
scalar DMA-issue loop costs ~35 ns/row and serializes. The production
gather path therefore stays on XLA; the framework attacks embedding-read
cost algorithmically instead (per-epoch history-mean caching — see
CFConfig.his_refresh and engine.compute_user_pools). These kernels are
kept as verified-correct references for future Mosaic work (e.g. a
vectorized gather primitive) and for the eval top-k fusion experiments.

Constraints: Mosaic requires row slices aligned to the 128-lane tiling, so
``table.shape[1] % 128 == 0``. Ids are read from SMEM (scalar memory) so
they can drive DMA addresses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows gathered per kernel program.
_GATHER_TILE = 1024
# In-flight DMA window == semaphore slots recycled (sflag capacity ~490).
_WINDOW = 256
# Users per program in the fused history-mean kernel.
_HIS_TILE = 8


def _supported(table: jnp.ndarray) -> bool:
    return table.shape[1] % 128 == 0 and table.dtype == jnp.float32


def _rolling_dma_loop(total: int, make_copy) -> None:
    """Issue ``total`` DMAs keeping at most _WINDOW in flight.

    make_copy(k, slot) must return the pltpu async-copy descriptor for the
    k-th transfer using semaphore ``slot``.
    """

    def body(k, _):
        @pl.when(k >= _WINDOW)
        def _():
            make_copy(k - _WINDOW, (k - _WINDOW) % _WINDOW).wait()

        make_copy(k, k % _WINDOW).start()
        return 0

    jax.lax.fori_loop(0, total, body, 0)

    def tail(k, _):
        make_copy(k, k % _WINDOW).wait()
        return 0

    jax.lax.fori_loop(max(0, total - _WINDOW), total, tail, 0)


def _gather_rows_kernel(ids_ref, table_ref, out_ref, sems):
    def make_copy(k, slot):
        return pltpu.make_async_copy(
            table_ref.at[ids_ref[k]], out_ref.at[k], sems.at[slot]
        )

    _rolling_dma_loop(_GATHER_TILE, make_copy)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(
    table: jnp.ndarray, ids: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """out[j] = table[ids[j]] via pipelined row DMAs.

    table: (N, d) with d % 128 == 0. ids: (M,) int32 (padded internally to
    a multiple of the tile; extra rows gather row 0 and are sliced off).
    """
    if not _supported(table):
        raise ValueError(
            f"gather_rows requires d % 128 == 0 f32 table, got "
            f"{table.shape} {table.dtype}"
        )
    m = ids.shape[0]
    m_pad = -(-m // _GATHER_TILE) * _GATHER_TILE
    if m_pad != m:
        ids = jnp.concatenate([ids, jnp.zeros((m_pad - m,), ids.dtype)])
    out = pl.pallas_call(
        _gather_rows_kernel,
        grid=(m_pad // _GATHER_TILE,),
        in_specs=[
            pl.BlockSpec(
                (_GATHER_TILE,), lambda i: (i,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (_GATHER_TILE, table.shape[1]),
            lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, table.shape[1]), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_WINDOW,))],
        interpret=interpret,
    )(ids, table)
    return out[:m]


def _history_mean_kernel(
    ids_ref, mask_ref, table_ref, out_ref, scratch, sems, *, max_his: int
):
    u_t = _HIS_TILE

    def make_copy(k, slot):
        u, h = k // max_his, k % max_his
        return pltpu.make_async_copy(
            table_ref.at[ids_ref[u, h]], scratch.at[u, h], sems.at[slot]
        )

    _rolling_dma_loop(u_t * max_his, make_copy)

    rows = scratch[...]  # (u_t, H, d)
    mask = jnp.asarray([[mask_ref[u, 0]] for u in range(u_t)])  # (u_t, 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (u_t, max_his), 1)
    valid = (pos < mask).astype(rows.dtype)  # (u_t, H)
    total = jnp.sum(rows * valid[:, :, None], axis=1)  # VPU reduce
    denom = jnp.maximum(mask.astype(rows.dtype), 1.0)
    out_ref[...] = total / denom


@functools.partial(jax.jit, static_argnames=("interpret",))
def history_mean_gather(
    table: jnp.ndarray,
    his_ids: jnp.ndarray,
    his_mask: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Masked mean of table[his_ids[b]] rows, fused with the gather.

    table: (N, d), d % 128 == 0. his_ids: (B, H) int32. his_mask: (B,).
    Returns (B, d) f32 means (zero where mask == 0), matching
    models.aggregator.history_mean.
    """
    if not _supported(table):
        raise ValueError(
            f"history_mean_gather requires d % 128 == 0 f32 table, got "
            f"{table.shape} {table.dtype}"
        )
    b, h = his_ids.shape
    d = table.shape[1]
    b_pad = -(-b // _HIS_TILE) * _HIS_TILE
    if b_pad != b:
        his_ids = jnp.concatenate(
            [his_ids, jnp.zeros((b_pad - b, h), his_ids.dtype)]
        )
        his_mask = jnp.concatenate(
            [his_mask, jnp.zeros((b_pad - b,), his_mask.dtype)]
        )
    kernel = functools.partial(_history_mean_kernel, max_his=h)
    his_mask = his_mask.reshape(-1, 1)
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // _HIS_TILE,),
        in_specs=[
            pl.BlockSpec(
                (_HIS_TILE, h), lambda i: (i, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (_HIS_TILE, 1), lambda i: (i, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (_HIS_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_HIS_TILE, h, d), table.dtype),
            pltpu.SemaphoreType.DMA((_WINDOW,)),
        ],
        interpret=interpret,
    )(his_ids, his_mask, table)
    return out[:b]
