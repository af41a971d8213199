"""Pallas embedding-row gather kernels.

XLA's generic gather on (rows, 64) f32 embedding tables runs far below HBM
bandwidth on v5e (measured ~6% of peak at AmazonBooks shapes) — it is the
single largest cost in the train step, mirroring the reference's finding
that embedding reads are 39.3% of epoch time (SURVEY.md section 6). These
kernels replace it with explicit, deeply-pipelined row DMAs:

* :func:`gather_rows` — out[j] = table[ids[j]]: one async DMA per row,
  issued in flight-width batches so the DMA engine stays saturated.
* :func:`history_mean_gather` — the behavior-aggregator history mean
  (behavior_aggregators.cpp:96-105) fused with its gather: streams each
  user's history rows into VMEM and reduces them to one (d,) mean without
  materializing the (B, H, d) tensor in HBM.

Ids are read from SMEM (scalar memory) so they can drive DMA source
addresses. Rows are independent, so the grid is trivially parallel; each
program handles a tile of rows/users.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows gathered per kernel program. Each row DMA is started before any is
# awaited, so this is also the DMA pipeline depth.
_GATHER_TILE = 256
# Users per program in the fused history-mean kernel.
_HIS_TILE = 8


def _gather_rows_kernel(ids_ref, table_ref, out_ref, sems):
    for j in range(_GATHER_TILE):
        pltpu.make_async_copy(
            table_ref.at[ids_ref[j]], out_ref.at[j], sems.at[j]
        ).start()
    for j in range(_GATHER_TILE):
        pltpu.make_async_copy(
            table_ref.at[ids_ref[j]], out_ref.at[j], sems.at[j]
        ).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(
    table: jnp.ndarray, ids: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """out[j] = table[ids[j]] via pipelined row DMAs.

    Args:
      table: (N, d). ids: (M,) int32, M padded to a multiple of 256 by the
      caller-visible wrapper (extra rows gather row 0 and are sliced off).
    """
    m = ids.shape[0]
    m_pad = -(-m // _GATHER_TILE) * _GATHER_TILE
    if m_pad != m:
        ids = jnp.concatenate(
            [ids, jnp.zeros((m_pad - m,), ids.dtype)]
        )
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
        scratch_shapes=[pltpu.SemaphoreType.DMA((_GATHER_TILE,))],
        interpret=interpret,
    )(ids, table)
    return out[:m]


def _history_mean_kernel(
    ids_ref, mask_ref, table_ref, out_ref, scratch, sems, *, max_his: int
):
    u_t = _HIS_TILE
    for u in range(u_t):
        for h in range(max_his):
            pltpu.make_async_copy(
                table_ref.at[ids_ref[u, h]],
                scratch.at[u, h],
                sems.at[u, h],
            ).start()
    for u in range(u_t):
        for h in range(max_his):
            pltpu.make_async_copy(
                table_ref.at[ids_ref[u, h]],
                scratch.at[u, h],
                sems.at[u, h],
            ).wait()
    rows = scratch[...]  # (u_t, H, d)
    mask = jnp.asarray([[mask_ref[u]] for u in range(u_t)])  # (u_t, 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (u_t, max_his), 1)
    valid = (pos < mask).astype(rows.dtype)
    total = jnp.einsum(
        "uhd,uh->ud", rows, valid, preferred_element_type=jnp.float32
    )
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

    Args:
      table: (N, d) item embeddings.
      his_ids: (B, H) int32; rows beyond his_mask[b] are ignored.
      his_mask: (B,) int32 valid history lengths.

    Returns: (B, d) means (zero where mask == 0), matching
    models.aggregator.history_mean.
    """
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
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // _HIS_TILE,),
        in_specs=[
            pl.BlockSpec(
                (_HIS_TILE, h), lambda i: (i, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (_HIS_TILE,), lambda i: (i,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (_HIS_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_HIS_TILE, h, d), table.dtype),
            pltpu.SemaphoreType.DMA((_HIS_TILE, h)),
        ],
        interpret=interpret,
    )(his_ids, his_mask, table)
    return out[:b]
