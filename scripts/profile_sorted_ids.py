"""Measure sorted-vs-random id effects at huge-table geometry (16M rows).

Hypotheses behind the batch-sorted-by-user optimization (VERDICT r3 task:
attack the ~170 ns/row sorted-scatter bound):

  a) XLA gather of (B,) rows from a 16M-row bf16 table: do ASCENDING ids
     beat random ids (page/TLB locality)?
  b) XLA row scatter-set: same question.
  c) segment_sum_by_id: how much of it is the argsort + the (M, d)
     values[order] gather that pre-sorted ids make unnecessary?
  d) the full fused user update (writeback+update) with pre-sorted ids
     and the argsort skipped vs the shipped path.

Run: python scripts/profile_sorted_ids.py  (real TPU, ~4 min)
Measurement rules per the verify skill: in-scan, per-iteration xs,
donated carries, host-transfer sync.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ROWS = 16 * 1024 * 1024
D = 64
B = 32 * 1024
ITERS = 100


def scan_time(name, body, carry_fn, iters=ITERS):
    fn = jax.jit(
        lambda c, ks: jax.lax.scan(body, c, ks), donate_argnums=0
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
    print(f"{name:44s} {dt * 1e3:8.2f} ms/step ({dt / B * 1e9:6.1f} ns/row)")
    del out
    return dt


def main() -> None:
    dt = jnp.bfloat16

    def table():
        return jnp.zeros((ROWS, D), dt)

    def rand_ids(k):
        return jax.random.randint(k, (B,), 0, ROWS, dtype=jnp.int32)

    # a) gathers: random vs ascending ids
    def g_rand(carry, k):
        ids = rand_ids(k)
        return carry, carry[ids].astype(jnp.float32).ravel()[0]

    def g_sorted(carry, k):
        ids = jnp.sort(rand_ids(k))
        return carry, carry[ids].astype(jnp.float32).ravel()[0]

    t = table()
    scan_time("gather 32k random ids", g_rand, table)
    scan_time("gather 32k sorted ids (incl. the sort)", g_sorted, table)

    # b) scatter-set: random vs ascending ids
    rows_payload = jnp.full((B, D), 0.001, dt)

    def s_rand(carry, k):
        ids = rand_ids(k)
        return carry.at[ids].set(rows_payload, mode="drop"), ()

    def s_sorted(carry, k):
        ids = jnp.sort(rand_ids(k))
        return carry.at[ids].set(rows_payload, mode="drop"), ()

    scan_time("scatter-set 32k random ids", s_rand, table)
    scan_time("scatter-set 32k sorted ids (incl. sort)", s_sorted, table)

    # b2) scatter-ADD (the direct-mode shape)
    def sa_rand(carry, k):
        ids = rand_ids(k)
        return carry.at[ids].add(rows_payload, mode="drop"), ()

    scan_time("scatter-add 32k random ids", sa_rand, table)

    # c) segment_sum_by_id: full vs pre-sorted (argsort+gather skipped)
    from heat_tpu.train.scatter import segment_sum_by_id

    grads = jnp.full((B, D), 1e-6, jnp.float32)

    def seg_full(carry, k):
        ids = rand_ids(k)
        rep, summed = segment_sum_by_id(ids, grads, ROWS)
        return carry, summed.ravel()[0] + rep[0].astype(jnp.float32)

    def seg_presorted(carry, k):
        sid = jnp.sort(rand_ids(k))  # stands in for host-pre-sorted ids
        starts = jnp.concatenate(
            [jnp.ones((1,), bool), sid[1:] != sid[:-1]]
        )
        seg = jnp.cumsum(starts) - 1
        summed = jax.ops.segment_sum(grads, seg, num_segments=B)
        rep = jnp.full((B,), ROWS, sid.dtype).at[seg].set(sid)
        return carry, summed.ravel()[0] + rep[0].astype(jnp.float32)

    scan_time("segment_sum_by_id (argsort + gather)", seg_full, lambda: 0.0)
    scan_time("segment-sum pre-sorted (sort only)", seg_presorted, lambda: 0.0)

    # d) the fused user update: shipped vs pre-sorted fast path
    from heat_tpu.train.scatter import apply_row_updates

    def upd_shipped(carry, k):
        ids = rand_ids(k)
        carry, _ = apply_row_updates(
            carry, ids, grads, lr=jnp.float32(0.01), clip_val=1.0,
            writeback=rows_payload,
        )
        return carry, ()

    def upd_presorted(carry, k):
        sid = jnp.sort(rand_ids(k))
        # pre-sorted fast path: no argsort, no values[order] gathers
        starts = jnp.concatenate(
            [jnp.ones((1,), bool), sid[1:] != sid[:-1]]
        )
        seg = jnp.cumsum(starts) - 1
        summed = jax.ops.segment_sum(grads, seg, num_segments=B)
        rep = jnp.full((B,), ROWS, sid.dtype).at[seg].set(sid)
        first_pos = (
            jnp.full((B,), B - 1, jnp.int32)
            .at[seg]
            .min(jnp.arange(B, dtype=jnp.int32))
        )
        base = rows_payload[first_pos].astype(jnp.float32)
        g = jnp.clip(summed, -1.0, 1.0)
        carry = carry.at[rep].set(
            (base - 0.01 * g).astype(carry.dtype), mode="drop"
        )
        return carry, ()

    scan_time("user fused update (shipped)", upd_shipped, table)
    scan_time("user fused update (pre-sorted path)", upd_presorted, table)


if __name__ == "__main__":
    main()
