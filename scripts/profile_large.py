"""Ablation profiling of the huge-table (sort-dedup) step on the real chip.

bench_large (16M users x 6M items, d=64, bf16 tables, batch 32768, tile
2048) measures ~43 ms/step; this script attributes it. Measurement rules
from the verify skill: everything runs inside one lax.scan with
per-iteration keys threaded through (XLA hoists loop-invariant work), and
timing syncs force a host transfer (axon block_until_ready returns early).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from heat_tpu.config import CFConfig
from heat_tpu.models.state import init_train_state
from heat_tpu.train.samplers import init_sampler_state
from heat_tpu.train.scatter import (
    apply_row_updates,
    segment_sum_by_id,
)
from heat_tpu.train.train_step import Batch, train_step


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=16_000_000)
    p.add_argument("--items", type=int, default=6_000_000)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--negs", type=int, default=16)
    p.add_argument("--batch", type=int, default=32_768)
    p.add_argument("--tile", type=int, default=2048)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--emb-pad", type=int, default=128,
                   help="physical table width (0 disables; see CFConfig)")
    args = p.parse_args()

    cfg = CFConfig(
        emb_dim=args.dim,
        num_users=args.users,
        num_items=args.items,
        max_his=10,
        num_negs=args.negs,
        batch_size=args.batch,
        l_r=0.01,
        clip_val=1.0,
        neg_sampler=1,
        tile_size=args.tile,
        refresh_interval=args.batch,
        his_refresh="subepoch",
        compute_dtype="bfloat16",
        param_dtype="bfloat16",
        emb_pad=args.emb_pad if args.emb_pad > args.dim else 0,
    )
    key = jax.random.key(0)
    B, K, T = args.batch, args.negs, args.tile
    W = args.emb_pad if args.emb_pad > args.dim else args.dim  # physical width
    M = B + T  # item-update ids per step (pos + tile)

    def fresh_state():
        return init_train_state(cfg, key)

    def scan_time(name, body, carry_fn):
        # Donate the carry: tables ride in it, and in+out copies of a
        # multi-GB carry OOM the chip. Each run gets fresh arrays (the
        # previous run's were consumed by donation).
        fn = jax.jit(
            lambda c, ks: jax.lax.scan(body, c, ks), donate_argnums=0
        )
        keys = jax.random.split(jax.random.key(1), args.iters)
        out = fn(carry_fn(), keys)  # compile
        _ = float(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32))
        del out
        c2 = carry_fn()
        jax.block_until_ready(c2)
        t0 = time.perf_counter()
        out = fn(c2, keys)
        _ = float(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:38s} {dt * 1e3:8.2f} ms/step")
        del out
        return dt

    def rand_ids(k, n, hi):
        return jax.random.randint(k, (n,), 0, hi, dtype=jnp.int32)

    # --- full train_step (cached means path, the bench_large step)
    def full_body(carry, k):
        st, ss, mns = carry
        ku, kp, ks = jax.random.split(k, 3)
        b = Batch(
            rand_ids(ku, B, cfg.num_users),
            rand_ids(kp, B, cfg.num_items),
            jnp.ones((B,), jnp.float32),
        )
        st, ss, loss = train_step(
            st, ss, ks, b, jnp.zeros((1, 1), jnp.int32), jnp.zeros((1,),
            jnp.int32), cfg, user_means=mns,
        )
        return (st, ss, mns), loss

    # --- sort+segment-sum only (no table touched)
    def seg_body(carry, k):
        ids = rand_ids(k, M, cfg.num_items)
        grads = jnp.full((M, W), 1e-6, jnp.float32)
        rep, summed = segment_sum_by_id(ids, grads, cfg.num_items)
        return carry, summed.ravel()[0] + rep[0]

    # --- item-table sorted update (sort + segment sum + 2 row scatters)
    def item_upd_body(table, k):
        ids = rand_ids(k, M, cfg.num_items)
        grads = jnp.full((M, W), 1e-6, jnp.float32)
        table, _ = apply_row_updates(
            table, ids, grads, lr=jnp.float32(0.01), clip_val=1.0
        )
        return table, ()

    # --- user-table write-back + sorted update
    def user_upd_body(table, k):
        ids = rand_ids(k, B, cfg.num_users)
        rows = jnp.full((B, W), 1e-3, table.dtype)
        table = table.at[ids].set(rows, mode="drop")
        table, _ = apply_row_updates(
            table, ids, rows.astype(jnp.float32),
            lr=jnp.float32(0.01), clip_val=1.0,
        )
        return table, ()

    # --- user-table fused write-back+update (one scatter; the shipped path)
    def user_fused_body(table, k):
        ids = rand_ids(k, B, cfg.num_users)
        rows = jnp.full((B, W), 1e-3, table.dtype)
        table, _ = apply_row_updates(
            table, ids, rows.astype(jnp.float32),
            lr=jnp.float32(0.01), clip_val=1.0, writeback=rows,
        )
        return table, ()

    # --- gathers only (user rows + means rows + pos rows). Tables ride in
    # the carry — closing over them captures gigabytes as constants.
    def gather_body(carry, k):
        ue, me, ie = carry
        ku, kp = jax.random.split(k)
        u = ue[rand_ids(ku, B, cfg.num_users)]
        m = me[rand_ids(ku, B, cfg.num_users)]
        pr = ie[rand_ids(kp, B, cfg.num_items)]
        return carry, (
            u.astype(jnp.float32).ravel()[0]
            + pr.astype(jnp.float32).ravel()[0]
            + m.astype(jnp.float32).ravel()[0]
        )

    scan_time(
        "full step (cached means, tile)",
        full_body,
        lambda: (
            fresh_state(),
            # fresh per call: donation consumes the previous one's buffers
            init_sampler_state(cfg, key),
            jnp.zeros((cfg.num_users, W), jnp.dtype(cfg.param_dtype)),
        ),
    )
    scan_time("segment_sum_by_id (sort+dedup)", seg_body, lambda: 0.0)
    scan_time(
        "item table sorted update",
        item_upd_body,
        lambda: fresh_state().item_emb,
    )
    scan_time(
        "user set + sorted update",
        user_upd_body,
        lambda: fresh_state().user_emb,
    )
    scan_time(
        "user fused writeback+update",
        user_fused_body,
        lambda: fresh_state().user_emb,
    )
    scan_time(
        "gathers (u, means, pos)",
        gather_body,
        lambda: (
            jnp.zeros((cfg.num_users, W), jnp.dtype(cfg.param_dtype)),
            jnp.zeros((cfg.num_users, W), jnp.dtype(cfg.param_dtype)),
            jnp.zeros((cfg.num_items, W), jnp.dtype(cfg.param_dtype)),
        ),
    )


if __name__ == "__main__":
    main()
