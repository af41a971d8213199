"""Ablation profiling of the HEADLINE tile-path train step on the real chip.

The headline bench (bench.py fast mode) runs: tile negative sampler +
cached per-epoch history means + bf16 tables/scoring with f32 update
accumulation, with the whole epoch as ONE jitted lax.scan. Per-call
dispatch on this box is ~1 ms (tunneled device), so ablation variants must
also run INSIDE one scan: each variant scans N repetitions of its slice in
a single device program, and the cost is (total - empty_scan) / N.

scripts/profile_step.py covers the exact/uniform path; this script
attributes time inside the tile path:

  sampling (RNG + tile refresh) -> gathers (u, pos, means, tile rows)
  -> draw-multiplicity counts (the (B, K, T) compare-reduce)
  -> forward+grads (table updates dead-coded) -> full step.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_tile_step.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from heat_tpu.config import CFConfig
from heat_tpu.models.state import init_train_state
from heat_tpu.train.samplers import init_sampler_state, sample_negatives
from heat_tpu.train.train_step import Batch, train_step

CFG = CFConfig(
    emb_dim=64,
    num_users=52_643,
    num_items=91_599,
    max_his=100,
    num_negs=16,
    batch_size=8192,
    l_r=0.01,
    clip_val=1.0,
    neg_sampler=1,
    tile_size=512,
    refresh_interval=8192,
    his_refresh="subepoch",
    compute_dtype="bfloat16",
    param_dtype="bfloat16",
    seed=2022,
)
B = CFG.batch_size
T = CFG.tile_size
N = 100   # scan length per variant
REPS = 3


def scan_time(name, make_body, init_carry, baseline=0.0):
    """Scan `body` N times inside one jit; return per-iteration seconds."""

    @jax.jit
    def prog(carry, keys):
        carry, outs = jax.lax.scan(make_body, carry, keys)
        return carry, outs

    keys = jax.random.split(jax.random.key(1), N)
    carry, outs = prog(init_carry, keys)   # compile
    _ = float(jax.tree.leaves(outs)[0].ravel()[0])
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        carry, outs = prog(init_carry, keys)
        _ = float(jax.tree.leaves(outs)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"{name:44s} {best*1e3:8.3f} ms/iter  (-base {max(0.0, best-baseline)*1e3:7.3f})")
    return best


def main():
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    state = init_train_state(CFG, ks[0])
    sampler_state = init_sampler_state(CFG, ks[1])
    users = jax.random.randint(ks[2], (B,), 0, CFG.num_users, dtype=jnp.int32)
    pos = jax.random.randint(ks[3], (B,), 0, CFG.num_items, dtype=jnp.int32)
    weight = jnp.ones((B,), jnp.float32)
    user_means = jnp.zeros_like(state.user_emb)
    his_items = jax.random.randint(
        ks[4], (CFG.num_users * 4,), 0, CFG.num_items, dtype=jnp.int32
    )
    his_masks = jnp.full((CFG.num_users,), 4, jnp.int32)

    def body_empty(carry, k):
        return carry, jnp.float32(0)

    base = scan_time("empty scan", body_empty, sampler_state)

    def body_sample(ss, k):
        s, ss = sample_negatives(k, ss, pos, CFG)
        return ss, jnp.sum(s.tile) + jnp.sum(s.tile_idx[:, 0])

    scan_time("sampling (RNG + tile refresh)", body_sample, sampler_state, base)

    def body_gathers(ss, k):
        s, ss = sample_negatives(k, ss, pos, CFG)
        u = state.user_emb[users].astype(jnp.bfloat16)
        p = state.item_emb[pos].astype(jnp.bfloat16)
        n = state.item_emb[s.tile].astype(jnp.bfloat16)
        m = user_means[users].astype(jnp.bfloat16)
        out = (
            jnp.sum(u, dtype=jnp.float32)
            + jnp.sum(p, dtype=jnp.float32)
            + jnp.sum(n, dtype=jnp.float32)
            + jnp.sum(m, dtype=jnp.float32)
        )
        return ss, out

    scan_time("sampling + 4 gathers", body_gathers, sampler_state, base)

    def body_counts(ss, k):
        s, ss = sample_negatives(k, ss, pos, CFG)
        t_iota = jnp.arange(T, dtype=jnp.int32)
        counts = jnp.sum(
            (s.tile_idx[:, :, None] == t_iota).astype(jnp.float32), axis=1
        )
        return ss, jnp.sum(counts)

    scan_time("sampling + counts compare-reduce", body_counts, sampler_state, base)

    def body_lossgrad(carry, k):
        st, ss = carry
        new_st, ss, loss = train_step(
            st, ss, k, Batch(users, pos, weight), his_items, his_masks,
            CFG, user_means=user_means,
        )
        # Depend only on loss and w0: the big table scatters are dead code,
        # and the ORIGINAL state threads through the carry (no update cost).
        return (st, ss), loss + jnp.sum(new_st.w0.astype(jnp.float32))

    scan_time(
        "loss+grads+w0 (table updates DCE'd)",
        body_lossgrad,
        (state, sampler_state),
        base,
    )

    def body_full(carry, k):
        st, ss = carry
        st, ss, loss = train_step(
            st, ss, k, Batch(users, pos, weight), his_items, his_masks,
            CFG, user_means=user_means,
        )
        return (st, ss), loss

    scan_time("full step", body_full, (state, sampler_state), base)


def update_breakdown():
    """Isolate the update-stage components of the tile step."""
    import heat_tpu.train.scatter as sc

    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    state = init_train_state(CFG, ks[0])
    users = jax.random.randint(ks[2], (B,), 0, CFG.num_users, dtype=jnp.int32)
    pos = jax.random.randint(ks[3], (B,), 0, CFG.num_items, dtype=jnp.int32)
    tile = jax.random.randint(ks[5], (T,), 0, CFG.num_items, dtype=jnp.int32)
    g_u = jax.random.normal(ks[6], (B, CFG.emb_dim), jnp.float32) * 1e-3
    g_p = jax.random.normal(ks[7], (B, CFG.emb_dim), jnp.float32) * 1e-3
    g_t = jax.random.normal(ks[4], (T, CFG.emb_dim), jnp.float32) * 1e-3
    wb = jax.random.normal(ks[1], (B, CFG.emb_dim), jnp.bfloat16)
    lr = jnp.float32(0.01)
    item_ids = jnp.concatenate([pos, tile])
    item_grads = jnp.concatenate([g_p, g_t])

    def body_empty(carry, k):
        return carry, jnp.float32(0)

    base = scan_time("empty scan (tables carried)", body_empty, (state.user_emb, state.item_emb))

    def body_user(carry, k):
        ue, ie = carry
        ue, _ = sc.apply_row_updates(
            ue, users, g_u, lr=lr, clip_val=1.0, writeback=wb
        )
        return (ue, ie), jnp.float32(0)

    scan_time("user update (writeback set + dense)", body_user, (state.user_emb, state.item_emb), base)

    def body_user_nowb(carry, k):
        ue, ie = carry
        ue, _ = sc.apply_row_updates(ue, users, g_u, lr=lr, clip_val=1.0)
        return (ue, ie), jnp.float32(0)

    scan_time("user update (dense only, no writeback)", body_user_nowb, (state.user_emb, state.item_emb), base)

    def body_item(carry, k):
        ue, ie = carry
        ie, _ = sc.apply_row_updates(ie, item_ids, item_grads, lr=lr, clip_val=1.0)
        return (ue, ie), jnp.float32(0)

    scan_time("item update (dense, B+T ids)", body_item, (state.user_emb, state.item_emb), base)

    def body_item_sorted(carry, k):
        ue, ie = carry
        ie, _ = sc._apply_row_updates_sorted(
            ie, item_ids, item_grads, lr=lr, clip_val=1.0, gacc=None,
            decay=1.0, l2=0.0,
        )
        return (ue, ie), jnp.float32(0)

    scan_time("item update (sorted, B+T ids)", body_item_sorted, (state.user_emb, state.item_emb), base)

    def body_user_sorted(carry, k):
        ue, ie = carry
        ue, _ = sc._apply_row_updates_sorted(
            ue, users, g_u, lr=lr, clip_val=1.0, gacc=None, decay=1.0,
            l2=0.0, writeback=wb,
        )
        return (ue, ie), jnp.float32(0)

    scan_time("user update (sorted fused writeback)", body_user_sorted, (state.user_emb, state.item_emb), base)

    # counts dtype experiment
    tile_idx = jax.random.randint(ks[5], (B, CFG.num_negs), 0, T, dtype=jnp.int32)

    def body_counts_f32(carry, k):
        t_iota = jnp.arange(T, dtype=jnp.int32)
        counts = jnp.sum((tile_idx[:, :, None] == t_iota).astype(jnp.float32), axis=1)
        return carry, jnp.sum(counts)

    def body_counts_bf16(carry, k):
        t_iota = jnp.arange(T, dtype=jnp.int32)
        counts = jnp.sum((tile_idx[:, :, None] == t_iota).astype(jnp.bfloat16), axis=1)
        return carry, jnp.sum(counts.astype(jnp.float32))

    def body_counts_int8(carry, k):
        t_iota = jnp.arange(T, dtype=jnp.int32)
        counts = jnp.sum((tile_idx[:, :, None] == t_iota).astype(jnp.int8), axis=1)
        return carry, jnp.sum(counts.astype(jnp.float32))

    base2 = scan_time("empty scan (no tables)", body_empty, (jnp.float32(0), jnp.float32(0)))
    scan_time("counts f32 compare-reduce", body_counts_f32, (jnp.float32(0), jnp.float32(0)), base2)
    scan_time("counts bf16 compare-reduce", body_counts_bf16, (jnp.float32(0), jnp.float32(0)), base2)
    scan_time("counts int8 compare-reduce", body_counts_int8, (jnp.float32(0), jnp.float32(0)), base2)


if __name__ == "__main__":
    import sys
    if "--updates" in sys.argv:
        update_breakdown()
    else:
        main()
