"""Ablation profiling of the train step on the real chip.

Times jitted variants of the AmazonBooks-scale step to attribute cost:
gathers, aggregation, loss/grad, dedup sort, scatters. The axon platform's
block_until_ready is not a sync point, so every timing forces a host
transfer of a scalar that depends on the variant's outputs.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from heat_tpu.config import CFConfig
from heat_tpu.models.aggregator import aggregate_history, history_mean
from heat_tpu.models.state import init_train_state
from heat_tpu.ops.losses import sample_losses
from heat_tpu.ops.similarity import pair_scores
from heat_tpu.train.scatter import apply_row_updates, segment_sum_by_id

CFG = CFConfig(
    emb_dim=64,
    num_users=52_643,
    num_items=91_599,
    max_his=100,
    num_negs=16,
    batch_size=8192,
    l_r=0.01,
    clip_val=1.0,
)
B = CFG.batch_size
STEPS = 20


def timeit(name, fn, *args):
    out = fn(*args)  # compile
    _ = float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1][0]))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1][0]))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:34s} {dt*1e3:8.3f} ms/step")
    return dt


def main():
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    state = init_train_state(CFG, ks[0])
    user_emb, item_emb, w0 = state.user_emb, state.item_emb, state.w0
    his_items = jax.random.randint(
        ks[1], (CFG.num_users, CFG.max_his), 0, CFG.num_items, dtype=jnp.int32
    )
    his_masks = jnp.full((CFG.num_users,), CFG.max_his, jnp.int32)
    users = jax.random.randint(ks[2], (B,), 0, CFG.num_users, dtype=jnp.int32)
    pos = jax.random.randint(ks[3], (B,), 0, CFG.num_items, dtype=jnp.int32)
    negs = jax.random.randint(
        ks[4], (B, CFG.num_negs), 0, CFG.num_items, dtype=jnp.int32
    )
    weight = jnp.ones((B,), jnp.float32)

    # --- component: gathers only
    @jax.jit
    def gathers(user_emb, item_emb):
        u = user_emb[users]
        p = item_emb[pos]
        n = item_emb[negs]
        h = item_emb[his_items[users]]
        return u.sum() + p.sum() + n.sum() + h.sum()

    # --- component: forward only (loss)
    @jax.jit
    def forward(user_emb, item_emb, w0):
        u = user_emb[users]
        p = item_emb[pos]
        n = item_emb[negs]
        h = jax.lax.stop_gradient(item_emb[his_items[users]])
        means = history_mean(h, his_masks[users])
        u_agg = aggregate_history(u, means, w0, CFG.gamma)
        s_up, s_un = pair_scores(u_agg, p, n)
        return jnp.sum(sample_losses(s_up, s_un, CFG) * weight)

    # --- component: forward + grads (no updates)
    @jax.jit
    def fwd_bwd(user_emb, item_emb, w0):
        def loss_fn(ue, ie, w):
            return forward.__wrapped__(ue, ie, w)

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
            user_emb, item_emb, w0
        )
        return loss, grads[2]

    # --- component: dedup sort alone (item-sized)
    ids_flat = jnp.concatenate([pos, negs.reshape(-1)])
    grads_flat = jax.random.normal(
        ks[5], (ids_flat.shape[0], CFG.emb_dim), jnp.float32
    )

    @jax.jit
    def dedup(ids, grads):
        rep, summed = segment_sum_by_id(ids, grads, CFG.num_items)
        return summed.sum() + rep.sum()

    # --- component: full scatter update path (item table)
    @jax.jit
    def scatter_update(item_emb, ids, grads):
        t, _ = apply_row_updates(
            item_emb, ids, grads, lr=jnp.float32(0.01), clip_val=1.0
        )
        return t

    # --- full step, via grads w.r.t. gathered rows (production shape)
    @jax.jit
    def full_step(user_emb, item_emb, w0):
        u = user_emb[users]
        p = item_emb[pos]
        n = item_emb[negs]
        h = jax.lax.stop_gradient(item_emb[his_items[users]])
        means = history_mean(h, his_masks[users])

        def loss_fn(u, p, n, w0):
            u_agg = aggregate_history(u, means, w0, CFG.gamma)
            s_up, s_un = pair_scores(u_agg, p, n)
            return jnp.sum(sample_losses(s_up, s_un, CFG) * weight), u_agg

        (loss, u_agg), (gu, gp, gn, gw) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3), has_aux=True
        )(u, p, n, w0)
        user_emb = user_emb.at[users].set(u_agg)
        user_emb, _ = apply_row_updates(
            user_emb, users, gu, lr=jnp.float32(0.01), clip_val=1.0
        )
        ids = jnp.concatenate([pos, negs.reshape(-1)])
        gs = jnp.concatenate([gp, gn.reshape(-1, CFG.emb_dim)])
        item_emb, _ = apply_row_updates(
            item_emb, ids, gs, lr=jnp.float32(0.01), clip_val=1.0
        )
        return user_emb, item_emb, w0 - 0.01 * gw

    timeit("gathers(u,p,n,his)", gathers, user_emb, item_emb)
    timeit("forward(loss)", forward, user_emb, item_emb, w0)
    timeit("forward+grads", fwd_bwd, user_emb, item_emb, w0)
    timeit("dedup sort+segsum (139k ids)", dedup, ids_flat, grads_flat)
    timeit("scatter_update(item table)", scatter_update, item_emb, ids_flat, grads_flat)
    timeit("full step", full_step, user_emb, item_emb, w0)


if __name__ == "__main__":
    main()
