"""Exact-mode step decomposition (VERDICT r3 item 7): the ~2 ms/step
non-gather slice (loss/grads/updates) of the shuffled exact row had never
been profiled to its own floor. Measure the step in nested truncations,
in-scan with donated carries per the measurement protocol:

  full      : the real exact train_step (uniform sampler, f32, per-step
              history recompute) — matches bench.py's exact row math
  no_update : stop after grads (sum them) — update slice = full - this
  fwd_only  : forward loss only — grad slice = no_update - this
  gathers   : user/pos/neg/history gathers + fused mean only — score/loss
              slice = fwd_only - this

Also A/Bs the two free levers named in DESIGN.md 6c-bis:
  full_direct : update_mode="direct" (set+add scatters, no dense passes)

Run: python scripts/profile_exact_step.py   (real TPU, ~6 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from heat_tpu.config import CFConfig
from heat_tpu.models.aggregator import (
    aggregate_history,
    history_mean_fused,
)
from heat_tpu.models.state import init_train_state
from heat_tpu.ops.losses import sample_losses
from heat_tpu.ops.similarity import pair_scores
from heat_tpu.train.samplers import init_sampler_state
from heat_tpu.train.train_step import Batch, train_step

U, I, D, H, B, K = 52_643, 91_599, 64, 100, 8192, 16
ITERS = 300


def main() -> None:
    cfg = CFConfig(
        num_users=U, num_items=I, emb_dim=D, max_his=H, num_negs=K,
        batch_size=B, l_r=0.01, clip_val=1.0, seed=2022,
        his_refresh="step",
    )
    cfg_direct = CFConfig(
        num_users=U, num_items=I, emb_dim=D, max_his=H, num_negs=K,
        batch_size=B, l_r=0.01, clip_val=1.0, seed=2022,
        his_refresh="step", update_mode="direct",
    )
    key = jax.random.key(0)
    his_items = jax.random.randint(key, (U, H), 0, I, dtype=jnp.int32)
    his_masks = jnp.full((U,), H, jnp.int32)

    def carry():
        st = init_train_state(cfg, key)
        return st.replace(lr=jnp.asarray(0.01, jnp.float32)), \
            init_sampler_state(cfg, key)

    def batch_of(k):
        ku, kp = jax.random.split(k)
        return Batch(
            jax.random.randint(ku, (B,), 0, U, dtype=jnp.int32),
            jax.random.randint(kp, (B,), 0, I, dtype=jnp.int32),
            jnp.ones((B,), jnp.float32),
        )

    def full_body(cfg_v):
        def body(c, k):
            st, ss = c
            st, ss, loss = train_step(
                st, ss, k, batch_of(k), his_items, his_masks, cfg_v
            )
            return (st, ss), loss
        return body

    def no_update_body(c, k):
        st, ss = c
        b = batch_of(k)
        users, pos, weight = b
        negs = jax.random.randint(k, (B, K), 0, I, dtype=jnp.int32)
        u_rows = st.user_emb[users]
        p_rows = st.item_emb[pos]
        n_rows = st.item_emb[negs]
        his_ids = his_items[users]
        pooled = jax.lax.stop_gradient(
            history_mean_fused(
                st.item_emb, his_ids, his_masks[users], jnp.float32
            )
        )

        def batch_loss(u_rows, p_rows, n_rows, w0):
            u_agg = aggregate_history(u_rows, pooled, w0, cfg.gamma)
            s_up, s_un = pair_scores(
                u_agg, p_rows, n_rows, similarity=cfg.similarity
            )
            return jnp.sum(sample_losses(s_up, s_un, cfg) * weight)

        loss, grads = jax.value_and_grad(
            batch_loss, argnums=(0, 1, 2, 3)
        )(u_rows, p_rows, n_rows, st.w0)
        acc = sum(jnp.sum(g.astype(jnp.float32)) for g in grads)
        return (st, ss), loss + acc

    def fwd_only_body(c, k):
        st, ss = c
        b = batch_of(k)
        users, pos, weight = b
        negs = jax.random.randint(k, (B, K), 0, I, dtype=jnp.int32)
        u_rows = st.user_emb[users]
        p_rows = st.item_emb[pos]
        n_rows = st.item_emb[negs]
        his_ids = his_items[users]
        pooled = history_mean_fused(
            st.item_emb, his_ids, his_masks[users], jnp.float32
        )
        u_agg = aggregate_history(u_rows, pooled, st.w0, cfg.gamma)
        s_up, s_un = pair_scores(
            u_agg, p_rows, n_rows, similarity=cfg.similarity
        )
        return (st, ss), jnp.sum(sample_losses(s_up, s_un, cfg) * weight)

    def gathers_body(c, k):
        st, ss = c
        b = batch_of(k)
        users, pos, _ = b
        negs = jax.random.randint(k, (B, K), 0, I, dtype=jnp.int32)
        u_rows = st.user_emb[users]
        p_rows = st.item_emb[pos]
        n_rows = st.item_emb[negs]
        his_ids = his_items[users]
        pooled = history_mean_fused(
            st.item_emb, his_ids, his_masks[users], jnp.float32
        )
        s = (
            jnp.sum(u_rows) + jnp.sum(p_rows) + jnp.sum(n_rows)
            + jnp.sum(pooled)
        )
        return (st, ss), s

    results = {}
    for name, body in (
        ("full", full_body(cfg)),
        ("full_direct", full_body(cfg_direct)),
        ("no_update", no_update_body),
        ("fwd_only", fwd_only_body),
        ("gathers", gathers_body),
    ):
        fn = jax.jit(
            lambda c, ks, body=body: jax.lax.scan(body, c, ks),
            donate_argnums=(0,),
        )
        keys = jax.random.split(jax.random.key(1), ITERS)
        out = fn(carry(), keys)
        _ = float(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32))
        del out
        c2 = carry()
        t0 = time.perf_counter()
        out = fn(c2, keys)
        _ = float(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        results[name] = dt
        print(f"{name:12s} {dt:7.3f} ms/step")
        del out
    print()
    print(f"update slice (full - no_update):    "
          f"{results['full'] - results['no_update']:7.3f} ms/step")
    print(f"grad slice (no_update - fwd_only):  "
          f"{results['no_update'] - results['fwd_only']:7.3f} ms/step")
    print(f"score/loss slice (fwd - gathers):   "
          f"{results['fwd_only'] - results['gathers']:7.3f} ms/step")
    print(f"gather+mean slice:                  "
          f"{results['gathers']:7.3f} ms/step")
    print(f"direct-update delta (full_direct - full): "
          f"{results['full_direct'] - results['full']:7.3f} ms/step")
    nsteps = -(-2_380_730 // B)
    print(f"\nimplied epoch: full {results['full']*nsteps/1e3:.3f} s, "
          f"direct {results['full_direct']*nsteps/1e3:.3f} s "
          f"({nsteps} steps)")


if __name__ == "__main__":
    main()
