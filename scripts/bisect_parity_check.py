"""One-off: cross-check the tiled evaluator against raw lax.top_k at full
AmazonBooks scale on a trained fast-mode state, to decide whether the
fast-vs-exact Recall gap seen on 2026-08-19 lives in training or in eval.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from heat_tpu.config import CFConfig
from heat_tpu.data.synthetic import synthetic_click_dataset
from heat_tpu.evaluation.metrics import evaluate_metrics_device, pad_truth
from heat_tpu.train.engine import Engine

METRICS = ["Recall(k=20)", "Recall(k=50)", "NDCG(k=50)"]


def main():
    train, test = synthetic_click_dataset(
        num_users=52_643, num_items=91_599, max_his=100, seed=7
    )
    cfg = CFConfig(
        emb_dim=64, num_negs=16, max_his=100, batch_size=8192,
        l_r=0.01, clip_val=1.0, milestones=[10], seed=2022,
        metrics=METRICS, compute_dtype="bfloat16", param_dtype="bfloat16",
        neg_sampler=1, tile_size=512, refresh_interval=8192,
        his_refresh="subepoch",
    )
    eng = Engine(cfg, train, test)
    for _ in range(5):
        eng.train_one_epoch()

    # Path A: the engine's own evaluator.
    m_engine = eng.evaluate()
    print("engine.evaluate():", {k: round(v, 4) for k, v in m_engine.items()})

    # Path B: raw masked scores + lax.top_k per tile, same metric kernel.
    # NOTE: the evaluator ranks by DOT (reference evaluate0 semantics:
    # plain GEMM, engine.cpp:388-400); set NORMALIZE=True to measure the
    # cosine ranking of the same state instead.
    import os

    normalize = os.environ.get("NORMALIZE", "0") == "1"
    ue = eng.state.user_emb[: cfg.num_users].astype(jnp.float32)
    ie = eng.state.item_emb[: cfg.num_items].astype(jnp.float32)
    if normalize:
        ue = ue / jnp.linalg.norm(ue, axis=1, keepdims=True)
        ie = ie / jnp.linalg.norm(ie, axis=1, keepdims=True)

    # train mask on host (exactly the reference's -inf masking)
    pairs = np.asarray(train.pairs)
    U, I = cfg.num_users, cfg.num_items
    k = 50
    tile = 2048

    truth, lengths = pad_truth(
        [np.asarray(u, np.int64) for u in test.user_items]
    )
    truth, lengths = jnp.asarray(truth), jnp.asarray(lengths)

    @jax.jit
    def tile_topk(u_rows, mask_rows):
        s = u_rows @ ie.T
        s = jnp.where(mask_rows, -jnp.inf, s)
        _, ids = jax.lax.top_k(s, k)
        return ids

    ids_all = np.zeros((U, k), np.int32)
    # Build per-tile boolean masks on host (slow but unambiguous).
    by_user = [[] for _ in range(U)]
    for u, i in pairs:
        by_user[u].append(i)
    for t0 in range(0, U, tile):
        t1 = min(t0 + tile, U)
        m = np.zeros((t1 - t0, I), bool)
        for r in range(t0, t1):
            m[r - t0, by_user[r]] = True
        ids = tile_topk(ue[t0:t1], jnp.asarray(m))
        ids_all[t0:t1] = np.asarray(ids)

    m_raw = evaluate_metrics_device(
        METRICS, jnp.asarray(ids_all), truth, lengths
    )
    m_raw = {k2: float(v) for k2, v in m_raw.items()}
    print("raw lax.top_k path :", {k2: round(v, 4) for k2, v in m_raw.items()})


if __name__ == "__main__":
    main()
