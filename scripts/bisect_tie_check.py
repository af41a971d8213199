"""Isolate tie-breaking: same trained bf16 state, same TiledEvaluator
masking/tiling — exact_topk_2phase vs plain lax.top_k as the selector.
Also counts per-row score ties at the k-th boundary.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import heat_tpu.evaluation.evaluator as EV
from heat_tpu.config import CFConfig
from heat_tpu.data.synthetic import synthetic_click_dataset
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

    m1 = eng.evaluate()
    print("2phase selector :", {k: round(v, 4) for k, v in m1.items()})

    # Swap the selector for plain lax.top_k (same masking, same tiling).
    orig = EV.exact_topk_2phase
    EV.exact_topk_2phase = lambda sim, k: jax.lax.top_k(sim, k)
    EV._topk_all_tiles.clear_cache()
    eng._evaluator = None
    m2 = eng.evaluate()
    print("lax.top_k sel.  :", {k: round(v, 4) for k, v in m2.items()})
    EV.exact_topk_2phase = orig

    # Tie census at the top-50 boundary on a sample of user tiles.
    ue = eng.state.user_emb.astype(jnp.float32)
    ie = eng.state.item_emb.astype(jnp.float32)

    @jax.jit
    def boundary_ties(u_rows):
        s = u_rows @ ie.T
        v, _ = jax.lax.top_k(s, 50)
        kth = v[:, -1:]
        return jnp.sum(s == kth, axis=1)  # items tying the k-th score

    ties = np.asarray(boundary_ties(ue[:2048]))
    print(
        "boundary ties per row: median",
        int(np.median(ties)),
        "p90", int(np.percentile(ties, 90)),
        "max", int(ties.max()),
    )


if __name__ == "__main__":
    main()
