"""Serving latency at AmazonBooks scale on the real chip.

Measures Recommender.recommend() end to end — request ids in, ranked
top-k ids on host out — for a span of request batch sizes, plus the
cold-start path. Every call includes the host->device id upload and the
(B, k) id download (the realistic serving boundary), so the small-batch
numbers are dominated by the fixed dispatch/transfer cost of this box's
tunnel (~25-40 ms per call); the large-batch numbers show the marginal
per-user cost.

Run: python scripts/profile_serving.py  (real TPU, ~3 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from heat_tpu.config import CFConfig
from heat_tpu.serving import Recommender
from heat_tpu.models.state import init_train_state

import jax

U, I, D, H = 52_643, 91_599, 64, 100


def main() -> None:
    cfg = CFConfig(
        emb_dim=D, num_users=U, num_items=I, max_his=H, num_negs=16,
        batch_size=8192, seed=0,
    )
    state = init_train_state(cfg, jax.random.key(0))
    rng = np.random.default_rng(1)
    pairs = np.stack(
        [rng.integers(0, U, 2_000_000), rng.integers(0, I, 2_000_000)], 1
    ).astype(np.int32)
    his = rng.integers(0, I, (U, H)).astype(np.int32)
    masks = np.full((U,), H, np.int32)
    rec = Recommender(
        state, cfg, seen_pairs=pairs, his_items=his, his_masks=masks
    )
    for b in (1, 16, 256, 1024, 8192):
        ids = rng.integers(0, U, b).tolist()
        rec.recommend(ids, k=20)  # compile + mask upload
        reps = 20 if b <= 1024 else 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = rec.recommend(ids, k=20)
        dt = (time.perf_counter() - t0) / reps
        print(
            f"recommend batch={b:5d} k=20: {dt * 1e3:8.2f} ms "
            f"({dt / b * 1e6:8.1f} us/user)"
        )
        assert out.shape == (b, 20)
    hist = [rng.integers(0, I, 30).tolist() for _ in range(256)]
    rec.recommend_cold(hist, k=20)
    t0 = time.perf_counter()
    for _ in range(20):
        rec.recommend_cold(hist, k=20)
    dt = (time.perf_counter() - t0) / 20
    print(f"recommend_cold batch=256 k=20: {dt * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
