"""Benchmark: AmazonBooks-scale epoch on one TPU chip.

Reference baseline (BASELINE.md): HEAT trains one AmazonBooks MF_CCL epoch
(52,643 users x 91,599 items, d=64, 16 negatives, max_his=100, 2.38M
interactions) in ~245 s on an 8-thread CPU. This benchmark runs the same
workload shape through the jitted epoch scan on the available accelerator
and reports epoch time; vs_baseline is the speedup over 245 s.

Prints exactly one JSON line:
  {"metric": "amazonbooks_epoch_time", "value": <s>, "unit": "s",
   "vs_baseline": <speedup>, ...extras}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from heat_tpu.config import CFConfig
from heat_tpu.models.state import init_train_state
from heat_tpu.train.engine import _permute_batches
from heat_tpu.train.samplers import init_sampler_state
from heat_tpu.train.train_step import make_epoch_fn

BASELINE_EPOCH_S = 245.0

# AmazonBooks MF_CCL geometry (README Step 6 / paper section 5.1; config at
# cf/benchmarks/AmazonBooks/MF_CCL/configs/config0.yaml).
NUM_USERS = 52_643
NUM_ITEMS = 91_599
TRAIN_SIZE = 2_380_730
EMB_DIM = 64
NUM_NEGS = 16
MAX_HIS = 100
BATCH = 8192


def main() -> None:
    cfg = CFConfig(
        emb_dim=EMB_DIM,
        num_users=NUM_USERS,
        num_items=NUM_ITEMS,
        train_size=TRAIN_SIZE,
        max_his=MAX_HIS,
        num_negs=NUM_NEGS,
        batch_size=BATCH,
        l_r=0.01,
        clip_val=1.0,
        milestones=[10],
        seed=2022,
    )
    key = jax.random.key(cfg.seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    state = init_train_state(cfg, k1)
    sampler_state = init_sampler_state(cfg, k2)
    pairs = jnp.stack(
        [
            jax.random.randint(k3, (TRAIN_SIZE,), 0, NUM_USERS, dtype=jnp.int32),
            jax.random.randint(k4, (TRAIN_SIZE,), 0, NUM_ITEMS, dtype=jnp.int32),
        ],
        axis=1,
    )
    his_items = jax.random.randint(
        k3, (NUM_USERS, MAX_HIS), 0, NUM_ITEMS, dtype=jnp.int32
    )
    his_masks = jnp.full((NUM_USERS,), MAX_HIS, jnp.int32)

    num_batches = -(-TRAIN_SIZE // BATCH)
    epoch_fn = make_epoch_fn(cfg)

    def run_epoch(state, sampler_state, seed):
        users, pos, weight = _permute_batches(
            jax.random.key(seed), pairs, num_batches, BATCH
        )
        state, sampler_state, loss = epoch_fn(
            state, sampler_state, jax.random.key(seed + 1),
            users, pos, weight, his_items, his_masks,
        )
        # float() forces a host transfer: on the axon relay platform
        # block_until_ready alone returns before execution completes.
        return state, sampler_state, float(loss)

    # Warmup (compile).
    state, sampler_state, _ = run_epoch(state, sampler_state, 0)

    times = []
    for rep in range(1, 4):
        t0 = time.perf_counter()
        state, sampler_state, loss = run_epoch(state, sampler_state, rep)
        times.append(time.perf_counter() - t0)

    epoch_s = float(np.median(times))
    result = {
        "metric": "amazonbooks_epoch_time",
        "value": round(epoch_s, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_EPOCH_S / epoch_s, 2),
        "interactions_per_sec": round(TRAIN_SIZE / epoch_s),
        "device": str(jax.devices()[0].platform),
        "times": [round(t, 4) for t in times],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
