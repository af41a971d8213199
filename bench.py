"""Benchmark: AmazonBooks-scale epoch on one TPU chip.

Reference baseline (BASELINE.md): HEAT trains one AmazonBooks MF_CCL epoch
(52,643 users x 91,599 items, d=64, 16 negatives, max_his=100, 2.38M
interactions) in ~245 s on an 8-thread CPU. This benchmark drives the real
Engine on the same workload shape (synthetic interactions; the hot path is
identical) and reports epoch time in two modes:

* headline: RandomTile negative sampler (BASELINE.json's AmazonBooks
  config uses the refresh_interval sampler — HEAT's own flagship
  optimization; here the tile keeps negative gathers/scatters in a T-row
  working set) + per-epoch history-mean caching (cfg.his_refresh=
  "subepoch") + bf16 tables/scoring + direct per-occurrence scatter-add
  updates (accuracy parity at full scale: scripts/accuracy_parity.py,
  plus tests/test_engine.py at small scale);
* exact: uniform sampler + the reference's per-step history recompute.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

from heat_tpu.config import CFConfig
from heat_tpu.data.datasets import ClickDataset
from heat_tpu.train.engine import Engine

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


def make_dataset(rng: np.random.Generator) -> ClickDataset:
    pairs = np.stack(
        [
            rng.integers(0, NUM_USERS, TRAIN_SIZE),
            rng.integers(0, NUM_ITEMS, TRAIN_SIZE),
        ],
        axis=1,
    ).astype(np.int32)
    his = rng.integers(0, NUM_ITEMS, (NUM_USERS, MAX_HIS)).astype(np.int32)
    masks = np.full((NUM_USERS,), MAX_HIS, np.int32)
    return ClickDataset(
        pairs=pairs,
        his_items=his,
        masks=masks,
        num_users=NUM_USERS,
        num_items=NUM_ITEMS,
        max_his=MAX_HIS,
        user_items=[],
    )


def time_epochs(
    his_refresh: str,
    dataset: ClickDataset,
    reps: int = 3,
    fused: int = 0,
    **cfg_kw,
):
    """Median epoch seconds. fused=0 times per-epoch train_one_epoch calls
    (one dispatch per epoch, the reference's driver-loop granularity);
    fused=E times train_epochs(E)/E — E epochs in ONE device program."""
    cfg = CFConfig(
        emb_dim=EMB_DIM,
        num_negs=NUM_NEGS,
        max_his=MAX_HIS,
        batch_size=BATCH,
        l_r=0.01,
        clip_val=1.0,
        milestones=[10],
        seed=2022,
        his_refresh=his_refresh,
        **cfg_kw,
    )
    engine = Engine(cfg, dataset)
    if fused:
        engine.train_epochs(fused)  # warmup/compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            engine.train_epochs(fused)
            times.append((time.perf_counter() - t0) / fused)
        return float(np.median(times)), times
    engine.train_one_epoch()  # warmup/compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        engine.train_one_epoch()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), times


def time_eval(dataset: ClickDataset) -> float:
    """Full AmazonBooks-scale ranking eval, end to end: tiled sim GEMM +
    exact top-50 + all-metric evaluation on device (mask and truth tensors
    are uploaded once; only the metric scalars reach the host)."""
    import jax

    from heat_tpu.evaluation.evaluator import TiledEvaluator
    from heat_tpu.evaluation.metrics import (
        evaluate_metrics_device,
        pad_truth,
    )

    k1, k2 = jax.random.split(jax.random.key(1))
    user_emb = jax.random.normal(k1, (NUM_USERS, EMB_DIM))
    item_emb = jax.random.normal(k2, (NUM_ITEMS, EMB_DIM))
    rng = np.random.default_rng(1)
    truth, lengths = pad_truth(
        [rng.integers(0, NUM_ITEMS, 10) for _ in range(NUM_USERS)]
    )
    truth, lengths = jax.numpy.asarray(truth), jax.numpy.asarray(lengths)
    metrics = ["Recall(k=20)", "Recall(k=50)", "NDCG(k=20)", "NDCG(k=50)"]
    ev = TiledEvaluator(dataset.pairs, NUM_USERS)

    def run(exact: bool):
        _, ids = ev.topk(
            user_emb, item_emb, 50, device=True, exact=exact,
            recall_target=0.99,
        )
        return evaluate_metrics_device(metrics, ids, truth, lengths)

    out = []
    for exact in (True, False):
        run(exact)  # compile + mask/truth upload
        t0 = time.perf_counter()
        run(exact)
        out.append(time.perf_counter() - t0)
    return tuple(out)


def main() -> None:
    dataset = make_dataset(np.random.default_rng(0))
    # Headline mode: tile sampler + cached history means + bf16 tables AND
    # bf16 scoring + update_mode="direct" (per-occurrence scatter-add
    # increments, the reference live path's clip-per-sample ordering —
    # drops the f32 accumulator, touched mask, and dense table passes from
    # the update). Accuracy-neutral at this exact scale:
    # scripts/accuracy_parity.py --modes direct:bfloat16:bfloat16,
    # fast:bfloat16:bfloat16 measures Recall@20 0.0124 / 0.0124 and
    # NDCG@50 0.0187 / 0.0188 on the planted-cluster check (2026-08-19
    # runs) — inside the paper's own +-0.0003 parity bar (section 5.4);
    # f32-accumulator fast vs exact was measured earlier at 0.0126/0.0126.
    direct_s, direct_times = time_epochs(
        "subepoch", dataset, neg_sampler=1, tile_size=512,
        refresh_interval=8192, compute_dtype="bfloat16",
        param_dtype="bfloat16", update_mode="direct",
    )
    # Headline config, 5 epochs per device program (Engine.train_epochs):
    # amortizes the fixed per-dispatch cost + the separately-dispatched
    # shuffle (~1.07x at this scale) — how the CLI trains between evals
    # with --fused-epochs.
    fused_s, _ = time_epochs(
        "subepoch", dataset, reps=2, fused=5, neg_sampler=1, tile_size=512,
        refresh_interval=8192, compute_dtype="bfloat16",
        param_dtype="bfloat16", update_mode="direct",
    )
    # Accumulator update mode (f32 grad accumulation + dense apply pass):
    # the previous headline, kept as the update-path A/B.
    fast_s, fast_times = time_epochs(
        "subepoch", dataset, neg_sampler=1, tile_size=512,
        refresh_interval=8192, compute_dtype="bfloat16",
        param_dtype="bfloat16",
    )
    fastf32_s, _ = time_epochs(
        "subepoch", dataset, reps=2, neg_sampler=1, tile_size=512,
        refresh_interval=8192,
    )
    # Throughput mode: batch 16384 with tile refresh retuned to the batch
    # (the paper's Alg. 1 retunes tile/refresh per hardware). At lr 0.02
    # (linear batch scaling) the planted-cluster check puts it inside the
    # +-0.0003 Recall@20 parity bar too (0.0124 vs 0.0125 at batch 8192);
    # reported separately because the headline keeps the reference's exact
    # hyperparameters.
    # (direct-mode parity holds at 16k/lr 0.02 too: Recall@20 0.0123 vs
    # 0.0125, NDCG@50 0.0188 vs 0.0188 — 2026-08-19 run.)
    global BATCH
    BATCH = 16384
    fast16k_s, _ = time_epochs(
        "subepoch", dataset, reps=2, neg_sampler=1, tile_size=512,
        refresh_interval=16384, compute_dtype="bfloat16",
        param_dtype="bfloat16", update_mode="direct",
    )
    BATCH = 8192
    # Compute-heavy variant (BASELINE.json config 4): d=256, 64 negatives —
    # scoring-bound rather than update-bound. Same dataset geometry; the
    # d=256 tables re-initialize inside the engine.
    global EMB_DIM, NUM_NEGS
    EMB_DIM, NUM_NEGS = 256, 64
    heavy_s, _ = time_epochs(
        "subepoch", dataset, reps=2, neg_sampler=1, tile_size=0,
        compute_dtype="bfloat16", param_dtype="bfloat16",
    )
    EMB_DIM, NUM_NEGS = 64, 16
    exact_s, _ = time_epochs("step", dataset)
    eval_s, eval_approx_s = time_eval(dataset)
    result = {
        "metric": "amazonbooks_epoch_time",
        "value": round(direct_s, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_EPOCH_S / direct_s, 2),
        "interactions_per_sec": round(TRAIN_SIZE / direct_s),
        "fused5_s": round(fused_s, 4),
        "fused5_vs_baseline": round(BASELINE_EPOCH_S / fused_s, 2),
        "accum_s": round(fast_s, 4),
        "accum_vs_baseline": round(BASELINE_EPOCH_S / fast_s, 2),
        "fast_f32_s": round(fastf32_s, 4),
        "exact_mode_s": round(exact_s, 4),
        "exact_vs_baseline": round(BASELINE_EPOCH_S / exact_s, 2),
        "throughput16k_s": round(fast16k_s, 4),
        "throughput16k_vs_baseline": round(BASELINE_EPOCH_S / fast16k_s, 2),
        "heavy_d256_negs64_s": round(heavy_s, 4),
        "eval_topk50_s": round(eval_s, 4),
        "eval_topk50_approx99_s": round(eval_approx_s, 4),
        "times": [round(t, 4) for t in direct_times],
    }
    import jax

    result["device"] = str(jax.devices()[0].platform)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
