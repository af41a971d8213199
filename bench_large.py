"""Production-scale single-chip benchmark: the huge-table code path.

BASELINE.json's config 5 (100M users x 10M items, d=128) needs a multi-host
mesh for the f32 footprint alone; tests validate that scale abstractly
(tests/test_large_scale.py) and the sharding on a virtual mesh. This
benchmark runs the SAME code path — tables above
``scatter.DENSE_ROWS_THRESHOLD`` rows take the sort-dedup row updates
instead of the dense-accumulator pass — at the largest geometry that fits
one 16 GB v5e chip, so the path is exercised on real hardware, not just
traced:

    16M users x 6M items, d=64, bf16 tables, 40M interactions,
    tile negative sampler + per-epoch cached history means,
    emb_pad=128 physical row width (see below).

Physical row width (CFConfig.emb_pad): half-lane (N, 64) bf16 rows
latency-serialize — row scatters cost ~180 ns/row and every d-wide pass
pays the fractional-sublane layout. Padding the tables to (N, 128) with
zero tails (identical math, tested) measured **36.4 -> 11.8 s/epoch
(3.08x, 3.39M interactions/s)** on this geometry, at the price of real
HBM bytes (bf16 is stored compactly at rest: 128 B/row at width 64,
256 B at width 128 — the at-rest lane-padding assumption in earlier
rounds was wrong for bf16).

HBM budget at width 128: user 4.1 GB + pooled means 4.1 GB + item
1.5 GB + flat history 0.64 GB + pairs 0.32 GB + packed batches 0.5 GB
~= 11.2 GB steady state. The f32 init intermediates must cast to bf16
BEFORE the pad concat (models/state.py) or init alone OOMs.

Prints exactly one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from heat_tpu.config import CFConfig
from heat_tpu.data.datasets import ClickDataset
from heat_tpu.train.engine import Engine
from heat_tpu.train.scatter import DENSE_ROWS_THRESHOLD


def make_dataset(
    users: int, items: int, clicks: int, max_his: int, seed: int = 0
) -> ClickDataset:
    rng = np.random.default_rng(seed)
    pairs = np.stack(
        [rng.integers(0, users, clicks), rng.integers(0, items, clicks)],
        axis=1,
    ).astype(np.int32)
    return ClickDataset(
        pairs=pairs,
        his_items=rng.integers(0, items, (users, max_his)).astype(np.int32),
        masks=np.full((users,), max_his, np.int32),
        num_users=users,
        num_items=items,
        max_his=max_his,
        user_items=[],
    )


def main() -> None:
    from heat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # repeat runs skip the remote re-compiles
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=16_000_000)
    p.add_argument("--items", type=int, default=6_000_000)
    p.add_argument("--clicks", type=int, default=40_000_000)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--negs", type=int, default=16)
    p.add_argument("--max-his", type=int, default=10)
    p.add_argument("--batch", type=int, default=32_768)
    # <= 0 auto-tunes (tile, refresh) per the paper-Alg.-1 analog; at batch
    # 32768 that derives tile 128 — measured 31.0 ms/step vs 38.3 at an
    # over-sized tile 2048 (the (B, T) score/count buffers are the cost).
    p.add_argument("--tile", type=int, default=0)
    p.add_argument("--refresh", type=int, default=32_768)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument(
        "--update-mode", type=str, default="dedup",
        choices=("dedup", "direct"),
        help="dedup = sort/segment-sum per-row combine (clip(combined)); "
        "direct = one per-occurrence scatter-add per table",
    )
    p.add_argument(
        "--aggregator", type=str, default="mean",
        choices=("mean", "user_attention"),
        help="history pooling (round 5: emb_pad composes with the "
        "attention variants; user_attention at the reduced 6Mx4.5M "
        "geometry measured 3.23 s with emb_pad=128 vs 5.28 half-lane. "
        "self_attention needs his_refresh=step — not this harness's "
        "cached-pools shape)",
    )
    p.add_argument(
        "--emb-pad", type=int, default=128,
        help="physical minor width of the tables (CFConfig.emb_pad): "
        "2.2x faster to row-scatter at 16M-row tables than half-lane "
        "(N, 64) rows, at the price of doubled at-rest table bytes "
        "(scripts/profile_lane_width.py); 0 disables",
    )
    args = p.parse_args()

    dataset = make_dataset(
        args.users, args.items, args.clicks, args.max_his
    )
    cfg = CFConfig(
        emb_dim=args.dim,
        num_negs=args.negs,
        max_his=args.max_his,
        batch_size=args.batch,
        l_r=0.01,
        clip_val=1.0,
        milestones=[10],
        seed=2022,
        neg_sampler=1,
        tile_size=args.tile,
        refresh_interval=args.refresh,
        his_refresh="subepoch",
        compute_dtype="bfloat16",
        param_dtype="bfloat16",
        update_mode=args.update_mode,
        emb_pad=args.emb_pad if args.emb_pad > args.dim else 0,
        aggregator=args.aggregator,
    )
    engine = Engine(cfg, dataset)
    sorted_path = args.update_mode == "dedup" and (
        args.users > DENSE_ROWS_THRESHOLD
        and args.items > DENSE_ROWS_THRESHOLD
    )

    loss0 = engine.train_one_epoch()  # compile + warmup
    times = []
    losses = [loss0]
    for _ in range(args.reps):
        t0 = time.perf_counter()
        losses.append(engine.train_one_epoch())
        times.append(time.perf_counter() - t0)
    epoch_s = float(np.median(times))

    import jax

    # Roofline fields (VERDICT r2 item 3): modeled algorithmically-
    # necessary HBM traffic (table rows gathered/updated + the per-epoch
    # pooled-means build; fused intermediates excluded) and the per-row
    # issue counts that actually bound this geometry — row scatters/
    # gathers here are latency-serialized (~100-200 ns/row at 16M-row
    # tables, scripts/profile_large.py), so GB/s vs the 819 GB/s peak is
    # context, not the bound.
    tile = engine.cfg.tile_size
    d = args.dim
    elem = 2  # bf16
    nb = -(-args.clicks // args.batch)
    b = args.batch
    pools_bytes = args.users * args.max_his * d * elem + args.users * d * elem
    per_step_bytes = (
        3 * b * d * elem            # user + means + pos gathers
        + tile * d * elem           # tile row gather
        + 2 * 2 * b * d * elem      # user rows: fused writeback+update r+w
        + 2 * (b + tile) * d * elem  # item rows: r+w
        + b * 4 * 3 + b * args.negs * 4
    )
    hbm_gb = (pools_bytes + nb * per_step_bytes) / 1e9
    rows_scattered = nb * (b + b + tile)   # user scatter + item scatter
    rows_gathered = nb * (3 * b + tile) + args.users * args.max_his
    result = {
        "metric": "large_scale_epoch_time",
        "value": round(epoch_s, 3),
        "unit": "s",
        "vs_baseline": None,  # no reference number exists at this scale
        "interactions_per_sec": round(args.clicks / epoch_s),
        "users": args.users,
        "items": args.items,
        "clicks": args.clicks,
        "emb_dim": args.dim,
        "sorted_dedup_path": sorted_path,
        "update_mode": args.update_mode,
        "losses": [round(l, 4) for l in losses],
        "hbm_gb_modeled": round(hbm_gb, 2),
        "hbm_gbps": round(hbm_gb / epoch_s, 1),
        "hbm_peak_frac": round(hbm_gb / epoch_s / 819.0, 4),
        "rows_scattered": rows_scattered,
        "rows_gathered": rows_gathered,
        "scatter_ns_per_row_budget": round(
            epoch_s * 1e9 / max(1, rows_scattered), 1
        ),
        "device": str(jax.devices()[0].platform),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
