"""Scaling-efficiency benchmark: interactions/sec vs device count.

BASELINE.md's north star asks for interactions/sec/chip and scaling
efficiency at 1 chip / 1 host / >=2 hosts. This harness runs the same
workload on growing ("data" x "model") meshes over whatever devices exist
(real chips on a pod slice; virtual CPU devices under
XLA_FLAGS=--xla_force_host_platform_device_count=8 for functional checks)
and reports throughput + parallel efficiency per mesh.

Prints one JSON line:
  {"metric": "scaling_efficiency", "value": <eff at max devices>, ...}
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from heat_tpu.config import CFConfig
from heat_tpu.data.datasets import ClickDataset
from heat_tpu.parallel.mesh import default_mesh_shape, make_mesh
from heat_tpu.train.engine import Engine


def run(
    num_devices: int,
    dataset: ClickDataset,
    cfg_kwargs: dict,
    reps: int = 2,
) -> float:
    cfg = CFConfig(**cfg_kwargs)
    mesh = None
    if num_devices > 1:
        n_data, n_model = default_mesh_shape(num_devices)
        mesh = make_mesh(n_data, n_model, jax.devices()[:num_devices])
    engine = Engine(cfg, dataset, mesh=mesh)
    engine.train_one_epoch()  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        engine.train_one_epoch()
        times.append(time.perf_counter() - t0)
    return dataset.train_size / float(np.median(times))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--users", type=int, default=52_643)
    parser.add_argument("--items", type=int, default=91_599)
    parser.add_argument("--clicks", type=int, default=2_380_730)
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--negs", type=int, default=16)
    parser.add_argument("--max-his", type=int, default=100)
    parser.add_argument("--batch", type=int, default=8192)
    parser.add_argument("--his-refresh", default="subepoch")
    parser.add_argument(
        "--neg-sampler", type=int, default=1,
        help="0 uniform, 1 tile (auto-tuned tile_size)",
    )
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    pairs = np.stack(
        [
            rng.integers(0, args.users, args.clicks),
            rng.integers(0, args.items, args.clicks),
        ],
        axis=1,
    ).astype(np.int32)
    dataset = ClickDataset(
        pairs=pairs,
        his_items=rng.integers(
            0, args.items, (args.users, args.max_his)
        ).astype(np.int32),
        masks=np.full((args.users,), args.max_his, np.int32),
        num_users=args.users,
        num_items=args.items,
        max_his=args.max_his,
        user_items=[],
    )
    cfg_kwargs = dict(
        emb_dim=args.dim,
        num_negs=args.negs,
        max_his=args.max_his,
        batch_size=args.batch,
        l_r=0.01,
        clip_val=1.0,
        milestones=[10],
        seed=2022,
        his_refresh=args.his_refresh,
        neg_sampler=args.neg_sampler,
        tile_size=0,  # Alg.-1 auto tuning
        refresh_interval=8192,
    )

    n_avail = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_avail]
    points = {}
    for c in counts:
        points[c] = run(c, dataset, cfg_kwargs)
    base = points[counts[0]]
    eff = {
        c: points[c] / (base * c / counts[0]) for c in counts
    }
    result = {
        "metric": "scaling_efficiency",
        "value": round(eff[counts[-1]], 4),
        "unit": "fraction_of_linear",
        "vs_baseline": round(eff[counts[-1]] / 0.837, 3),  # HEAT: 83.7%
        "interactions_per_sec": {str(c): round(points[c]) for c in counts},
        "efficiency": {str(c): round(eff[c], 4) for c in counts},
        "device": str(jax.devices()[0].platform),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
