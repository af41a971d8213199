"""Probe: does per-epoch USER-BLOCK shuffling recover the grouped-stream
quality dip while keeping the history-gather dedup?

Background (DESIGN.md 6c/6h): the exact-mode and attention bench rows on
the fork's live parse-order stream (user-grouped clicks) get their 5x
speedups from the history-gather dedup, but fixed user-grouped visiting
costs a few % of ranking quality at full scale (mean exact Recall@20
0.0122 vs 0.0126 shuffled; self-attention 0.0107 vs 0.0118). Two
candidate mechanisms: (a) the stream is FIXED across epochs (no SGD
reshuffling), (b) a user's updates are CONSECUTIVE within an epoch
(correlated sample order). Per-epoch block shuffling — permute the
per-user blocks, keep each user's clicks contiguous — removes (a) while
preserving the duplication structure the dedup needs, so this probe
separates the mechanisms: if blocks recovers the dip, fixedness was the
cost and a `shuffle_mode: "blocks"` engine mode is worth shipping; if
not, the dip is intra-epoch grouping itself and blocks is a negative
result.

Implementation: the engine already recomputes its dedup maps whenever
the pairs object changes (cache keyed on id(pairs)), so the probe just
swaps ``eng.pairs`` for a fresh block permutation each epoch under
``shuffle_mode="none"``. The dedup maps' padded width ``bu`` jitters a
few slots across permutations, which would recompile the epoch program
each epoch; the probe wraps ``_history_dedup`` to pad every epoch's
maps to one fixed width (the same repeat-slot-0 padding scheme the
engine itself uses — pad slots are never referenced by the inverse
gather, DESIGN.md 6c).

Run (real TPU, ~10 min for all arms):
  python scripts/probe_block_shuffle.py --variant mean_exact
  python scripts/probe_block_shuffle.py --variant self_attention
Arms per variant: fixed (grouped parse order, the bench row shape),
blocks (per-epoch block shuffle), shuffled (shuffle_mode="epoch", the
quality reference).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from heat_tpu.config import CFConfig  # noqa: E402
from heat_tpu.data.synthetic import synthetic_click_dataset  # noqa: E402
from heat_tpu.train.engine import Engine  # noqa: E402

METRICS = ["Recall(k=20)", "Recall(k=50)", "NDCG(k=20)", "NDCG(k=50)"]

BU_PAD = 512  # fixed dedup-map slot width (observed max_u ~190 at the
# AmazonBooks grouped geometry; assert below guards the headroom)


def variant_cfg_kw(variant: str) -> dict:
    if variant == "mean_exact":
        # The zipf/amazon exact grouped bench rows' config: uniform
        # sampler, per-step history recompute, f32.
        return dict(neg_sampler=0, his_refresh="step")
    if variant == "self_attention":
        # The accl_self_grouped_s bench row's config.
        return dict(
            neg_sampler=1, tile_size=512, refresh_interval=8192,
            his_refresh="step", aggregator="self_attention",
            update_mode="direct", compute_dtype="bfloat16",
            param_dtype="bfloat16",
        )
    if variant == "user_attention":
        # user_attention's dedup-eligible combination (combine-then-clip
        # updates — direct is gated out of the dedup, DESIGN.md 6h).
        return dict(
            neg_sampler=1, tile_size=512, refresh_interval=8192,
            his_refresh="step", aggregator="user_attention",
            compute_dtype="bfloat16", param_dtype="bfloat16",
        )
    raise SystemExit(f"unknown variant {variant!r}")


def pad_dedup(eng: Engine) -> None:
    """Wrap the engine's dedup precompute to emit a fixed slot width."""
    import jax.numpy as jnp

    orig = eng._history_dedup

    def padded(pairs, users):
        out = orig(pairs, users)
        if out is None:
            return None
        uu, inv, uf = out
        bu = int(uu.shape[1])
        assert bu <= BU_PAD, f"max_u {bu} exceeds BU_PAD {BU_PAD}"
        if bu < BU_PAD:
            pad = BU_PAD - bu
            uu = jnp.concatenate([uu, jnp.repeat(uu[:, :1], pad, 1)], 1)
            uf = jnp.concatenate([uf, jnp.repeat(uf[:, :1], pad, 1)], 1)
        return uu, inv, uf

    eng._history_dedup = padded


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--variant", default="mean_exact",
        choices=("mean_exact", "self_attention", "user_attention"),
    )
    ap.add_argument(
        "--arms", default="fixed,blocks,shuffled",
        help="comma list of fixed|blocks|shuffled",
    )
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--seed", type=int, default=2022)
    ap.add_argument("--block-seed", type=int, default=7)
    args = ap.parse_args()

    import jax.numpy as jnp

    from heat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    train, test = synthetic_click_dataset(
        num_users=52_643, num_items=91_599, max_his=100, seed=7
    )
    pairs0 = np.asarray(train.pairs)
    order = np.argsort(pairs0[:, 0], kind="stable")
    pairs_g = pairs0[order]  # user-grouped parse order (the live stream)
    users_g = pairs_g[:, 0]
    starts = np.flatnonzero(
        np.concatenate([[True], users_g[1:] != users_g[:-1]])
    )
    ends = np.append(starts[1:], len(users_g))

    for arm in args.arms.split(","):
        kw = variant_cfg_kw(args.variant)
        shuffle_mode = "epoch" if arm == "shuffled" else "none"
        cfg = CFConfig(
            emb_dim=64, num_negs=16, max_his=100, batch_size=8192,
            l_r=0.01, clip_val=1.0, milestones=[10], seed=args.seed,
            metrics=METRICS, shuffle_mode=shuffle_mode, **kw,
        )
        train_arm = (
            train if arm == "shuffled"
            else dataclasses.replace(train, pairs=pairs_g)
        )
        eng = Engine(cfg, train_arm, test)
        if arm == "blocks":
            pad_dedup(eng)
        rng = np.random.default_rng(args.block_seed)
        losses, times = [], []
        pairs_refs = []  # pin swapped-out streams: the dedup cache keys
        # on id(pairs), and a freed array's id can be reused
        for _ in range(args.epochs):
            if arm == "blocks":
                perm = rng.permutation(len(starts))
                idx = np.concatenate(
                    [np.arange(starts[b], ends[b]) for b in perm]
                )
                eng.pairs = jnp.asarray(pairs_g[idx], jnp.int32)
                pairs_refs.append(eng.pairs)
            t0 = time.perf_counter()
            losses.append(round(eng.train_one_epoch(), 4))
            times.append(round(time.perf_counter() - t0, 3))
        m = eng.evaluate()
        dedup_on = (
            getattr(eng, "_dedup_cache", (None, None))[1] is not None
            if arm != "shuffled" else False
        )
        print(
            json.dumps({
                "variant": args.variant, "arm": arm, "losses": losses,
                "epoch_s": times, "dedup_active": bool(dedup_on),
                **{k: round(v, 4) for k, v in m.items()},
            }),
            flush=True,
        )


if __name__ == "__main__":
    main()
