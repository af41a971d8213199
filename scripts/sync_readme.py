"""Mechanically sync the README results table from a bench record.

VERDICT r2 item 10 / r3 item 8: README headline numbers drifted twice when
hand-copied. This script rewrites everything between the
``<!-- bench-table:begin -->`` / ``<!-- bench-table:end -->`` markers in
README.md from a named round record (``BENCH_r0N.json``, the driver's
capture of bench.py's one JSON line) — run it as the last step of a round:

    python scripts/sync_readme.py BENCH_r04.json

Accepts either the driver wrapper ({"parsed": {...}}) or a raw bench JSON
line. Rows whose fields are absent from the record are skipped (older
records), so the script works across rounds. Rows NOT derived from
bench.py (bench_large.py's full-scale 16M×6M huge-table row) live outside
the markers with their own provenance and are not touched.

Provenance convention (VERDICT r4 item 7): the table's HTML comment names
the record file it was generated from. The driver-captured BENCH_r0N.json
only exists AFTER a round's final commit, so a round closes by syncing
from its trial record (BENCH_trial_r0N.json — same bench.py, same chip,
run by the builder); the next round re-runs this script on the driver
record if the two disagree beyond the stated ±0.05 s variance.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
BEGIN = "<!-- bench-table:begin -->"
END = "<!-- bench-table:end -->"


def load_record(path: Path) -> dict:
    rec = json.loads(path.read_text())
    if "parsed" in rec:
        rec = rec["parsed"]
    if "value" not in rec:
        raise SystemExit(f"{path}: not a bench record (no 'value')")
    return rec


def fmt_row(label: str, ref: str, value: str) -> str:
    return f"| {label} | {ref} | {value} |"


def build_table(r: dict) -> str:
    """The results table, every number read from the record ``r``."""

    def s(key):  # seconds field, or None
        return r.get(key)

    def x(key):  # vs_baseline field formatted as NNN×
        v = r.get(key)
        return None if v is None else f"{v:.0f}×"

    rows = [
        "| Metric | Reference (8-core CPU) | heat_tpu (1×v5e) |",
        "|---|---|---|",
    ]

    def add(label, ref, value):
        if value is not None:
            rows.append(fmt_row(label, ref, value))

    ips = r.get("interactions_per_sec")
    add(
        "AmazonBooks MF_CCL epoch (52.6k×91.6k, d=64, 16 negs, 2.38M "
        "clicks), tile sampler + cached history means + bf16 "
        "tables/scoring + direct per-occurrence updates",
        "~245 s",
        None
        if s("value") is None
        else (
            f"**{s('value'):.3f} s ({x('vs_baseline')})**"
            + (f", ~{ips/1e6:.1f}M interactions/s" if ips else "")
        ),
    )
    if s("full_run_s") is not None:
        ref_total = r.get("full_run_ref_s", 245.0 * 5)
        add(
            "**End-to-end reference run shape**: 5 epochs with ranking "
            "eval every 2 epochs + final eval (cf/main.py:106-124), one "
            "wall-clock number",
            f"~{ref_total:.0f} s (5×245 s + evals)",
            f"**{s('full_run_s'):.3f} s ({x('full_run_vs_baseline')})**"
            + (
                f"; fused train→eval device programs: "
                f"{s('full_run_fused_s'):.3f} s "
                f"({x('full_run_fused_vs_baseline')})"
                if s("full_run_fused_s") is not None
                else ""
            )
            + (
                f"; at the reference's DEFAULT config shape (tile + 2 "
                f"sub-epochs): {s('full_run_default_s'):.3f} s unfused, "
                f"**{s('full_run_default_fused_s'):.3f} s "
                f"({x('full_run_default_fused_vs_baseline')})** as ONE "
                f"device program"
                if s("full_run_default_fused_s") is not None
                else ""
            ),
        )
    add(
        "same, 5 epochs per device program (`Engine.train_epochs` / CLI "
        "`--fused-epochs`)",
        "~245 s",
        None
        if s("fused5_s") is None
        else f"**{s('fused5_s'):.3f} s ({x('fused5_vs_baseline')})** — "
        "amortizes per-dispatch cost",
    )
    add(
        "same, f32 update accumulation (`update_mode: accum`)",
        "~245 s",
        None
        if s("accum_s") is None
        else f"{s('accum_s'):.3f} s ({x('accum_vs_baseline')})",
    )
    add(
        "same, batch 16384 (lr 0.02 — linear scaling, parity-checked "
        "incl. direct mode)",
        "~245 s",
        None
        if s("throughput16k_s") is None
        else f"**{s('throughput16k_s'):.3f} s "
        f"({x('throughput16k_vs_baseline')})**",
    )
    champ_ips = r.get("throughput32k_fused5_interactions_per_sec")
    add(
        "large-batch + Alg-1 auto-retuned tile (tile shrinks to 128 as "
        "batch grows — the paper's own per-hardware retuning, "
        "`derive_tile_params`); Recall@20 at these batches measures "
        "0.0126, the exact reference's own value "
        "(`scripts/accuracy_parity.py`, linear lr scaling)",
        "~245 s",
        None
        if s("throughput32k_s") is None
        else (
            f"batch 32768 @ lr 0.04: **{s('throughput32k_s'):.3f} s "
            f"({x('throughput32k_vs_baseline')})**"
            + (
                f", and with 5 epochs/dispatch "
                f"**{s('throughput32k_fused5_s'):.3f} s "
                f"({x('throughput32k_fused5_vs_baseline')})"
                + (
                    f", ~{champ_ips/1e6:.1f}M interactions/s**"
                    if champ_ips
                    else "**"
                )
                if s("throughput32k_fused5_s") is not None
                else ""
            )
            + (
                f"; batch 65536 @ lr 0.08: {s('throughput65k_s'):.3f} s "
                f"({x('throughput65k_vs_baseline')})"
                if s("throughput65k_s") is not None
                else ""
            )
        ),
    )
    add(
        "sub-epoch mode at the reference's DEFAULT combination (tile "
        "sampler + `num_subepochs: 2` — cf_config.py:7 pairs them), one "
        "fused device program per epoch; negatives global-scope by "
        "default (full-scale Recall@20 0.0122 vs 0.0126 exact — the "
        "reference's written complement constraint measurably collapses "
        "training at S=2, DESIGN.md 6g; opt-in via `subepoch_neg_scope`)",
        "~245 s",
        None
        if s("subepoch2_tile_s") is None
        else f"**{s('subepoch2_tile_s'):.3f} s "
        f"({x('subepoch2_tile_vs_baseline')})**"
        + (
            f"; 5 epochs/dispatch: {s('subepoch2_tile_fused5_s'):.3f} s "
            f"({x('subepoch2_tile_fused5_vs_baseline')})"
            if s("subepoch2_tile_fused5_s") is not None
            else ""
        ),
    )
    add(
        "same, all-f32 fast mode",
        "~245 s",
        None
        if s("fast_f32_s") is None
        else f"{s('fast_f32_s'):.3f} s "
        f"({245.0 / s('fast_f32_s'):.0f}×)",
    )
    add(
        "same, exact reference semantics (uniform sampler, per-step "
        "history recompute, f32)",
        "~245 s",
        None
        if s("exact_mode_s") is None
        else (
            f"**{s('exact_mode_s'):.2f} s ({x('exact_vs_baseline')})** "
            "(chunk-fused history mean — the gather never materializes)"
            + (
                f"; at the measured issue-rate floor with direct "
                f"per-occurrence updates: {s('exact_direct_s'):.2f} s "
                f"({x('exact_direct_vs_baseline')}, DESIGN.md 6c-ter)"
                if s("exact_direct_s") is not None
                else ""
            )
            + (
                f"; on the live parse-order visit stream (user-grouped "
                f"clicks, the fork's MPI hot-loop order) the "
                f"history-gather dedup cuts it to "
                f"**{s('exact_grouped_s'):.2f} s "
                f"({x('exact_grouped_vs_baseline')})**"
                if s("exact_grouped_s") is not None
                else ""
            )
            + (
                f" — {s('zipf_exact_s'):.2f} s on Zipf-skewed grouped "
                "streams (the dedup win survives real skew, "
                "`zipf_exact_s`)"
                if s("zipf_exact_s") is not None
                else ""
            )
        ),
    )
    add(
        "AmazonBooks d=256, 64 negatives (BASELINE.json config 4 — "
        "scoring-bound)",
        "—",
        None
        if s("heavy_d256_negs64_s") is None
        else f"{s('heavy_d256_negs64_s'):.2f} s/epoch bf16",
    )
    add(
        "ACCL aggregation (the reference's named menu, "
        "behavior_aggregators.cpp:27; paper H-ACCL rows): user-attention "
        "composes with cached pools; self-attention requires per-step "
        "pooling (its learned query's only gradient path). Full-scale "
        "Recall@20 parity vs the mean aggregator: see the ACCL section",
        "— (ACCL within ~1.2× of the 245 s CCL epoch, paper ARM rows)",
        None
        if s("accl_user_s") is None
        else (
            f"user-attention **{s('accl_user_s'):.3f} s "
            f"({x('accl_user_vs_ccl_baseline')})**"
            + (
                f"; self-attention {s('accl_self_s'):.2f} s "
                f"({x('accl_self_vs_ccl_baseline')})"
                if s("accl_self_s") is not None
                else ""
            )
            + (
                f" — **{s('accl_self_grouped_s'):.3f} s "
                f"({x('accl_self_grouped_vs_ccl_baseline')})** on the "
                "live parse-order stream (round-5 attention-dedup: H "
                "rows gathered once per distinct user, exact)"
                if s("accl_self_grouped_s") is not None
                else ""
            )
        ),
    )
    add(
        "CosineContrastiveLoss — the MF_CCL family namesake (SimpleX "
        "margin 0.8 / weight 150) under the headline treatment",
        "~245 s",
        None
        if s("ccl_s") is None
        else f"**{s('ccl_s'):.3f} s ({x('ccl_vs_baseline')})**",
    )
    add(
        "Yelp18-shape epoch (31.7k×38k, d=128, 64 negs, clip 0.1 — the "
        "third reference dataset shape), tile sampler + bf16",
        "—",
        None
        if s("yelp_shape_s") is None
        else f"**{s('yelp_shape_s'):.3f} s** "
        f"({r.get('yelp_shape_interactions_per_sec', 0)/1e6:.1f}M "
        "interactions/s)",
    )
    add(
        "Gowalla-shape epoch (29.9k×41k, d=128, 64 negs, clip 0.1, 1.03M "
        "clicks — the second reference dataset shape), tile sampler + bf16",
        "—",
        None
        if s("gowalla_shape_s") is None
        else f"**{s('gowalla_shape_s'):.3f} s** "
        f"({r.get('gowalla_shape_interactions_per_sec', 0)/1e6:.1f}M "
        "interactions/s)",
    )
    lg = r.get("large_geometry") or {}
    add(
        "Huge-table sort-dedup update path (both tables > 4M rows, "
        "emb_pad=128 full-sublane layout) at a time-boxed "
        f"{lg.get('users', 0)/1e6:.0f}M×{lg.get('items', 0)/1e6:.1f}M"
        f"×{lg.get('clicks', 0)/1e6:.0f}M-click geometry — "
        "`bench_large.py` remains the 16M×6M×40M flagship harness",
        "— (no reference equivalent at this scale)",
        None
        if s("large_epoch_s") is None
        else f"**{s('large_epoch_s'):.2f} s** "
        f"({r.get('large_interactions_per_sec', 0)/1e6:.1f}M "
        "interactions/s)",
    )
    add(
        "Full ranking eval + all metrics on device (exact top-50 over "
        "91.6k items, train-masked)",
        "—",
        None
        if s("eval_topk50_s") is None
        else (
            f"**{s('eval_topk50_s'):.2f} s exact** (two-phase "
            "window-select top-k with a pad-free fused bitmask pass — "
            "`lax.top_k` alone costs 1.03 s)"
            + (
                f"; `approx_max_k`@0.95 is "
                f"{s('eval_topk50_approx95_s'):.2f} s, @0.99 "
                f"{s('eval_topk50_approx99_s'):.2f} s"
                if s("eval_topk50_approx95_s") is not None
                else ""
            )
            + (
                f"; Zipf-skewed mask+truth evaluates in "
                f"{s('eval_skew_s'):.2f} s (`eval_skew_s`)"
                if s("eval_skew_s") is not None
                else ""
            )
        ),
    )
    add(
        "Serving request path (`Recommender.recommend`, top-20, packed "
        "seen-mask, transfers included; batch 1 is the dev tunnel's "
        "fixed dispatch floor)",
        "— (no reference serving path)",
        None
        if s("serve_b8192_ms") is None
        else (
            f"batch 8192: **{s('serve_b8192_ms'):.1f} ms** "
            f"({r.get('serve_us_per_user_b8192', 0):.1f} µs/user); "
            f"batch 256: {s('serve_b256_ms'):.1f} ms; "
            f"batch 1: {s('serve_b1_ms'):.0f} ms"
        ),
    )
    return "\n".join(rows)


def main() -> None:
    if len(sys.argv) != 2:
        raise SystemExit("usage: python scripts/sync_readme.py BENCH_r0N.json")
    rec_path = Path(sys.argv[1])
    if not rec_path.is_absolute():
        rec_path = REPO / rec_path
    rec = load_record(rec_path)
    readme = REPO / "README.md"
    text = readme.read_text()
    if BEGIN not in text or END not in text:
        raise SystemExit("README.md markers missing")
    table = build_table(rec)
    provenance = (
        f"<!-- generated by scripts/sync_readme.py from {rec_path.name}; "
        "do not edit by hand -->"
    )
    new = re.sub(
        re.escape(BEGIN) + r".*?" + re.escape(END),
        BEGIN + "\n" + provenance + "\n" + table + "\n" + END,
        text,
        flags=re.S,
    )
    readme.write_text(new)
    print(f"README.md results table regenerated from {rec_path.name}")


if __name__ == "__main__":
    main()
