"""On-chip regression tests for TPU-only numeric hazards.

Each test targets a bug class that CPU tests cannot catch (CPU matmuls are
exact f32; CPU clamps out-of-range slices consistently):

1. chunked-pooling clamp (commit 3bf5879's cached-means corruption),
2. top-k selection fidelity at bf16-resolution score gaps
   (evaluator extraction matmul precision),
3. direct-vs-dedup update-path metric agreement,
4. headline-config epoch sanity at AmazonBooks scale.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from heat_tpu.config import CFConfig
from heat_tpu.data.datasets import ClickDataset
from heat_tpu.data.synthetic import synthetic_click_dataset
from heat_tpu.evaluation.evaluator import TiledEvaluator
from heat_tpu.models.aggregator import user_pools_impl
from heat_tpu.train.engine import Engine


def test_pools_clamp_regression():
    """Chunked whole-table pooling must be exact for EVERY row, including
    the final partial chunk whose dynamic_slice start would clamp
    (the TPU clamps the read and the write to DIFFERENT offsets unless the
    start is clamped explicitly — scripts/bisect_pools_check.py found rows
    shifted by the clamp delta). U is chosen prime-ish so no chunk size
    divides it."""
    rng = np.random.default_rng(0)
    U, I, D, H = 20_011, 50_000, 64, 100
    item = jnp.asarray(
        rng.normal(scale=0.01, size=(I, D)).astype(np.float32), jnp.bfloat16
    )
    his = rng.integers(0, I, (U, H)).astype(np.int32)
    masks = rng.integers(0, H + 1, (U,)).astype(np.int32)
    got = np.asarray(
        jax.jit(
            lambda it, hi, ms: user_pools_impl(it, hi, ms, aggregator="mean")
        )(item, jnp.asarray(his), jnp.asarray(masks)),
        np.float32,
    )
    # Independent numpy oracle from the same bf16 row values, rounded to
    # the pools' bf16 storage resolution: the device path accumulates the
    # masked sum and divides in f32, then rounds ONCE into the bf16 table,
    # so it may differ from the f32 oracle only by that single rounding
    # (1 bf16 ulp = 2^-8 relative; the rtol allows 2 ulps for boundary
    # flips where the f32 mean lands within accumulation-order noise of a
    # rounding boundary — measured 78/1.28M elements at <=2 ulp). A
    # clamp-shear regression shows up as whole rows taking ANOTHER row's
    # values — errors at 100% relative scale, far outside this band.
    item_np = np.asarray(item, np.float32)
    rows = item_np[his]  # (U, H, D)
    keep = (np.arange(H)[None, :] < masks[:, None]).astype(np.float32)
    want = (rows * keep[:, :, None]).sum(1) / np.maximum(
        masks[:, None], 1
    ).astype(np.float32)
    want[masks == 0] = 0.0
    want_b = np.asarray(jnp.asarray(want, jnp.bfloat16), np.float32)
    np.testing.assert_allclose(got, want_b, rtol=8e-3, atol=2e-6)


def test_exact_topk_matches_host_ranking():
    """The evaluator's exact two-phase top-k on the REAL chip must agree
    with a host-side f32 ranking of the same scores — catches any default-
    precision matmul in the selection path truncating f32 operands to bf16
    (commit 15ea8f2's re-ranking bug: Recall@20 0.0106 vs 0.0114)."""
    rng = np.random.default_rng(1)
    U, I, D, K = 2048, 91_599, 64, 50
    # bf16-trained-table regime: score gaps frequently below bf16 ulp.
    ue = rng.normal(scale=0.05, size=(U, D)).astype(np.float32)
    ie = rng.normal(scale=0.05, size=(I, D)).astype(np.float32)
    pairs = np.stack(
        [rng.integers(0, U, 100_000), rng.integers(0, I, 100_000)], 1
    ).astype(np.int32)
    ev = TiledEvaluator(pairs, U, num_items=I)
    scores_dev, ids_dev = ev.topk(ue, ie, K, return_scores=True)
    # Host oracle: exact f32 GEMM + masking + argsort.
    sim = ue.astype(np.float64) @ ie.astype(np.float64).T
    sim = sim.astype(np.float32)
    sim[pairs[:, 0], pairs[:, 1]] = -np.inf
    kth = np.partition(-sim, K - 1, axis=1)
    want_scores = -kth[:, :K]
    want_scores.sort(axis=1)
    want_scores = want_scores[:, ::-1]
    np.testing.assert_allclose(scores_dev, want_scores, rtol=1e-5)
    # The ids' gathered scores must equal the returned scores (no silent
    # re-ranking between selection and extraction).
    np.testing.assert_allclose(
        np.take_along_axis(sim, np.asarray(ids_dev), 1),
        scores_dev,
        rtol=1e-5,
    )


def test_direct_vs_dedup_metrics_agree():
    """update_mode='direct' (per-occurrence scatter-add) and 'dedup'
    (combine-then-clip) must land inside the paper's ±0.0003-class parity
    band on end metrics (section 5.4; full-scale run:
    scripts/accuracy_parity.py)."""
    train, test = synthetic_click_dataset(
        num_users=3000, num_items=5000, clicks_per_user=24, max_his=10,
        seed=5,
    )
    out = {}
    for mode in ("direct", "dedup"):
        cfg = CFConfig(
            emb_dim=32, num_negs=8, max_his=10, batch_size=4096,
            l_r=0.05, clip_val=1.0, seed=11, update_mode=mode,
            metrics=["Recall(k=20)"],
        )
        eng = Engine(cfg, train, test)
        losses = [eng.train_one_epoch() for _ in range(3)]
        assert losses[-1] < losses[0]
        out[mode] = eng.evaluate()["Recall(k=20)"]
    assert abs(out["direct"] - out["dedup"]) < 0.01, out


def test_headline_epoch_sanity():
    """One headline-config epoch at AmazonBooks geometry on the real chip:
    finite decreasing loss, and epoch time far under the 245 s reference
    baseline (BASELINE.md)."""
    rng = np.random.default_rng(0)
    U, I, N, H = 52_643, 91_599, 2_380_730, 100
    data = ClickDataset(
        pairs=np.stack(
            [rng.integers(0, U, N), rng.integers(0, I, N)], 1
        ).astype(np.int32),
        his_items=rng.integers(0, I, (U, H)).astype(np.int32),
        masks=np.full((U,), H, np.int32),
        num_users=U,
        num_items=I,
        max_his=H,
        user_items=[],
    )
    cfg = CFConfig(
        emb_dim=64, num_negs=16, max_his=H, batch_size=8192, l_r=0.01,
        clip_val=1.0, milestones=[10], seed=2022, his_refresh="subepoch",
        neg_sampler=1, tile_size=512, refresh_interval=8192,
        compute_dtype="bfloat16", param_dtype="bfloat16",
        update_mode="direct",
    )
    eng = Engine(cfg, data)
    l0 = eng.train_one_epoch()  # includes compile
    t0 = time.perf_counter()
    l1 = eng.train_one_epoch()
    dt = time.perf_counter() - t0
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0
    assert dt < 60.0, f"headline epoch took {dt:.1f}s (expect ~0.3-0.5s)"
