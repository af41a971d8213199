"""Tiled on-device evaluator vs dense numpy oracle."""

import numpy as np

from heat_tpu.evaluation.evaluator import full_sim_matrix, topk_scores


def _dense_topk(user_emb, item_emb, pairs, k):
    sim = user_emb @ item_emb.T
    for u, i in pairs:
        sim[u, i] = -np.inf
    ids = np.argsort(-sim, axis=1, kind="stable")[:, :k]
    scores = np.take_along_axis(sim, ids, axis=1)
    return scores, ids


def test_topk_matches_dense_with_masking():
    rng = np.random.default_rng(0)
    u_n, i_n, d, k = 300, 257, 16, 10
    user_emb = rng.normal(size=(u_n, d)).astype(np.float32)
    item_emb = rng.normal(size=(i_n, d)).astype(np.float32)
    pairs = np.stack(
        [rng.integers(0, u_n, 500), rng.integers(0, i_n, 500)], axis=1
    ).astype(np.int32)
    pairs = np.unique(pairs, axis=0)

    scores, ids = topk_scores(
        user_emb, item_emb, k, train_pairs=pairs, user_tile=64
    )
    want_scores, _ = _dense_topk(user_emb.copy(), item_emb, pairs, k)
    # Compare by scores (tie order between equal scores may differ).
    np.testing.assert_allclose(scores, want_scores, rtol=1e-4, atol=1e-5)
    # Masked items never appear.
    masked = {(int(u), int(i)) for u, i in pairs}
    for u in range(u_n):
        for i in ids[u]:
            assert (u, int(i)) not in masked


def test_topk_no_mask():
    rng = np.random.default_rng(1)
    user_emb = rng.normal(size=(10, 4)).astype(np.float32)
    item_emb = rng.normal(size=(20, 4)).astype(np.float32)
    scores, ids = topk_scores(user_emb, item_emb, 5, user_tile=4)
    sim = user_emb @ item_emb.T
    want = np.sort(-sim, axis=1)
    np.testing.assert_allclose(scores, -want[:, :5], rtol=1e-5)


def test_full_sim_matrix():
    rng = np.random.default_rng(2)
    u = rng.normal(size=(5, 3)).astype(np.float32)
    i = rng.normal(size=(7, 3)).astype(np.float32)
    np.testing.assert_allclose(full_sim_matrix(u, i), u @ i.T, rtol=1e-5)
