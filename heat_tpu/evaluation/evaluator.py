"""On-device tiled top-k evaluation.

The reference evaluator materializes the full user x item similarity matrix
with one Eigen GEMM (engine.cpp:388-400), copies it to Python, masks train
items to -inf in numpy, and top-ks with argpartition (metrics.py:21-29). At
full scale that matrix does not fit anywhere (52k x 91k f32 ~ 19 GB; the
synthetic 100M x 10M config makes it absurd), so here the evaluation runs in
user tiles entirely on device:

  for each tile of T users:
      sim   = U_tile @ I^T            (MXU GEMM, f32 accumulation)
      sim  -= inf at this tile's train pairs (scatter, padded ids dropped)
      top_k = lax.top_k(sim, k)

Only (num_users, k) scores/ids ever reach the host. Evaluation scoring uses
the raw dot product, as the reference does (engine.cpp:398 — no
normalization in evaluate0, unlike training's cosine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.finfo(jnp.float32).min


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_tile(
    user_tile: jnp.ndarray,     # (T, d)
    item_emb: jnp.ndarray,      # (I, d)
    mask_u: jnp.ndarray,        # (P,) tile-local user rows (P padded; >=T drops)
    mask_i: jnp.ndarray,        # (P,) item ids
    *,
    k: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    sim = jnp.dot(
        user_tile.astype(jnp.float32),
        item_emb.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )
    sim = sim.at[mask_u, mask_i].set(NEG_INF, mode="drop")
    return jax.lax.top_k(sim, k)


def _pairs_by_tile(
    train_pairs: np.ndarray, num_users: int, tile: int
) -> list[np.ndarray]:
    """Group (user, item) pairs by user tile, users made tile-local."""
    num_tiles = -(-num_users // tile)
    buckets: list[list[np.ndarray]] = [[] for _ in range(num_tiles)]
    if len(train_pairs):
        t = train_pairs[:, 0] // tile
        order = np.argsort(t, kind="stable")
        sorted_pairs = train_pairs[order]
        tile_ids = t[order]
        bounds = np.searchsorted(tile_ids, np.arange(num_tiles + 1))
        for ti in range(num_tiles):
            buckets[ti].append(sorted_pairs[bounds[ti] : bounds[ti + 1]])
    return [
        np.concatenate(b, axis=0) if b else np.zeros((0, 2), np.int32)
        for b in buckets
    ]


def topk_scores(
    user_emb,
    item_emb,
    k: int,
    *,
    train_pairs: np.ndarray | None = None,
    user_tile: int = 1024,
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k item ids and scores per user, with train interactions masked.

    Args:
      user_emb: (U, d) array (host or device).
      item_emb: (I, d) array.
      k: ranks to keep (>= the largest metric k).
      train_pairs: (N, 2) numpy (user, item) pairs to exclude, or None.
      user_tile: users per device tile.

    Returns:
      (scores (U, k) f32, ids (U, k) i32) as numpy arrays.
    """
    num_users = int(user_emb.shape[0])
    user_emb = jnp.asarray(user_emb)
    item_emb = jnp.asarray(item_emb)
    num_tiles = -(-num_users // user_tile)
    if train_pairs is None:
        train_pairs = np.zeros((0, 2), np.int32)
    buckets = _pairs_by_tile(np.asarray(train_pairs), num_users, user_tile)
    # Pad every tile's mask list to one static shape -> single compilation.
    pmax = max(1, max(len(b) for b in buckets))
    out_scores = np.empty((num_tiles * user_tile, k), np.float32)
    out_ids = np.empty((num_tiles * user_tile, k), np.int32)
    pad_rows = num_tiles * user_tile - num_users
    if pad_rows:
        user_emb = jnp.concatenate(
            [user_emb, jnp.zeros((pad_rows, user_emb.shape[1]), user_emb.dtype)]
        )
    for ti in range(num_tiles):
        pairs = buckets[ti]
        mask_u = np.full((pmax,), user_tile, np.int32)  # drop sentinel
        mask_i = np.zeros((pmax,), np.int32)
        if len(pairs):
            mask_u[: len(pairs)] = pairs[:, 0] % user_tile
            mask_i[: len(pairs)] = pairs[:, 1]
        scores, ids = _topk_tile(
            user_emb[ti * user_tile : (ti + 1) * user_tile],
            item_emb,
            jnp.asarray(mask_u),
            jnp.asarray(mask_i),
            k=k,
        )
        out_scores[ti * user_tile : (ti + 1) * user_tile] = np.asarray(scores)
        out_ids[ti * user_tile : (ti + 1) * user_tile] = np.asarray(ids)
    return out_scores[:num_users], out_ids[:num_users]


def full_sim_matrix(user_emb, item_emb) -> np.ndarray:
    """The reference ``evaluate0`` API (engine.cpp:388-400): the dense
    user x item dot-product matrix. Only for small problems / parity tests —
    production evaluation uses :func:`topk_scores`."""
    sim = jnp.dot(
        jnp.asarray(user_emb, jnp.float32),
        jnp.asarray(item_emb, jnp.float32).T,
        preferred_element_type=jnp.float32,
    )
    return np.asarray(sim)
