"""Inference/serving: top-k recommendations from a trained model.

The reference has no inference path beyond its evaluation matrix; this
module rounds out the framework for deployment: load a checkpoint (or take
a live TrainState), optionally apply fresh behavior aggregation to user
embeddings, and serve batched top-k item recommendations with
already-interacted items masked — all on device via the tiled evaluator.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from heat_tpu.config import CFConfig
from heat_tpu.evaluation.evaluator import TiledEvaluator
from heat_tpu.models.aggregator import aggregate_history
from heat_tpu.models.state import TrainState


class Recommender:
    """Batched top-k recommendation over a trained model.

    Args:
      state: trained TrainState (e.g. ``engine.state`` or a checkpoint
        restore).
      cfg: the training config (for gamma / aggregation).
      seen_pairs: (N, 2) user-item interactions to exclude from results
        (typically the training clicks), or None.
      his_items / his_masks: user history arrays; required only for
        ``aggregate_users=True`` recommendation.
    """

    def __init__(
        self,
        state: TrainState,
        cfg: CFConfig,
        seen_pairs: Optional[np.ndarray] = None,
        his_items=None,
        his_masks=None,
        user_tile: int = 1024,
    ):
        self.state = state
        self.cfg = cfg
        self.his_items = his_items
        self.his_masks = his_masks
        self._evaluator = TiledEvaluator(
            seen_pairs, int(state.user_emb.shape[0]), user_tile=user_tile
        )

    def _user_embeddings(self, aggregate_users: bool):
        user_emb = self.state.user_emb
        if not aggregate_users:
            return user_emb
        if self.his_items is None or self.his_masks is None:
            raise ValueError("aggregate_users requires history arrays")
        from heat_tpu.train.engine import compute_user_pools

        pooled = compute_user_pools(
            self.state.item_emb,
            jnp.asarray(self.his_items),
            jnp.asarray(self.his_masks),
            user_emb=(
                user_emb
                if self.cfg.aggregator == "user_attention"
                else None
            ),
            attn_q=self.state.attn_q,
            aggregator=self.cfg.aggregator,
        )
        return aggregate_history(
            user_emb, pooled, self.state.w0, self.cfg.gamma
        )

    def recommend_all(
        self, k: int, aggregate_users: bool = False
    ) -> np.ndarray:
        """(U, k) top item ids for every user."""
        _, ids = self._evaluator.topk(
            self._user_embeddings(aggregate_users), self.state.item_emb, k
        )
        return ids

    def recommend(
        self,
        user_ids: Sequence[int],
        k: int,
        aggregate_users: bool = False,
    ) -> np.ndarray:
        """(len(user_ids), k) top item ids for the requested users."""
        ids = self.recommend_all(k, aggregate_users=aggregate_users)
        return ids[np.asarray(user_ids, np.int64)]
