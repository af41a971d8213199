"""SimpleX behavior aggregation.

The reference BehaviorAggregator (behavior_aggregators.cpp:51-127) mean-pools
the first ``num_his = mask[user]`` rows of the user's history-item embeddings,
applies a learned (d, d) linear map ``weights0``, and blends

    u_agg = gamma * u + (1 - gamma) * (mean @ weights0)        (gamma = 0.4)

Backward (behavior_aggregators.cpp:129-153):
* weights0's gradient is the outer product means^T (1-gamma) dL/du_agg —
  exactly what autodiff of this forward yields;
* the upstream user gradient is scaled by gamma — again exactly autodiff;
* NO gradient flows into the item embeddings through the history mean (the
  reference backward stops there), so callers must pass history embeddings
  through ``jax.lax.stop_gradient``.

History padding semantics (datasets.py:47-61): rows beyond mask repeat the
last item (or are zeros when the user has no history) and are excluded from
the mean by masking on position < mask; empty histories use a guarded
divisor (the reference divides by zero there and warns — we clamp).
"""

from __future__ import annotations

import jax.numpy as jnp


def history_mean(
    his_embs: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Masked mean over the first ``mask`` history rows.

    Args:
      his_embs: (B, H, d) gathered history item embeddings.
      mask: (B,) int — valid history length per user.

    Returns:
      (B, d) means.
    """
    b, h, _ = his_embs.shape
    pos = jnp.arange(h, dtype=mask.dtype)[None, :]  # (1, H)
    valid = (pos < mask[:, None]).astype(his_embs.dtype)  # (B, H)
    total = jnp.einsum("bhd,bh->bd", his_embs, valid)
    denom = jnp.maximum(mask.astype(his_embs.dtype), 1.0)
    return total / denom[:, None]


def aggregate_history(
    u: jnp.ndarray,
    means: jnp.ndarray,
    w0: jnp.ndarray,
    gamma: float,
) -> jnp.ndarray:
    """u_agg = gamma * u + (1 - gamma) * means @ w0.

    (behavior_aggregators.cpp:118-122; w0 orientation matches the
    reference's ``means.matrix() * weights0.matrix()``.)
    """
    f_c0 = jnp.dot(means, w0, preferred_element_type=means.dtype)
    return gamma * u + (1.0 - gamma) * f_c0
