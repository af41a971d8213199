"""Compare the old (scan over reshaped chunks, zero-padded) and new
(fori_loop + clamped dynamic_slice) compute_user_pools implementations on
identical inputs at AmazonBooks shape — the 5bec251 rewrite is the
bisected source of the fast-mode quality regression.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from heat_tpu.models.aggregator import pool_history, user_pools_impl

U, I, D, H = 52_643, 91_599, 64, 100
CHUNK = 4096


def old_pools(item_emb, his_items, his_masks, chunk=CHUNK):
    u, h = his_items.shape
    u_pad = -(-u // chunk) * chunk
    if u_pad != u:
        his_items = jnp.concatenate(
            [his_items, jnp.zeros((u_pad - u, h), his_items.dtype)]
        )
        his_masks = jnp.concatenate(
            [his_masks, jnp.zeros((u_pad - u,), his_masks.dtype)]
        )
    xs = [
        his_items.reshape(u_pad // chunk, chunk, h),
        his_masks.reshape(u_pad // chunk, chunk),
    ]

    def body(_, xs):
        ids, mask = xs[0], xs[1]
        return None, pool_history(item_emb[ids], mask, kind="mean")

    _, pooled = jax.lax.scan(body, None, tuple(xs))
    return pooled.reshape(u_pad, item_emb.shape[1])[:u]


def main():
    rng = np.random.default_rng(0)
    item = jnp.asarray(
        rng.normal(scale=0.01, size=(I, D)).astype(np.float32), jnp.bfloat16
    )
    his = jnp.asarray(rng.integers(0, I, (U, H)).astype(np.int32))
    masks = jnp.asarray(rng.integers(0, H + 1, (U,)).astype(np.int32))

    a = np.asarray(jax.jit(old_pools)(item, his, masks), np.float32)
    b = np.asarray(
        jax.jit(
            lambda it, hi, ms: user_pools_impl(it, hi, ms, aggregator="mean")
        )(item, his, masks),
        np.float32,
    )
    diff = np.abs(a - b)
    print("max abs diff:", diff.max())
    print("rows differing (>1e-6):", int((diff.max(1) > 1e-6).sum()), "/", U)
    if diff.max() > 0:
        r = int(diff.max(1).argmax())
        print("worst row", r, "mask", int(masks[r]))
        print("old:", a[r][:6])
        print("new:", b[r][:6])


if __name__ == "__main__":
    main()
