"""Dense-accumulator vs sort-dedup row updates at AmazonBooks shapes,
separated by table role:

  user table:  B ids WITH the aggregated-row write-back (the set scatter
               exists in both paths; the sorted path fuses the update into
               it, the dense path pays acc-zero + f32 add scatter +
               touched scatter + dense pass ON TOP of it)
  item table:  B + T ids, no write-back (dense vs sorted)

Also times argsort alone (the sorted path's fixed cost).

Usage: python scripts/profile_update_paths.py   (real chip)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from heat_tpu.train.scatter import (
    _apply_row_updates_dense,
    _apply_row_updates_sorted,
)

U, I, D, B, T = 52_643, 91_599, 64, 8192, 512
N = 200
REPS = 3
LR = jnp.float32(0.01)
L2 = 1e-7


def scan_time(name, body, carry0, xs, baseline=0.0):
    @jax.jit
    def prog(carry, xs):
        carry, _ = jax.lax.scan(body, carry, xs)
        return carry

    out = prog(carry0, xs)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = prog(carry0, xs)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"{name:46s} {best*1e3:8.4f} ms/iter  (-base {max(0, best-baseline)*1e3:8.4f})")
    return best


def main():
    keys = jax.random.split(jax.random.key(0), N)
    user_t = jax.random.normal(jax.random.key(1), (U, D), jnp.bfloat16)
    item_t = jax.random.normal(jax.random.key(2), (I, D), jnp.bfloat16)
    g_u = jax.random.normal(jax.random.key(3), (B, D), jnp.float32)
    wb = jax.random.normal(jax.random.key(4), (B, D), jnp.float32)
    g_i = jax.random.normal(jax.random.key(5), (B + T, D), jnp.float32)

    def base_body(c, k):
        return c, None

    base = scan_time("empty scan", base_body, (user_t,), keys)

    def s_argsort(c, k):
        (t,) = c
        ids = jax.random.randint(k, (B,), 0, U, dtype=jnp.int32)
        order = jnp.argsort(ids)
        return (t + order[:1].astype(t.dtype) * 0,), None

    scan_time("argsort(B int32) alone", s_argsort, (user_t,), keys, base)

    # --- user table: write-back + update ---
    def u_dense(c, k):
        (t,) = c
        ids = jax.random.randint(k, (B,), 0, U, dtype=jnp.int32)
        t = t.at[ids].set(wb.astype(t.dtype))
        t, _ = _apply_row_updates_dense(
            t, ids, g_u, lr=LR, clip_val=1.0, gacc=None, decay=1.0, l2=L2
        )
        return (t,), None

    def u_sorted(c, k):
        (t,) = c
        ids = jax.random.randint(k, (B,), 0, U, dtype=jnp.int32)
        t, _ = _apply_row_updates_sorted(
            t, ids, g_u, lr=LR, clip_val=1.0, gacc=None, decay=1.0, l2=L2,
            writeback=wb,
        )
        return (t,), None

    scan_time("user: dense (set + acc + touched + pass)", u_dense, (user_t,), keys, base)
    scan_time("user: sorted (ONE fused set scatter)", u_sorted, (user_t,), keys, base)

    # --- item table: update only ---
    def i_dense(c, k):
        (t,) = c
        ids = jax.random.randint(k, (B + T,), 0, I, dtype=jnp.int32)
        t, _ = _apply_row_updates_dense(
            t, ids, g_i, lr=LR, clip_val=1.0, gacc=None, decay=1.0, l2=L2
        )
        return (t,), None

    def i_sorted(c, k):
        (t,) = c
        ids = jax.random.randint(k, (B + T,), 0, I, dtype=jnp.int32)
        t, _ = _apply_row_updates_sorted(
            t, ids, g_i, lr=LR, clip_val=1.0, gacc=None, decay=1.0, l2=L2
        )
        return (t,), None

    scan_time("item: dense (acc + touched + pass)", i_dense, (item_t,), keys, base)
    scan_time("item: sorted (add scatter)", i_sorted, (item_t,), keys, base)


if __name__ == "__main__":
    main()
