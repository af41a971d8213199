"""Measure a hypothetical "direct" update: scatter-add per-occurrence
-lr*g bf16 increments straight into the bf16 table (no f32 accumulator,
no touched mask, no dense pass). Semantics differ from the reference
(clip applies per occurrence, rounding per occurrence) — this script only
answers whether the speed is worth evaluating that trade.

Usage: python scripts/profile_direct_update.py   (real chip)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from heat_tpu.train.scatter import _apply_row_updates_dense

U, I, D, B, T = 52_643, 91_599, 64, 8192, 512
N = 200
REPS = 3
LR = jnp.float32(0.01)


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

    base = scan_time("empty scan", base_body, (item_t,), keys)

    def i_dense(c, k):
        (t,) = c
        ids = jax.random.randint(k, (B + T,), 0, I, dtype=jnp.int32)
        t, _ = _apply_row_updates_dense(
            t, ids, g_i, lr=LR, clip_val=1.0, gacc=None, decay=1.0, l2=1e-7
        )
        return (t,), None

    def i_direct(c, k):
        (t,) = c
        ids = jax.random.randint(k, (B + T,), 0, I, dtype=jnp.int32)
        inc = (-LR * jnp.clip(g_i, -1.0, 1.0)).astype(t.dtype)
        return (t.at[ids].add(inc),), None

    scan_time("item: dense f32-acc path", i_dense, (item_t,), keys, base)
    scan_time("item: direct bf16 scatter-add", i_direct, (item_t,), keys, base)

    def u_dense(c, k):
        (t,) = c
        ids = jax.random.randint(k, (B,), 0, U, dtype=jnp.int32)
        t = t.at[ids].set(wb.astype(t.dtype))
        t, _ = _apply_row_updates_dense(
            t, ids, g_u, lr=LR, clip_val=1.0, gacc=None, decay=1.0, l2=1e-7
        )
        return (t,), None

    def u_direct(c, k):
        (t,) = c
        ids = jax.random.randint(k, (B,), 0, U, dtype=jnp.int32)
        t = t.at[ids].set(wb.astype(t.dtype))
        inc = (-LR * jnp.clip(g_u, -1.0, 1.0)).astype(t.dtype)
        return (t.at[ids].add(inc),), None

    scan_time("user: set + dense f32-acc path", u_dense, (user_t,), keys, base)
    scan_time("user: set + direct bf16 scatter-add", u_direct, (user_t,), keys, base)


if __name__ == "__main__":
    main()
