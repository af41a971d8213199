"""Pair-packed RMW row layout at huge-table geometry: the measurement
(VERDICT r3 item 2 — the round-3 wave-off, now numbers-backed).

Three candidate schemes to cut the huge-table step's dominant per-row
scatter issue cost (~83-89 ns/row at (16M, 128) bf16, DESIGN.md 2c-bis):

  a) pair-packed physical rows: store the table as (N/2, 256) so one
     descriptor covers two logical rows; updates place their 128-wide
     increment in the correct half (zero other half) and scatter at
     ids // 2;
  b) the ceiling for (a): updates arriving PRE-PAIRED (B/2 physical-row
     descriptors) — reachable only if update ids shared physical rows,
     which random id streams do not (expected collisions B^2/2(N/2) ~ 64
     of 32768);
  c) one unified scatter for both tables (user rows stacked above item
     rows in a 22M-row array) — merges the user and item updates' issue
     streams into one scatter of 2B rows.

Run: python scripts/profile_pair_packed.py   (real TPU, ~6 min)

Measured 2026-08-21 (v5e, 200-iter donated scans): see DESIGN.md 2c-ter —
(a) 100.9 ns/logical row (WORSE: same descriptor count, double payload),
(b) 59.0 ns/logical row (1.5x, unreachable), (c) 120.5 ns/row vs 82.1
for two separate scatters (two scatters pipeline better than one big
one). All negative; the (N, 128) per-row scatter stands as the floor.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N, D, B, I2 = 16_000_000, 128, 32768, 6_000_000
ITERS = 200


def scan_time(name, body, carry_fn, rows, iters=ITERS):
    fn = jax.jit(
        lambda c, ks: jax.lax.scan(body, c, ks), donate_argnums=(0,)
    )
    keys = jax.random.split(jax.random.key(1), iters)
    out = fn(carry_fn(), keys)
    _ = float(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32))
    del out
    c2 = carry_fn()
    t0 = time.perf_counter()
    out = fn(c2, keys)
    _ = float(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    del out
    print(f"{name:48s} {dt*1e3:7.3f} ms  {dt/rows*1e9:6.1f} ns/row")


def main() -> None:
    key = jax.random.key(0)
    upd = jax.random.normal(key, (B, 128), jnp.bfloat16)

    def body_base(t, k):
        ids = jax.random.randint(k, (B,), 0, N, dtype=jnp.int32)
        return t.at[ids].add(upd), ids[0].astype(jnp.float32)

    scan_time(
        "(16M,128) scatter-add, B rows (baseline)",
        body_base,
        lambda: jax.random.normal(key, (N, D), jnp.bfloat16),
        B,
    )

    def body_packed(t, k):
        ids = jax.random.randint(k, (B,), 0, N, dtype=jnp.int32)
        half = (ids % 2).astype(jnp.bool_)
        lo = jnp.where(half[:, None], jnp.zeros_like(upd), upd)
        hi = jnp.where(half[:, None], upd, jnp.zeros_like(upd))
        u = jnp.concatenate([lo, hi], axis=1)
        return t.at[ids // 2].add(u), ids[0].astype(jnp.float32)

    scan_time(
        "(8M,256) pair-packed, B logical rows",
        body_packed,
        lambda: jax.random.normal(key, (N // 2, 256), jnp.bfloat16),
        B,
    )

    updp = jax.random.normal(key, (B // 2, 256), jnp.bfloat16)

    def body_prepaired(t, k):
        ids = jax.random.randint(k, (B // 2,), 0, N // 2, dtype=jnp.int32)
        return t.at[ids].add(updp), ids[0].astype(jnp.float32)

    scan_time(
        "(8M,256) pre-paired ceiling, B/2 descriptors",
        body_prepaired,
        lambda: jax.random.normal(key, (N // 2, 256), jnp.bfloat16),
        B,  # per LOGICAL row
    )

    def body_two(c, k):
        t1, t2 = c
        i1 = jax.random.randint(k, (B,), 0, N, dtype=jnp.int32)
        i2 = jax.random.randint(k, (B,), 0, I2, dtype=jnp.int32)
        return (
            (t1.at[i1].add(upd), t2.at[i2].add(upd)),
            i1[0].astype(jnp.float32),
        )

    scan_time(
        "two tables, two scatters of B rows",
        body_two,
        lambda: (
            jax.random.normal(key, (N, D), jnp.bfloat16),
            jax.random.normal(key, (I2, D), jnp.bfloat16),
        ),
        2 * B,
    )

    upd2 = jax.random.normal(key, (2 * B, 128), jnp.bfloat16)

    def body_unified(t, k):
        i1 = jax.random.randint(k, (B,), 0, N, dtype=jnp.int32)
        i2 = jax.random.randint(k, (B,), 0, I2, dtype=jnp.int32) + N
        ids = jnp.concatenate([i1, i2])
        return t.at[ids].add(upd2), ids[0].astype(jnp.float32)

    scan_time(
        "unified 22M table, ONE scatter of 2B rows",
        body_unified,
        lambda: jax.random.normal(key, (N + I2, D), jnp.bfloat16),
        2 * B,
    )


if __name__ == "__main__":
    main()
