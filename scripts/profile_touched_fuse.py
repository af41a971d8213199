"""Measure: separate (B,d) grad + (B,1) touched scatters vs one fused
(B,d+1) scatter (65 columns pad to the same 128 lanes as 64 on TPU).

Attribution experiment for the dense-accumulator update path: if scatter
cost is per-index, fusing the touched column halves the index count of the
accumulation phase; if it is per-byte, the fusion is free but not a win.

Usage: python scripts/profile_touched_fuse.py   (real chip)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

U, I, D, B, T = 52_643, 91_599, 64, 8192, 512
N = 200  # scan iterations
REPS = 3


def scan_time(name, body, carry0, xs, baseline=0.0):
    @jax.jit
    def prog(carry, xs):
        carry, _ = jax.lax.scan(body, carry, xs)
        return carry

    out = prog(carry0, xs)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])  # sync (axon)
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = prog(carry0, xs)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"{name:44s} {best*1e3:8.4f} ms/iter  (-base {max(0, best-baseline)*1e3:8.4f})")
    return best


def main():
    key = jax.random.key(0)
    keys = jax.random.split(key, N)
    table = jax.random.normal(jax.random.key(1), (I, D), jnp.bfloat16)
    grads = jax.random.normal(jax.random.key(2), (B, D), jnp.float32)
    lr = jnp.float32(0.01)

    def ids_of(k):
        return jax.random.randint(k, (B,), 0, I, dtype=jnp.int32)

    # empty scan: dispatch+carry baseline
    def body_empty(c, k):
        return c, None

    base = scan_time("empty scan", body_empty, (table,), keys)

    # current: two scatters (grads + touched) then dense combine w/ l2
    def body_two(c, k):
        (t,) = c
        ids = ids_of(k)
        acc = jnp.zeros((I, D), jnp.float32).at[ids].add(grads)
        touched = (
            jnp.zeros((I, 1), jnp.float32)
            .at[ids]
            .add(jnp.ones((B, 1), jnp.float32))
        )
        touched = jnp.minimum(touched, 1.0)
        acc = acc + 1e-7 * t.astype(jnp.float32) * touched
        g = jnp.clip(acc, -1.0, 1.0)
        return (t - (lr * g).astype(t.dtype),), None

    two = scan_time("two scatters (grads + touched)", body_two, (table,), keys, base)

    # fused: one (B, D+1) scatter, slice counts out of the acc
    def body_fused(c, k):
        (t,) = c
        ids = ids_of(k)
        payload = jnp.concatenate(
            [grads, jnp.ones((B, 1), jnp.float32)], axis=1
        )
        acc = jnp.zeros((I, D + 1), jnp.float32).at[ids].add(payload)
        touched = jnp.minimum(acc[:, D:], 1.0)
        a = acc[:, :D] + 1e-7 * t.astype(jnp.float32) * touched
        g = jnp.clip(a, -1.0, 1.0)
        return (t - (lr * g).astype(t.dtype),), None

    fused = scan_time("fused (B, D+1) scatter", body_fused, (table,), keys, base)

    # no-touched reference: single (B, D) scatter + dense combine, no l2
    def body_one(c, k):
        (t,) = c
        ids = ids_of(k)
        acc = jnp.zeros((I, D), jnp.float32).at[ids].add(grads)
        g = jnp.clip(acc, -1.0, 1.0)
        return (t - (lr * g).astype(t.dtype),), None

    one = scan_time("single grad scatter (no l2/touched)", body_one, (table,), keys, base)

    # dense passes only (no scatter): attribution floor
    acc_const = jax.random.normal(jax.random.key(3), (I, D), jnp.float32)

    def body_dense(c, k):
        (t,) = c
        # depend on k so nothing hoists
        s = jax.random.uniform(k, ())
        g = jnp.clip(acc_const * s, -1.0, 1.0)
        return (t - (lr * g).astype(t.dtype),), None

    scan_time("dense passes only (const acc)", body_dense, (table,), keys, base)

    # scatter alone into fresh zeros (consumed by a cheap reduce)
    def body_scat(c, k):
        (t,) = c
        ids = ids_of(k)
        acc = jnp.zeros((I, D), jnp.float32).at[ids].add(grads)
        return (t + acc[:1].astype(t.dtype) * 0,), None

    scan_time("scatter-add alone (B rows)", body_scat, (table,), keys, base)

    print(f"\nfused vs two: {two/fused:.2f}x; single-scatter floor {one*1e3:.4f} ms")


if __name__ == "__main__":
    main()
