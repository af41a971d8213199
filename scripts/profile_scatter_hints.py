"""Do XLA's unique_indices / indices_are_sorted hints change scatter cost?

The sorted-dedup update path guarantees BOTH properties for its final row
scatter (one representative index per unique id, ascending) — if XLA can
exploit them the ~180 ns/row latency-serialized scatter could vectorize.
Also checks gather with indices_are_sorted, and payload-width scaling
(64 vs 128 columns: is cost per-row or per-byte at this scale?).

Run: python scripts/profile_scatter_hints.py  (real TPU, ~4 min)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

ROWS = 16 * 1024 * 1024
B = 32 * 1024
ITERS = 100


def scan_time(name, body, carry_fn, iters=ITERS):
    fn = jax.jit(lambda c, ks: jax.lax.scan(body, c, ks), donate_argnums=0)
    keys = jax.random.split(jax.random.key(1), iters)
    out = fn(carry_fn(), keys)
    _ = float(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32))
    del out
    c2 = carry_fn()
    jax.block_until_ready(c2)
    t0 = time.perf_counter()
    out = fn(c2, keys)
    _ = float(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt * 1e3:8.2f} ms/step ({dt / B * 1e9:6.1f} ns/row)")
    del out
    return dt


def main() -> None:
    for d, dt in ((64, jnp.bfloat16), (128, jnp.bfloat16), (64, jnp.float32)):
        payload = jnp.full((B, d), 0.001, dt)

        def table(d=d, dt=dt):
            return jnp.zeros((ROWS, d), dt)

        def ids_of(k):
            return jnp.sort(
                jax.random.randint(k, (B,), 0, ROWS, dtype=jnp.int32)
            )

        def s_plain(carry, k, payload=payload):
            return carry.at[ids_of(k)].set(payload, mode="drop"), ()

        def s_hinted(carry, k, payload=payload):
            return (
                carry.at[ids_of(k)].set(
                    payload, mode="drop", unique_indices=True,
                    indices_are_sorted=True,
                ),
                (),
            )

        def g_hinted(carry, k):
            r = carry.at[ids_of(k)].get(
                mode="drop", indices_are_sorted=True
            )
            return carry, r.astype(jnp.float32).ravel()[0]

        tag = f"(d={d}, {jnp.dtype(dt).name})"
        scan_time(f"scatter-set plain {tag}", s_plain, table)
        scan_time(f"scatter-set sorted+unique hints {tag}", s_hinted, table)
        if d == 64:
            scan_time(f"gather sorted hint {tag}", g_hinted, table)


if __name__ == "__main__":
    main()
