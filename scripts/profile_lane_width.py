"""Physical minor-width 64 vs 128 for bf16 tables: gather/scatter costs.

profile_scatter_hints.py found (N, 128) bf16 scatter-set runs 83 ns/row vs
(N, 64)'s 179 at 16M rows — half-lane rows serialize worse than full
sublanes, and lane padding makes both layouts cost 256 B/row at rest
anyway. This sweeps the remaining ops at both widths and both scales to
decide whether tables should be physically padded to 128 columns
(CFConfig.emb_pad).

Run: python scripts/profile_lane_width.py  (real TPU, ~5 min)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

ITERS = 100


def scan_time(name, body, carry_fn, nrows, iters=ITERS):
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
    print(
        f"{name:52s} {dt * 1e3:8.3f} ms/step ({dt / nrows * 1e9:6.1f} ns/row)"
    )
    del out
    return dt


def sweep(rows, b, label):
    for d in (64, 128):
        payload = jnp.full((b, d), 0.001, jnp.bfloat16)
        paystack = None

        def table(d=d):
            return jnp.zeros((rows, d), jnp.bfloat16)

        def ids_of(k):
            return jax.random.randint(k, (b,), 0, rows, dtype=jnp.int32)

        def g(carry, k):
            return carry, carry[ids_of(k)].astype(jnp.float32).ravel()[0]

        def s_set(carry, k, payload=payload):
            return carry.at[ids_of(k)].set(payload, mode="drop"), ()

        def s_add(carry, k, payload=payload):
            return carry.at[ids_of(k)].add(payload, mode="drop"), ()

        tag = f"[{label} d={d}]"
        scan_time(f"gather {tag}", g, table, b)
        scan_time(f"scatter-set {tag}", s_set, table, b)
        scan_time(f"scatter-add {tag}", s_add, table, b)


def main() -> None:
    sweep(16 * 1024 * 1024, 32 * 1024, "16M rows, B=32k")
    sweep(91_599, 8_192, "91.6k rows, B=8k")


if __name__ == "__main__":
    main()
