"""Attribute exact-mode step time (uniform sampler, his_refresh=step, f32).

Measures, each inside one jitted lax.scan with per-iteration xs (the box's
tunnel dispatch costs ~25-40 ms per CALL and XLA hoists constant-fed ops,
so per-op timing lies — see .claude/skills/verify/SKILL.md):

  a) the (B, H) history row gather alone,
  b) gather + masked mean (the aggr_f phase),
  c) gather + mean at bf16 table dtype (traffic halves if bandwidth-bound),
  d) a (B*H,) flat gather of the same row count (layout control),
  e) the (B, K) negative row gather (uniform ids),
  f) B-row user + pos gathers.

Run: python scripts/profile_exact_gather.py  (real TPU, ~2 min)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from heat_tpu.models.aggregator import history_mean

U, I, D, H, B, K = 52_643, 91_599, 64, 100, 8192, 16
STEPS = 400


def timed(name, fn, *args):
    # ONE jitted callable for both warm-up and the timed run — a fresh
    # jax.jit wrapper for the timed call would retrace (and on an
    # executable-cache miss recompile) the 400-step scan inside the
    # measured window.
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    t0 = time.perf_counter()
    out = jfn(*args)
    _ = float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:34s} {dt * 1e3:8.3f} ms/step")
    return dt


def main():
    rng = np.random.default_rng(0)
    item = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
    item_bf = item.astype(jnp.bfloat16)
    his = jnp.asarray(rng.integers(0, I, (U, H)).astype(np.int32))
    masks = jnp.asarray(rng.integers(1, H + 1, (U,)).astype(np.int32))
    users = jnp.asarray(rng.integers(0, U, (STEPS, B)).astype(np.int32))
    negs = jnp.asarray(rng.integers(0, I, (STEPS, B, K)).astype(np.int32))

    def scan_over(f):
        def run(*tables):
            def body(c, xs):
                r = f(xs, *tables)
                return c + jnp.sum(r.astype(jnp.float32)), None

            out, _ = jax.lax.scan(body, jnp.float32(0), users)
            return out

        return run

    def g_his(u_b, it, hi):
        return it[hi[u_b]].sum(axis=(1, 2))

    timed("(B,H) history gather f32", scan_over(g_his), item, his)

    def g_mean(u_b, it, hi, ms):
        return history_mean(it[hi[u_b]], ms[u_b])

    timed("gather + masked mean f32", scan_over(g_mean), item, his, masks)
    timed(
        "gather + masked mean bf16", scan_over(g_mean), item_bf, his, masks
    )

    def g_flat(u_b, it, hi):
        ids = hi[u_b].reshape(-1)
        return it[ids].sum(axis=1)

    timed("(B*H,) flat gather f32", scan_over(g_flat), item, his)

    def run_negs(it):
        def body(c, xs):
            return c + jnp.sum(it[xs].astype(jnp.float32)), None

        out, _ = jax.lax.scan(body, jnp.float32(0), negs)
        return out

    timed("(B,K) negative gather f32", run_negs, item)

    def g_up(u_b, it):
        return it[u_b % I].sum(axis=1)

    timed("(B,) row gather f32", scan_over(g_up), item)


def variants():
    rng = np.random.default_rng(0)
    item = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
    his = jnp.asarray(rng.integers(0, I, (U, H)).astype(np.int32))
    masks = jnp.asarray(rng.integers(1, H + 1, (U,)).astype(np.int32))
    users = jnp.asarray(rng.integers(0, U, (STEPS, B)).astype(np.int32))

    def scan_over(f):
        def run(*tables):
            def body(c, xs):
                r = f(xs, *tables)
                return c + jnp.sum(r.astype(jnp.float32)), None

            out, _ = jax.lax.scan(body, jnp.float32(0), users)
            return out

        return run

    def mean_vpu(u_b, it, hi, ms):
        rows = it[hi[u_b]]  # (B, H, D) f32
        m = ms[u_b]
        valid = (
            jnp.arange(H, dtype=m.dtype)[None, :] < m[:, None]
        ).astype(rows.dtype)
        total = jnp.sum(rows * valid[:, :, None], axis=1)
        return total / jnp.maximum(m.astype(rows.dtype), 1.0)[:, None]

    timed("mean via VPU mul+sum f32", scan_over(mean_vpu), item, his, masks)

    def mean_where(u_b, it, hi, ms):
        rows = it[hi[u_b]]
        m = ms[u_b]
        valid = jnp.arange(H, dtype=m.dtype)[None, :] < m[:, None]
        total = jnp.sum(
            jnp.where(valid[:, :, None], rows, 0.0), axis=1
        )
        return total / jnp.maximum(m.astype(rows.dtype), 1.0)[:, None]

    timed("mean via where+sum f32", scan_over(mean_where), item, his, masks)

    def mean_mxu_pref(u_b, it, hi, ms):
        rows = it[hi[u_b]]
        m = ms[u_b]
        valid = (
            jnp.arange(H, dtype=m.dtype)[None, :] < m[:, None]
        ).astype(rows.dtype)
        total = jnp.einsum(
            "bhd,bh->bd", rows, valid,
            preferred_element_type=jnp.float32,
        )
        return total / jnp.maximum(m.astype(jnp.float32), 1.0)[:, None]

    timed(
        "mean via einsum DEFAULT f32(!)",
        scan_over(mean_mxu_pref), item, his, masks,
    )



if __name__ == "__main__":
    import sys

    if "--variants" in sys.argv:
        variants()
    else:
        main()
