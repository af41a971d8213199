"""Pallas gather kernels, interpreter mode (CPU-runnable).

The production gather path is XLA (see ops/pallas/gather.py docstring for
the measured comparison); these tests keep the kernels verified-correct.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heat_tpu.ops.pallas.gather import gather_rows, history_mean_gather


def test_gather_rows_interpret():
    k = jax.random.key(0)
    table = jax.random.normal(k, (300, 128), jnp.float32)
    ids = jax.random.randint(k, (1500,), 0, 300, dtype=jnp.int32)
    out = gather_rows(table, ids, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(table)[np.asarray(ids)]
    )


def test_history_mean_gather_interpret():
    k = jax.random.key(1)
    table = jax.random.normal(k, (200, 128), jnp.float32)
    his = jax.random.randint(k, (20, 7), 0, 200, dtype=jnp.int32)
    mask = jax.random.randint(k, (20,), 0, 8, dtype=jnp.int32)
    got = np.asarray(history_mean_gather(table, his, mask, interpret=True))
    tn, hn, mn = np.asarray(table), np.asarray(his), np.asarray(mask)
    want = np.zeros((20, 128), np.float32)
    for b in range(20):
        if mn[b] > 0:
            want[b] = tn[hn[b, : mn[b]]].mean(0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_scatter_add_rows_interpret():
    from heat_tpu.ops.pallas.scatter import scatter_add_rows

    rng = np.random.default_rng(3)
    n, d, m = 400, 128, 200
    table = rng.normal(size=(n, d)).astype(np.float32)
    ids = rng.choice(n, size=m, replace=False).astype(np.int32)  # unique
    deltas = rng.normal(size=(m, d)).astype(np.float32)
    # mix in padding rows (sentinel id == n, skipped by the kernel)
    ids_p = np.concatenate([ids, np.full(56, n, np.int32)])
    deltas_p = np.concatenate([deltas, np.zeros((56, d), np.float32)])
    got = np.asarray(
        scatter_add_rows(
            jnp.asarray(table),
            jnp.asarray(ids_p),
            jnp.asarray(deltas_p),
            interpret=True,
        )
    )
    want = table.copy()
    want[ids] += deltas
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_unsupported_dim_raises():
    table = jnp.zeros((10, 64), jnp.float32)
    ids = jnp.zeros((4,), jnp.int32)
    with pytest.raises(ValueError, match="d % 128"):
        gather_rows(table, ids, interpret=True)
