"""Both row-update implementations (dense-accumulator and sort-dedup) must
implement identical semantics — duplicates summed then clipped, padding
dropped, accum decay on touched rows only."""

import jax.numpy as jnp
import numpy as np
import pytest

from heat_tpu.train.scatter import (
    _apply_row_updates_dense,
    _apply_row_updates_sorted,
    segment_sum_by_id,
)


def _random_case(seed, rows=50, d=8, m=64, with_pad=True):
    rng = np.random.default_rng(seed)
    table = rng.normal(size=(rows, d)).astype(np.float32)
    ids = rng.integers(0, rows, m).astype(np.int32)
    if with_pad:
        ids[m // 2 :] = np.where(
            rng.random(m - m // 2) < 0.3, rows, ids[m // 2 :]
        )  # some drop sentinels
    grads = rng.normal(size=(m, d)).astype(np.float32) * 0.3
    gacc = rng.normal(size=(rows, d)).astype(np.float32) * 0.1
    return table, ids, grads, gacc


def test_segment_sum_by_id():
    ids = jnp.asarray([3, 1, 3, 7, 1], jnp.int32)
    vals = jnp.asarray([[1.0], [2.0], [10.0], [4.0], [20.0]])
    rep, summed = segment_sum_by_id(ids, vals, 10)
    out = np.zeros((10, 1))
    r, s = np.asarray(rep), np.asarray(summed)
    for i in range(len(r)):
        if r[i] < 10:
            out[r[i]] += s[i]
    np.testing.assert_allclose(out[1], [22.0])
    np.testing.assert_allclose(out[3], [11.0])
    np.testing.assert_allclose(out[7], [4.0])


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("accum", [False, True])
@pytest.mark.parametrize("l2", [0.0, 0.01])
def test_dense_and_sorted_paths_agree(seed, accum, l2):
    table, ids, grads, gacc = _random_case(seed)
    kwargs = dict(
        lr=jnp.float32(0.1),
        clip_val=0.25,  # binds often -> exercises clip-after-sum semantics
        gacc=jnp.asarray(gacc) if accum else None,
        decay=0.4,
        l2=l2,
    )
    td, gd = _apply_row_updates_dense(
        jnp.asarray(table), jnp.asarray(ids), jnp.asarray(grads), **kwargs
    )
    kwargs["gacc"] = jnp.asarray(gacc) if accum else None
    ts, gs = _apply_row_updates_sorted(
        jnp.asarray(table), jnp.asarray(ids), jnp.asarray(grads), **kwargs
    )
    np.testing.assert_allclose(np.asarray(td), np.asarray(ts), rtol=2e-5, atol=1e-6)
    if accum:
        np.testing.assert_allclose(
            np.asarray(gd), np.asarray(gs), rtol=2e-5, atol=1e-6
        )


def test_padding_ids_dropped():
    table, ids, grads, _ = _random_case(5, with_pad=False)
    rows = table.shape[0]
    all_pad = np.full_like(ids, rows)
    td, _ = _apply_row_updates_dense(
        jnp.asarray(table),
        jnp.asarray(all_pad),
        jnp.asarray(grads),
        lr=jnp.float32(0.1),
        clip_val=1.0,
        gacc=None,
        decay=1.0,
        l2=0.0,
    )
    np.testing.assert_array_equal(np.asarray(td), table)
