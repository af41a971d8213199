"""Dataset parsing, history construction, and user-range sharding."""

import numpy as np

from heat_tpu.data.datasets import ClickDataset, shard_by_user_range
from heat_tpu.data.synthetic import synthetic_click_dataset


def test_parse_file(tmp_path):
    p = tmp_path / "train.txt"
    p.write_text("0 5 3 9\n1 2\n2 7 7 1\n")
    ds = ClickDataset.from_file(str(p), max_his=4, use_native=False)
    assert ds.num_users == 3
    assert ds.num_items == 10
    assert ds.train_size == 7
    np.testing.assert_array_equal(
        ds.pairs,
        [[0, 5], [0, 3], [0, 9], [1, 2], [2, 7], [2, 7], [2, 1]],
    )


def test_history_padding_semantics():
    # n < max_his: pad by repeating the last item (datasets.py:51-55).
    ds = ClickDataset.from_user_items(
        [[5, 3], [], [1, 2, 3, 4, 6]], max_his=4
    )
    np.testing.assert_array_equal(ds.his_items[0], [5, 3, 3, 3])
    assert ds.masks[0] == 2
    # empty: zeros, mask 0 (datasets.py:56-60).
    np.testing.assert_array_equal(ds.his_items[1], [0, 0, 0, 0])
    assert ds.masks[1] == 0
    # n >= max_his: a random sample of the items, mask = max_his.
    assert ds.masks[2] == 4
    assert set(ds.his_items[2]) <= {1, 2, 3, 4, 6}
    assert len(set(ds.his_items[2])) == 4  # sampled without replacement


def test_shard_by_user_range_rebases_ids():
    ds = ClickDataset.from_user_items(
        [[0], [1], [2], [3], [4]], max_his=2, num_items=10
    )
    s0 = shard_by_user_range(ds, 2, 0)
    s1 = shard_by_user_range(ds, 2, 1)
    # 5 users over 2 shards -> [0,3) and [3,5) (main.py:51-57 arithmetic).
    assert s0.num_users == 3 and s1.num_users == 2
    np.testing.assert_array_equal(s0.pairs[:, 0], [0, 1, 2])
    np.testing.assert_array_equal(s1.pairs[:, 0], [0, 1])  # re-based
    np.testing.assert_array_equal(s1.pairs[:, 1], [3, 4])
    # item space inherited globally (datasets.py:159).
    assert s1.num_items == 10


def test_binary_cache_roundtrip(tmp_path):
    ds = ClickDataset.from_user_items(
        [[5, 3], [], [1, 2, 3, 4, 6]], max_his=4, num_items=10
    )
    p = str(tmp_path / "cache.npz")
    ds.save(p)
    back = ClickDataset.load(p)
    np.testing.assert_array_equal(back.pairs, ds.pairs)
    np.testing.assert_array_equal(back.his_items, ds.his_items)
    np.testing.assert_array_equal(back.masks, ds.masks)
    assert back.num_items == 10 and back.max_his == 4
    assert [list(x) for x in back.user_items] == [
        list(x) for x in ds.user_items
    ]


def test_synthetic_dataset_shapes():
    train, test = synthetic_click_dataset(
        num_users=50, num_items=200, clicks_per_user=12, max_his=8, seed=3
    )
    assert train.num_users == 50
    assert train.num_items == 200
    assert train.pairs.shape[1] == 2
    assert train.his_items.shape == (50, 8)
    # every user has at least one test item
    assert all(len(t) >= 1 for t in test.user_items)
    # train/test disjoint per user
    for tr, te in zip(train.user_items, test.user_items):
        assert not (set(tr) & set(te))
