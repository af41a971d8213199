"""Config system: reference-schema YAML loading, key mapping, validation."""

import pytest

from heat_tpu.config import CFConfig, config_from_dicts, load_config


def test_load_reference_format_configs():
    for name in ("AmazonBooks", "Yelp18", "Gowalla", "Synthetic100M"):
        cfg, ds = load_config(f"benchmarks/{name}/config0.yaml")
        assert cfg.emb_dim in (64, 128)
        assert cfg.l_r == pytest.approx(1e-2)
        assert ds.train_data == "train.txt"
        assert cfg.metrics  # parsed list


def test_amazonbooks_values_match_reference():
    cfg, _ = load_config("benchmarks/AmazonBooks/config0.yaml")
    # cf/benchmarks/AmazonBooks/MF_CCL/configs/config0.yaml values
    assert cfg.emb_dim == 64
    assert cfg.num_negs == 16
    assert cfg.max_his == 100
    assert cfg.tile_size == 512
    assert cfg.refresh_interval == 8192
    assert cfg.clip_val == 1.0
    assert cfg.l2 == pytest.approx(1e-7)
    assert cfg.milestones == [10]
    assert cfg.epochs == 5
    assert cfg.eval_interval == 2
    assert cfg.seed == 2022
    assert cfg.loss == "PairwiseLogisticLoss"


def test_unknown_key_raises():
    with pytest.raises(KeyError, match="bogus"):
        config_from_dicts({"bogus": 1})


def test_reference_subepoch_spelling_accepted():
    cfg = config_from_dicts({"num_subepoches": 3})
    assert cfg.num_subepochs == 3


def test_invalid_values_raise():
    with pytest.raises(ValueError):
        CFConfig(similarity="euclid")
    with pytest.raises(ValueError):
        CFConfig(sgd_mode="adam")
    with pytest.raises(ValueError):
        CFConfig(loss="MSE")
    with pytest.raises(ValueError):
        CFConfig(his_refresh="hourly")


def test_score_mul():
    assert CFConfig(temperature=0.07).score_mul == pytest.approx(1 / 0.07)


def test_overrides_accept_yaml_and_field_names():
    cfg = config_from_dicts(
        {"learning_rate": 0.01},
        overrides={"learning_rate": 0.5, "optimizer": "adam", "emb_dim": 32},
    )
    assert cfg.l_r == 0.5
    assert cfg.optimizer == "adam"
    assert cfg.emb_dim == 32


def test_ccl_parse_order_hazard_warns():
    """loss=CCL + shuffle_mode='none' is the measured collapse combination
    (DESIGN.md 6h) — constructing that config warns; the default shuffle
    does not."""
    import warnings

    from heat_tpu.config import CFConfig

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        CFConfig(loss="CosineContrastiveLoss", shuffle_mode="none")
    assert any("collapse" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        CFConfig(loss="CosineContrastiveLoss")
        CFConfig(shuffle_mode="none")
        # Sub-epoch mode re-buckets by item partition — the safe order.
        CFConfig(
            loss="CosineContrastiveLoss",
            shuffle_mode="none",
            num_subepochs=2,
        )
    assert not any("collapse" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        # visit_order='item' IS the measured-best CCL order — no hazard.
        CFConfig(
            loss="CosineContrastiveLoss",
            shuffle_mode="none",
            visit_order="item",
        )
    assert not any("collapse" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        # visit_order='user' forces exactly the collapsing order.
        CFConfig(
            loss="CosineContrastiveLoss",
            shuffle_mode="none",
            visit_order="user",
        )
    assert any("collapse" in str(x.message) for x in w)


def test_visit_order_validation():
    from heat_tpu.config import CFConfig

    import pytest

    with pytest.raises(ValueError, match="visit_order"):
        CFConfig(visit_order="zigzag")
