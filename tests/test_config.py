"""Config system tests: overrides, JSON loading, nested dataclasses."""

import json

import pytest

from ron_tensorflow_tpu.config import (
    EvalConfig,
    TrainConfig,
    apply_overrides,
    config_to_dict,
    load_config,
)


def test_defaults_match_reference_recipe():
    cfg = TrainConfig()
    # BASELINE.md training recipe
    assert cfg.data.batch_size == 14
    assert cfg.optimizer.learning_rate == 1e-3
    assert cfg.optimizer.momentum == 0.9
    assert cfg.optimizer.weight_decay == 5e-4
    assert cfg.match.positive_threshold == 0.56
    assert cfg.match.ignore_threshold == 0.3
    assert cfg.loss.objectness_threshold == 0.03
    assert cfg.loss.alpha == pytest.approx(1 / 3)
    assert cfg.loss.beta == pytest.approx(1 / 5)
    assert cfg.optimizer.lr_boundaries == (90000, 115000)


def test_override_nested():
    cfg = apply_overrides(TrainConfig(), ["data.batch_size=32", "optimizer.learning_rate=0.01"])
    assert cfg.data.batch_size == 32
    assert cfg.optimizer.learning_rate == 0.01


def test_override_unknown_raises():
    with pytest.raises(KeyError):
        apply_overrides(TrainConfig(), ["data.nonexistent=1"])


def test_load_from_json(tmp_path):
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps({"model": "ssd_300_vgg", "data": {"batch_size": 8}}))
    cfg = load_config(TrainConfig, str(path), ["max_steps=100"])
    assert cfg.model == "ssd_300_vgg"
    assert cfg.data.batch_size == 8
    assert cfg.max_steps == 100


def test_config_to_dict_roundtrippable():
    d = config_to_dict(EvalConfig())
    assert d["select_threshold"] == 0.01
    assert d["data"]["split_name"] == "test"
