"""Preset registry tests (ref driver defaults: eval_ssd_network.py:45-60,
eval_ron_network.py:64-90)."""

import pytest

from ron_tensorflow_tpu.config import EvalConfig, TrainConfig, load_config
from ron_tensorflow_tpu.presets import get_preset


def test_eval_presets_match_reference_defaults():
    ron = get_preset("eval", "ron_320")
    assert (ron.select_threshold, ron.select_top_k, ron.keep_top_k) == (0.01, 200, 100)
    assert ron.objectness_threshold == 0.03

    ssd = get_preset("eval", "ssd_300")
    assert ssd.model == "ssd_300_vgg"
    # ref: eval_ssd_network.py:45-56
    assert (ssd.select_threshold, ssd.select_top_k, ssd.keep_top_k) == (0.01, 400, 200)
    assert ssd.nms_threshold == 0.45
    assert ssd.matching_threshold == 0.5
    assert ssd.objectness_threshold == 0.0  # SSD has no objectness prior
    assert ssd.resize == "WARP_RESIZE"

    assert get_preset("eval", "ssd_512").model == "ssd_512_vgg"


def test_train_presets():
    assert get_preset("train", "ron_320") == TrainConfig()
    ssd = get_preset("train", "ssd_300")
    assert ssd.model == "ssd_300_vgg"
    assert ssd.match.positive_threshold == 0.5


def test_unknown_preset():
    with pytest.raises(KeyError):
        get_preset("eval", "yolo_9000")


def test_overrides_apply_on_top_of_preset():
    cfg = load_config(
        EvalConfig,
        overrides=["keep_top_k=64"],
        base=get_preset("eval", "ssd_300"),
    )
    assert cfg.model == "ssd_300_vgg" and cfg.keep_top_k == 64
