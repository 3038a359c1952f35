"""Factory registry tests."""

import pytest

from ron_tensorflow_tpu.data.factory import get_dataset, get_preprocessing
from ron_tensorflow_tpu.models import get_network


def test_get_preprocessing():
    cfg = get_preprocessing("ron_320_vgg")
    assert cfg.out_shape == (320, 320)
    cfg2 = get_preprocessing("ssd_300_vgg", out_shape=(128, 128))
    assert cfg2.out_shape == (128, 128)
    with pytest.raises(ValueError, match="unknown preprocessing"):
        get_preprocessing("nope")


def test_get_dataset_errors(tmp_path):
    with pytest.raises(ValueError, match="unknown dataset"):
        get_dataset("nope", "train", str(tmp_path))
    with pytest.raises(ValueError, match="unknown split"):
        get_dataset("pascalvoc_2007", "val", str(tmp_path))
    with pytest.raises(FileNotFoundError):
        get_dataset("pascalvoc_2007", "train", str(tmp_path))


def test_get_dataset_resolves(tmp_path):
    (tmp_path / "voc_2007_train_000.tfrecord").write_bytes(b"")
    (tmp_path / "voc_2007_train_001.tfrecord").write_bytes(b"")
    info, files = get_dataset("pascalvoc_2007", "train", str(tmp_path))
    assert info.num_samples == 5011
    assert len(files) == 2
    _, files_w0 = get_dataset("pascalvoc_2007", "train", str(tmp_path), 2, 0)
    assert len(files_w0) == 1


def test_network_registry_names():
    for name in ("ron_320_vgg", "ron_320_vgg_heavy", "ssd_300_vgg", "ssd_512_vgg", "ron_tiny_vgg"):
        model, spec = get_network(name)
        assert spec.num_classes == 21


def test_vgg_zoo_variants():
    import jax
    import jax.numpy as jnp

    from ron_tensorflow_tpu.models.vgg import VGGBackbone

    for depth, n_params_blocks in (("vgg_a", 1), ("vgg_19", 4)):
        m = VGGBackbone(depth=depth)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        names = set(v["params"])
        if depth == "vgg_a":
            assert "conv1_1" in names and "conv1_2" not in names
        else:
            assert "conv3_4" in names
