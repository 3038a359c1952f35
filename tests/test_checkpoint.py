"""Checkpoint / warm-start tests: orbax save-restore round trip, scope
exclusion + renaming, torch VGG import mapping, inspector."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ron_tensorflow_tpu.train.checkpoint import (
    CheckpointManager,
    flatten_params,
    inspect_params,
    torch_vgg_to_flat,
    unflatten_params,
    warm_start_params,
)


def small_params():
    return {
        "backbone": {
            "conv1_1": {"conv": {"kernel": np.zeros((3, 3, 3, 4), np.float32),
                                 "bias": np.zeros((4,), np.float32)}},
            "fc6": {"conv": {"kernel": np.zeros((3, 3, 4, 8), np.float32),
                             "bias": np.zeros((8,), np.float32)}},
        },
        "block7_reverse": {"conv_left": {"conv": {"kernel": np.zeros((2, 2, 8, 8), np.float32)}}},
    }


def test_flatten_roundtrip():
    p = small_params()
    flat = flatten_params(p)
    assert "backbone/conv1_1/conv/kernel" in flat
    back = unflatten_params(flat)
    assert np.asarray(back["backbone"]["fc6"]["conv"]["bias"]).shape == (8,)


def test_warm_start_exclude_and_rename():
    p = small_params()
    src = {
        "vgg_16/conv1_1/conv/kernel": np.ones((3, 3, 3, 4), np.float32),
        "vgg_16/conv1_1/conv/bias": np.ones((4,), np.float32),
        "vgg_16/fc6/conv/kernel": np.full((3, 3, 4, 8), 2.0, np.float32),
        "vgg_16/block7_reverse_should_not_match": np.zeros(1),
    }
    out = warm_start_params(
        p,
        src,
        exclude_scopes=("block7_reverse",),  # ref: reverse_module exclusion
        rename_map={"backbone": "vgg_16"},
        verbose=False,
    )
    np.testing.assert_allclose(out["backbone"]["conv1_1"]["conv"]["kernel"], 1.0)
    np.testing.assert_allclose(out["backbone"]["fc6"]["conv"]["kernel"], 2.0)
    # fc6 bias missing in source -> stays at init (ignore_missing)
    np.testing.assert_allclose(out["backbone"]["fc6"]["conv"]["bias"], 0.0)
    # excluded scope untouched
    np.testing.assert_allclose(out["block7_reverse"]["conv_left"]["conv"]["kernel"], 0.0)


def test_warm_start_shape_mismatch_raises():
    p = small_params()
    src = {"backbone/conv1_1/conv/kernel": np.zeros((1, 1, 3, 4), np.float32)}
    with pytest.raises(ValueError, match="shape mismatch"):
        warm_start_params(p, src, verbose=False)


def test_torch_vgg_mapping():
    rng = np.random.default_rng(0)
    sd = {
        "features.0.weight": rng.normal(size=(64, 3, 3, 3)).astype(np.float32),
        "features.0.bias": np.zeros(64, np.float32),
        "features.2.weight": rng.normal(size=(64, 64, 3, 3)).astype(np.float32),
        "features.2.bias": np.zeros(64, np.float32),
    }
    flat = torch_vgg_to_flat(sd, bgr_to_rgb=True)
    k = flat["backbone/conv1_1/conv/kernel"]
    assert k.shape == (3, 3, 3, 64)  # HWIO
    # BGR->RGB flip on first conv input channels
    np.testing.assert_allclose(
        k[..., 0, :], np.transpose(sd["features.0.weight"], (2, 3, 1, 0))[..., 2, :]
    )
    assert flat["backbone/conv1_2/conv/kernel"].shape == (3, 3, 64, 64)


def test_torch_vgg_mapping_unprefixed_for_ssd_trees():
    """SSD trees keep VGG convs at top level (no 'backbone' scope) — the
    importers must emit unprefixed keys so warm start actually restores
    (regression: SSD warm start restored 0 tensors)."""
    rng = np.random.default_rng(0)
    sd = {
        "features.0.weight": rng.normal(size=(64, 3, 3, 3)).astype(np.float32),
        "features.0.bias": np.zeros(64, np.float32),
    }
    flat = torch_vgg_to_flat(sd, backbone_prefix="")
    assert set(flat) == {"conv1_1/conv/kernel", "conv1_1/conv/bias"}
    # and they overlay onto an SSD-shaped tree
    ssd_like = {
        "conv1_1": {"conv": {"kernel": np.zeros((3, 3, 3, 64), np.float32),
                             "bias": np.zeros((64,), np.float32)}},
        "block8": {"conv1x1": {"conv": {"kernel": np.zeros((1, 1, 64, 4), np.float32)}}},
    }
    out = warm_start_params(ssd_like, flat, verbose=False)
    assert np.abs(out["conv1_1"]["conv"]["kernel"]).sum() > 0


def test_trainer_warm_start_prefix_detection(tmp_path):
    """Trainer._warm_start aims the torch importer at the model's actual
    VGG scope: 'backbone' for RON trees, top level for SSD trees."""
    import torch

    from ron_tensorflow_tpu.config import TrainConfig, apply_overrides
    from ron_tensorflow_tpu.train.trainer import Trainer

    sd = {
        "features.0.weight": torch.randn(64, 3, 3, 3),
        "features.0.bias": torch.zeros(64),
    }
    ckpt = str(tmp_path / "vgg_stub.pth")
    torch.save(sd, ckpt)

    for model_name, path in (
        ("ssd_300_vgg", ("conv1_1",)),
        ("ron_320_vgg", ("backbone", "conv1_1")),
    ):
        cfg = apply_overrides(
            TrainConfig(),
            [f"model={model_name}", f"checkpoint_path={ckpt}",
             "checkpoint_format=torch", f"model_dir={tmp_path}/m_{model_name}"],
        )
        tr = Trainer(cfg)
        params = jax.tree.map(
            lambda s: np.zeros(s.shape, s.dtype),
            jax.eval_shape(
                lambda tr=tr: tr.model.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, *tr.spec.img_shape, 3)),
                    train=False,
                )
            )["params"],
        )
        out = tr._warm_start(params)
        node = out
        for k in path:
            node = node[k]
        assert np.abs(np.asarray(node["conv"]["kernel"])).sum() > 0, model_name


@pytest.mark.slow
def test_orbax_roundtrip(tmp_path):
    from ron_tensorflow_tpu.models.ron import RON
    from ron_tensorflow_tpu.models.testing import RON_TINY_SPEC
    from ron_tensorflow_tpu.train import OptimizerConfig, create_train_state, make_optimizer

    model = RON(spec=RON_TINY_SPEC)
    tx = make_optimizer(OptimizerConfig(learning_rate_decay_type="fixed"))
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3), tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    assert not mgr.has_checkpoint()
    mgr.save(7, state)
    mgr.wait()
    assert mgr.latest_step() == 7

    # restore into a freshly initialized state
    state2 = create_train_state(model, jax.random.PRNGKey(1), (1, 64, 64, 3), tx)
    restored = mgr.restore(state2)
    assert int(restored.step) == 7
    k1 = jax.tree.leaves(state.params)[0]
    k2 = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2))


def test_inspect_params():
    lines = inspect_params(small_params(), pattern="fc6")
    assert len(lines) == 2
    assert "backbone/fc6/conv/kernel" in lines[1] or "backbone/fc6/conv/kernel" in lines[0]
