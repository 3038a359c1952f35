"""Train-step tests: loss decreases on a fixed batch; sharded DP+TP step
runs on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ron_tensorflow_tpu.losses import RonLossConfig
from ron_tensorflow_tpu.models.ron import RON
from ron_tensorflow_tpu.models.testing import RON_TINY_SPEC
from ron_tensorflow_tpu.ops.encode import TargetEncoder
from ron_tensorflow_tpu.parallel import make_mesh, partition_batch, partition_params
from ron_tensorflow_tpu.train import (
    OptimizerConfig,
    create_train_state,
    make_optimizer,
    make_train_step,
)
from jax.sharding import NamedSharding, PartitionSpec as P


def tiny_setup(batch=2, ema=False):
    spec = RON_TINY_SPEC
    model = RON(spec=spec)
    encoder = TargetEncoder(spec.anchor_layout(), spec.img_shape, 0.5, 0.3)
    cfg = OptimizerConfig(optimizer="momentum", learning_rate=0.01, weight_decay=1e-4,
                          learning_rate_decay_type="fixed")
    tx = make_optimizer(cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (batch, *spec.img_shape, 3), tx, ema=ema
    )
    rng = np.random.default_rng(0)
    batch_data = {
        "image": jnp.asarray(rng.normal(0, 1, (batch, *spec.img_shape, 3)), jnp.float32),
        "gt_labels": jnp.asarray(rng.integers(1, 21, (batch, 4)), jnp.int32),
        "gt_boxes": jnp.asarray(
            np.stack(
                [
                    np.stack(
                        [
                            np.full(4, 0.2) + 0.05 * np.arange(4),
                            np.full(4, 0.2),
                            np.full(4, 0.6) + 0.05 * np.arange(4),
                            np.full(4, 0.7),
                        ],
                        -1,
                    )
                    for _ in range(batch)
                ]
            ),
            jnp.float32,
        ),
        "gt_valid": jnp.ones((batch, 4), bool),
    }
    return model, encoder, tx, state, batch_data


@pytest.mark.slow
def test_loss_decreases_on_fixed_batch():
    model, encoder, tx, state, batch = tiny_setup()
    step = jax.jit(make_train_step(model, encoder, tx, RonLossConfig()))
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))  # fixed rng: deterministic sampling
        losses.append(float(metrics["loss/total"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


@pytest.mark.slow
def test_batch_stats_update():
    model, encoder, tx, state, batch = tiny_setup()
    step = jax.jit(make_train_step(model, encoder, tx))
    bs_before = jax.tree.leaves(state.batch_stats)[0].copy()
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    bs_after = jax.tree.leaves(state.batch_stats)[0]
    assert not np.allclose(np.asarray(bs_before), np.asarray(bs_after))


@pytest.mark.slow
def test_ema_tracks_params():
    model, encoder, tx, state, batch = tiny_setup(ema=True)
    step = jax.jit(make_train_step(model, encoder, tx, ema_decay=0.9))
    state2, _ = step(state, batch, jax.random.PRNGKey(0))
    p = jax.tree.leaves(state2.params)[0]
    e = jax.tree.leaves(state2.ema_params)[0]
    p0 = jax.tree.leaves(state.params)[0]
    np.testing.assert_allclose(np.asarray(e), 0.9 * np.asarray(p0) + 0.1 * np.asarray(p), atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_train_step_cpu_mesh(mesh_shape):
    """Full DP(+TP) train step over the virtual 8-device mesh."""
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    model, encoder, tx, state, batch = tiny_setup(batch=8)
    mesh = make_mesh(mesh_shape)

    param_shards = partition_params(state.params, mesh)
    state_shards = state.replace(
        step=NamedSharding(mesh, P()),
        params=param_shards,
        batch_stats=jax.tree.map(lambda _: NamedSharding(mesh, P()), state.batch_stats),
        opt_state=jax.tree.map(
            lambda _: NamedSharding(mesh, P()), state.opt_state
        ),
        ema_params=None,
    )
    batch_shards = partition_batch(batch, mesh)

    state = jax.device_put(state, state_shards)
    batch = jax.device_put(batch, batch_shards)

    step = jax.jit(
        make_train_step(model, encoder, tx),
        in_shardings=(state_shards, batch_shards, NamedSharding(mesh, P())),
    )
    rng = jax.device_put(jax.random.PRNGKey(0), NamedSharding(mesh, P()))
    new_state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["loss/total"]))
    assert int(new_state.step) == 1
    # Params stay sharded per the rules.
    if mesh_shape[1] > 1:
        fc7 = new_state.params["backbone"]["fc7"]["conv"]["kernel"]
        assert fc7.sharding.spec == P(None, None, None, "model")


def test_bn_fast_normalize_matches_f32_path():
    """bn_fast keeps f32 statistics; outputs deviate only at bf16 noise
    level (see models/layers.py set_bn_fast_normalize)."""
    from ron_tensorflow_tpu.models import layers

    spec = RON_TINY_SPEC
    model = RON(spec=spec, dtype=jnp.bfloat16)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, *spec.img_shape, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def fwd():
        return model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )

    try:
        layers.set_bn_fast_normalize(False)
        out_f32, _ = fwd()
        layers.set_bn_fast_normalize(True)
        out_fast, _ = fwd()
    finally:
        layers.set_bn_fast_normalize(False)

    d = float(jnp.max(jnp.abs(out_f32.predictions - out_fast.predictions)))
    assert d < 0.05, f"bn_fast drifted beyond bf16 noise: {d}"
    # f32 activations: flag must be a no-op (identical program)
    model32 = RON(spec=spec)
    v32 = model32.init(jax.random.PRNGKey(0), x, train=False)
    try:
        layers.set_bn_fast_normalize(True)
        a, _ = model32.apply(v32, x, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)})
    finally:
        layers.set_bn_fast_normalize(False)
    b, _ = model32.apply(v32, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert jnp.array_equal(a.logits, b.logits)
