"""Backbone zoo smoke tests (shapes + finite outputs, small inputs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_inception_v3_forward():
    from ron_tensorflow_tpu.models.zoo import InceptionV3

    m = InceptionV3(num_classes=10)
    x = jnp.zeros((1, 96, 96, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    logits, eps = m.apply(v, x)
    assert logits.shape == (1, 10)
    assert np.isfinite(np.asarray(logits)).all()
    assert eps["mixed_7c"].shape[-1] == 2048


@pytest.mark.slow
def test_xception_forward():
    from ron_tensorflow_tpu.models.zoo import Xception

    m = Xception(num_classes=10, middle_blocks=2)
    x = jnp.zeros((1, 96, 96, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    logits, eps = m.apply(v, x)
    assert logits.shape == (1, 10)
    assert eps["exit"].shape[-1] == 2048


@pytest.mark.slow
def test_inception_resnet_v2_forward():
    from ron_tensorflow_tpu.models.zoo import InceptionResnetV2

    m = InceptionResnetV2(num_classes=10, blocks35=1, blocks17=1, blocks8=1)
    x = jnp.zeros((1, 96, 96, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    logits, eps = m.apply(v, x)
    assert logits.shape == (1, 10)
    assert eps["conv7b"].shape[-1] == 1536
