"""SSD model tests: anchor counts, forward shapes, loss integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ron_tensorflow_tpu.models.ssd import SSD, SSD_300_SPEC, SSD_512_SPEC
from ron_tensorflow_tpu.ops import anchors


def test_ssd300_anchor_count():
    layout = SSD_300_SPEC.anchor_layout()
    # per-cell: 4,6,6,6,4,4 anchors
    expected = 38 * 38 * 4 + 19 * 19 * 6 + 10 * 10 * 6 + 5 * 5 * 6 + 3 * 3 * 4 + 1 * 4
    assert layout.num_anchors == expected == 8732


def test_ssd512_anchor_count():
    layout = SSD_512_SPEC.anchor_layout()
    expected = (
        64 * 64 * 4 + 32 * 32 * 6 + 16 * 16 * 6 + 8 * 8 * 6 + 4 * 4 * 6 + 2 * 2 * 4 + 1 * 4
    )
    assert layout.num_anchors == expected


def test_ssd_anchor_hw_family():
    h, w = anchors.ssd_anchor_heights_widths((300, 300), (21.0, 45.0), (2.0, 0.5))
    np.testing.assert_allclose(h[0], 21 / 300, rtol=1e-6)
    np.testing.assert_allclose(h[1], np.sqrt(21 * 45) / 300, rtol=1e-6)
    np.testing.assert_allclose(h[2], 21 / 300 / np.sqrt(2), rtol=1e-6)
    np.testing.assert_allclose(w[2], 21 / 300 * np.sqrt(2), rtol=1e-6)


@pytest.mark.slow
def test_ssd300_forward_shapes():
    model = SSD(spec=SSD_300_SPEC)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 300, 300, 3))
    variables = model.init(rng, img, train=False)
    out = model.apply(variables, img, train=False)
    assert out.logits.shape == (1, 8732, 21)
    assert out.locations.shape == (1, 8732, 4)
    # SSD objectness is constant 1 -> pipelines shared with RON
    np.testing.assert_allclose(np.asarray(out.objness_pred), 1.0)
    # L2Norm param exists on block4 head with scale init 20
    gamma = variables["params"]["block4_box"]["l2_norm"]["gamma"]
    np.testing.assert_allclose(np.asarray(gamma), 20.0)


@pytest.mark.slow
def test_ssd300_loss_integration():
    from ron_tensorflow_tpu.losses import ssd_losses
    from ron_tensorflow_tpu.ops.encode import TargetEncoder

    model = SSD(spec=SSD_300_SPEC)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, 300, 300, 3))
    variables = model.init(rng, img, train=False)
    out = model.apply(variables, img, train=False)

    enc = TargetEncoder(SSD_300_SPEC.anchor_layout(), SSD_300_SPEC.img_shape, 0.5, 0.3)
    t = enc.batched(
        jnp.array([[12, 0]]),
        jnp.array([[[0.2, 0.2, 0.7, 0.7], [0, 0, 0, 0]]]),
        jnp.array([[True, False]]),
    )
    total, metrics = ssd_losses(out.logits, out.locations, t.labels, t.locations, t.scores)
    assert np.isfinite(float(total)) and float(total) > 0
