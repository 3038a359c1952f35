"""Exactness tests for the polyphase space-to-depth block-1 stem
(models/vgg.py s2d_block1) — the TPU MXU fix for the channel-starved VGG
stem (ref: nets/ron_vgg_320.py:530-533 conv1 x2 + pool1).

The transform is a pure reindexing of the same parameters, so forward AND
parameter gradients must match the plain layer composition to float
accumulation noise, and a checkpoint trained either way must load in the
other."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ron_tensorflow_tpu.models.vgg import (
    VGG16Backbone,
    _phase_output_kernel,
    s2d_block1,
    s2d_stem_supported,
)


def _plain_block1(x, w1, b1, w2, b2):
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.nn.relu(
        jax.lax.conv_general_dilated(x, w1, (1, 1), "SAME", dimension_numbers=dn) + b1
    )
    y = jax.nn.relu(
        jax.lax.conv_general_dilated(y, w2, (1, 1), "SAME", dimension_numbers=dn) + b2
    )
    return nn.max_pool(y, (2, 2), (2, 2), "SAME")


def _rand_block1_params(rng, cin=3, c=8):
    w1 = jnp.asarray(rng.normal(size=(3, 3, cin, c)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    return w1, b1, w2, b2


@pytest.mark.parametrize("hw", [(20, 20), (12, 16), (6, 6)])
def test_s2d_block1_exact(rng, hw):
    h, w = hw
    x = jnp.asarray(rng.normal(size=(2, h, w, 3)), jnp.float32)
    params = _rand_block1_params(rng)
    ref = _plain_block1(x, *params)
    got = s2d_block1(x, *params)
    assert got.shape == ref.shape == (2, (h + 1) // 2, (w + 1) // 2, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_phase_output_kernel_structure(rng):
    """K[a, b, :, (2p+q)C+o] = w[a-p, b-q] (zero outside [0,3))."""
    w = jnp.asarray(rng.normal(size=(3, 3, 2, 5)), jnp.float32)
    k = np.asarray(_phase_output_kernel(w))
    assert k.shape == (4, 4, 2, 20)
    wn = np.asarray(w)
    for p in range(2):
        for q in range(2):
            blk = k[:, :, :, (2 * p + q) * 5 : (2 * p + q + 1) * 5]
            for a in range(4):
                for b in range(4):
                    if 0 <= a - p < 3 and 0 <= b - q < 3:
                        np.testing.assert_array_equal(blk[a, b], wn[a - p, b - q])
                    else:
                        np.testing.assert_array_equal(blk[a, b], 0.0)


def test_s2d_block1_grad_parity(rng):
    """Parameter gradients must agree — the transform is trained through."""
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 3)), jnp.float32)
    params = _rand_block1_params(rng)

    def loss_plain(ps):
        return jnp.sum(jnp.sin(_plain_block1(x, *ps)))

    def loss_s2d(ps):
        return jnp.sum(jnp.sin(s2d_block1(x, *ps)))

    g_plain = jax.grad(loss_plain)(params)
    g_s2d = jax.grad(loss_s2d)(params)
    for a, b in zip(g_plain, g_s2d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_backbone_s2d_flag_parity(rng):
    """Same param tree, same endpoints (minus the unmaterialized block1)."""
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    plain = VGG16Backbone(variant="reduced")
    s2d = VGG16Backbone(variant="reduced", s2d_stem=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    ref = plain.apply(variables, x)
    got = s2d.apply(variables, x)  # identical tree: no re-init needed
    assert set(got) == set(ref) - {"block1"}
    for k in got:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-4, atol=1e-4
        )
    # and the reverse direction: params initialized under the s2d flag load
    # into the plain path
    variables2 = s2d.init(jax.random.PRNGKey(1), x)
    jax.tree.map(lambda a, b: None, variables["params"], variables2["params"])


def test_s2d_stem_guards():
    assert s2d_stem_supported(320, 320)
    assert s2d_stem_supported(300, 300)
    assert not s2d_stem_supported(321, 320)
    with pytest.raises(AssertionError):
        VGG16Backbone(s2d_stem=True, fuse_block1=True).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3))
        )


def test_ron_s2d_forward_parity(rng):
    """RON flag flip on an initialized tree changes nothing numerically."""
    from ron_tensorflow_tpu.models.ron import RON, RON_320_SPEC

    model = RON(spec=RON_320_SPEC, backbone_variant="reduced")
    x = jnp.asarray(rng.normal(size=(1, 320, 320, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = model.apply(variables, x, train=False)
    got = model.clone(s2d_stem=True).apply(variables, x, train=False)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_backbone_remat12_parity(rng):
    """remat_blocks12: same param tree, same forward (endpoints minus the
    unmaterialized block1/block2), same parameter gradients — remat must be
    a pure scheduling change."""
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    plain = VGG16Backbone(variant="reduced")
    remat = VGG16Backbone(variant="reduced", remat_blocks12=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    variables2 = remat.init(jax.random.PRNGKey(0), x)
    jax.tree.map(lambda a, b: None, variables["params"], variables2["params"])
    ref = plain.apply(variables, x)
    got = remat.apply(variables, x)
    assert set(got) == set(ref) - {"block1", "block2"}
    for k in got:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-5, atol=1e-5
        )

    common = set(got)  # grads over the endpoints both paths emit

    def loss_of(model):
        return lambda p: sum(
            jnp.sum(v**2)
            for k, v in model.apply({"params": p}, x).items()
            if k in common
        )

    g_ref = jax.grad(loss_of(plain))(variables["params"])
    g_got = jax.grad(loss_of(remat))(variables["params"])
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_remat12_guards():
    with pytest.raises(AssertionError):
        VGG16Backbone(remat_blocks12=True, fuse_block1=True).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3))
        )
