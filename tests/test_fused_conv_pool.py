"""Parity tests for the experimental fused conv+ReLU+pool Pallas kernels
(interpret mode) against the XLA reference composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from ron_tensorflow_tpu.kernels import fused_conv3x3_relu_pool2, fused_stem_conv_relu_pool2


def xla_reference(x, w, b):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = jax.nn.relu(y + b)
    return nn.max_pool(y.astype(jnp.float32), (2, 2), (2, 2), "SAME")


@pytest.mark.parametrize("fn", [fused_conv3x3_relu_pool2, fused_stem_conv_relu_pool2])
def test_fused_kernel_parity_interpret(fn):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 8)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    ref = xla_reference(x, w, b)
    out = fn(x, w, b, interpret=True)
    assert out.shape == ref.shape == (2, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


@pytest.mark.parametrize("shape,cin", [((2, 16, 16), 3), ((1, 64, 8), 3), ((1, 16, 16), 8)])
def test_fused_block1_parity_interpret(shape, cin):
    # (1, 64, 8) splits into two 32-row tiles — covers the inter-tile halo;
    # cin=8 covers the rectangular first conv (the block-2 configuration).
    from ron_tensorflow_tpu.kernels import fused_vgg_block1

    rng = np.random.default_rng(2)
    c = 8
    x = jnp.asarray(rng.normal(size=(*shape, cin)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, cin, c)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)

    def conv(x, w, b):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jax.nn.relu(y + b)

    ref = nn.max_pool(
        conv(conv(x, w1, b1), w2, b2).astype(jnp.float32), (2, 2), (2, 2), "SAME"
    )
    out = fused_vgg_block1(x, w1, b1, w2, b2, interpret=True)
    assert out.shape == ref.shape == (shape[0], shape[1] // 2, shape[2] // 2, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2, rtol=1e-2)


def test_fused_block1_custom_vjp_grads():
    """The recompute custom VJP's gradients match autodiff through the XLA
    composition (the backward IS that composition's vjp; the only difference
    is the forward primal, which is within kernel-parity noise)."""
    from ron_tensorflow_tpu.kernels import fused_vgg_block1
    from ron_tensorflow_tpu.kernels.fused_conv_pool import _block1_xla_reference

    rng = np.random.default_rng(7)
    c = 8
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, c)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)

    def loss_fused(args):
        return jnp.sum(fused_vgg_block1(*args, interpret=True) ** 2).astype(jnp.float32)

    def loss_ref(args):
        return jnp.sum(_block1_xla_reference(*args) ** 2).astype(jnp.float32)

    g_fused = jax.grad(loss_fused)((x, w1, b1, w2, b2))
    g_ref = jax.grad(loss_ref)((x, w1, b1, w2, b2))
    for gf, gr, name in zip(g_fused, g_ref, ("x", "w1", "b1", "w2", "b2")):
        assert gf.dtype == gr.dtype, name
        np.testing.assert_allclose(
            np.asarray(gf, np.float32), np.asarray(gr, np.float32),
            atol=0.35, rtol=0.05, err_msg=name,
        )


def test_fuse_block1_train_step_runs():
    """A jitted grad step through RON(fuse_block1=True) runs and produces
    finite param grads with the same tree as the unfused model."""
    from ron_tensorflow_tpu.models.ron import RON
    from ron_tensorflow_tpu.models.testing import RON_TINY_SPEC

    model = RON(spec=RON_TINY_SPEC)
    x = jnp.asarray(np.random.default_rng(9).normal(size=(1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    fused = model.clone(fuse_block1=True)

    def loss(m):
        def f(params):
            out, _ = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return jnp.sum(out.logits[0].astype(jnp.float32) ** 2)

        return jax.jit(jax.grad(f))(variables["params"])

    g_base = loss(model)
    g_fused = loss(fused)
    assert jax.tree.structure(g_base) == jax.tree.structure(g_fused)
    flat = jax.tree.leaves(g_fused)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    # block-1 weight grads point the same way at the same scale (the fused
    # forward computes in bf16, so exact equality vs the f32 composition is
    # not expected — direction/magnitude agreement is the contract)
    gb = np.asarray(g_base["backbone"]["conv1_1"]["conv"]["kernel"]).ravel()
    gf = np.asarray(g_fused["backbone"]["conv1_1"]["conv"]["kernel"]).ravel()
    cos = float(gf @ gb / (np.linalg.norm(gf) * np.linalg.norm(gb)))
    assert cos > 0.98, cos
    ratio = float(np.linalg.norm(gf) / np.linalg.norm(gb))
    assert 0.8 < ratio < 1.25, ratio


def test_fuse_block1_model_flag_shares_params():
    """RON(fuse_block1=True) consumes the SAME variables as the layer
    composition and produces matching outputs (the checkpoint-compat
    contract of the fused path)."""
    from ron_tensorflow_tpu.models.ron import RON
    from ron_tensorflow_tpu.models.testing import RON_TINY_SPEC

    model = RON(spec=RON_TINY_SPEC)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    base = model.apply(variables, x, train=False)
    fused = model.clone(fuse_block1=True).apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(fused.logits), np.asarray(base.logits), atol=0.1, rtol=0.05
    )


def test_fused_kernel_rect_channels():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 16)) * 0.1, jnp.float32)
    b = jnp.zeros((16,), jnp.float32)
    ref = xla_reference(x, w, b)
    out = fused_conv3x3_relu_pool2(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)
