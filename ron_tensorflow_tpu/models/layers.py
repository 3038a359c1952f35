"""Shared NN building blocks (flax.linen, NHWC).

TPU-native equivalents of the reference's slim layer conventions
(ref: nets/ron_vgg_320.py:595-629 `ron_arg_scope`,
nets/custom_layers.py:67-137 `l2_normalization`):

- conv + optional BatchNorm + ReLU, with slim's rule that a normalizer
  disables the conv bias;
- BatchNorm with decay 0.997, eps 1e-5, scale=True, computed in float32
  regardless of the activation dtype (bf16-safe);
- Xavier (glorot uniform) weight init, zero bias init.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

BN_MOMENTUM = 0.997  # ref: nets/ron_vgg_320.py:618 (decay)
BN_EPSILON = 1e-5  # ref: nets/ron_vgg_320.py:619

# Train-time BN fast path: statistics (mean/var/running stats) stay f32, but
# the normalize itself runs as a fused scale/shift in the activation dtype.
# With bf16 activations this avoids materializing an f32 copy of every
# conv output (the f32 cast is fused into the mean/var reductions instead),
# halving the BN's HBM traffic in both fwd and bwd. Off by default — flip
# with `set_bn_fast_normalize(True)` (used by TrainConfig.bn_fast_normalize).
_BN_FAST_NORMALIZE = False


def set_bn_fast_normalize(enabled: bool) -> None:
    global _BN_FAST_NORMALIZE
    _BN_FAST_NORMALIZE = bool(enabled)


class BatchNorm(nn.Module):
    """float32 BatchNorm wrapper (stats and affine in f32, cast back).

    Matches slim.batch_norm(decay=0.997, epsilon=1e-5, scale=True)
    (ref: nets/ron_vgg_320.py:616-624). Cross-replica behaviour: under
    pjit/GSPMD the batch mean/var reduce over the *global* batch, i.e.
    sync-BN — a documented improvement over the reference's per-tower BN.
    """

    use_running_average: bool = True
    axis_name: Optional[str] = None
    # Defaults = the RON arg scope; the inception-family zoo overrides
    # epsilon to 1e-3 (slim inception and torchvision both use 0.001).
    epsilon: float = BN_EPSILON
    momentum: float = BN_MOMENTUM

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )

        if self.use_running_average or self.is_initializing():
            # Inference: one fused scale/shift in the activation dtype so XLA
            # keeps the conv->BN->ReLU chain in bf16 (an f32 round-trip here
            # splits the fusion and doubles HBM traffic).
            s = scale / jnp.sqrt(ra_var.value + self.epsilon)
            b = bias - ra_mean.value * s
            return x * s.astype(orig_dtype) + b.astype(orig_dtype)

        # Training: f32 statistics. Under pjit/GSPMD the reduction spans the
        # global batch (sync-BN); with an explicit axis_name (shard_map),
        # pmean across it.
        x32 = x.astype(jnp.float32)
        axes = tuple(range(x32.ndim - 1))
        mean = jnp.mean(x32, axes)
        mean2 = jnp.mean(x32 * x32, axes)
        if self.axis_name is not None:
            import jax

            mean = jax.lax.pmean(mean, self.axis_name)
            mean2 = jax.lax.pmean(mean2, self.axis_name)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
        ra_var.value = self.momentum * ra_var.value + (1.0 - self.momentum) * var
        if _BN_FAST_NORMALIZE and orig_dtype != jnp.float32:
            # Fused scale/shift in the activation dtype (stats above remain
            # f32 — the x32 cast fuses into the reductions, so no f32 copy
            # of the activations ever reaches HBM).
            s = scale / jnp.sqrt(var + self.epsilon)
            b = bias - mean * s
            return x * s.astype(orig_dtype) + b.astype(orig_dtype)
        y = (x32 - mean) / jnp.sqrt(var + self.epsilon) * scale + bias
        return y.astype(orig_dtype)


class Conv(nn.Module):
    """slim.conv2d equivalent: conv [+ BN] [+ activation].

    With `norm=True` the bias is dropped (slim drops bias when a
    normalizer_fn is set). Defaults mirror the reference arg scope:
    ReLU activation, SAME padding, Xavier init
    (ref: nets/ron_vgg_320.py:595-614).
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    norm: bool = False
    act: Optional[Callable] = nn.relu
    padding: str = "SAME"
    train: bool = False
    dtype: Dtype = jnp.float32
    bn_epsilon: float = BN_EPSILON

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            features=self.features,
            kernel_size=self.kernel,
            strides=self.strides,
            kernel_dilation=self.dilation,
            padding=self.padding,
            use_bias=not self.norm,
            kernel_init=nn.initializers.glorot_uniform(),
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.norm:
            x = BatchNorm(
                use_running_average=not self.train,
                epsilon=self.bn_epsilon,
                name="bn",
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class ConvTranspose(nn.Module):
    """slim.conv2d_transpose equivalent (deconv + bias + activation, no BN
    per the reference's reverse module, ref: nets/ron_vgg_320.py:424-425).

    For the 2x2/stride-2 case (the only one RON uses) the transposed conv is
    lowered MXU-natively as one [C, 4*O] matmul + pixel-shuffle interleave —
    each output pixel (2y+dy, 2x+dx) is exactly W[dy, dx] @ in[y, x] —
    instead of XLA's input-dilated convolution, which wastes 3/4 of its MACs
    on inserted zeros. Parameters stay in the standard flax ConvTranspose
    [kh, kw, in, out] layout so checkpoints are interchangeable.
    """

    features: int
    kernel: Tuple[int, int] = (2, 2)
    strides: Tuple[int, int] = (2, 2)
    act: Optional[Callable] = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.kernel == (2, 2) and self.strides == (2, 2):
            b, h, w, c = x.shape
            kernel = self.param(
                "deconv_kernel",
                nn.initializers.glorot_uniform(),
                (2, 2, c, self.features),
                jnp.float32,
            )
            bias = self.param(
                "deconv_bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
            )
            # Flip taps so the stored [2,2,in,out] kernel is numerically
            # identical to flax ConvTranspose's convention (verified exact).
            kmat = (
                kernel.astype(self.dtype)[::-1, ::-1]
                .transpose(2, 0, 1, 3)
                .reshape(c, 4 * self.features)
            )
            y = x @ kmat  # [B, H, W, 4*O] — one big MXU matmul
            y = y.reshape(b, h, w, 2, 2, self.features)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, self.features)
            y = y + bias.astype(self.dtype)
        else:
            y = nn.ConvTranspose(
                features=self.features,
                kernel_size=self.kernel,
                strides=self.strides,
                padding="SAME",
                use_bias=True,
                kernel_init=nn.initializers.glorot_uniform(),
                bias_init=nn.initializers.zeros_init(),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="deconv",
            )(x)
        if self.act is not None:
            y = self.act(y)
        return y


def max_pool_2x2(x):
    """2x2/stride-2 SAME max pool (slim.max_pool2d of the VGG blocks)."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2), padding="SAME")


class L2Normalization(nn.Module):
    """Channel-wise L2 normalization with learnable per-channel scale
    (ref: nets/custom_layers.py:67-137; used by SSD block4 with init 20,
    ref: nets/ssd_vgg_300.py:446-450)."""

    scale_init: float = 1.0

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True) + 1e-12)
        out = x32 / norm
        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.scale_init),
            (x.shape[-1],),
            jnp.float32,
        )
        return (out * gamma).astype(orig_dtype)


def pad2d(x, pad: Sequence[int] = (0, 0)):
    """Symmetric spatial zero pad (ref: nets/custom_layers.py:139-164)."""
    return jnp.pad(x, ((0, 0), (pad[0], pad[0]), (pad[1], pad[1]), (0, 0)))
