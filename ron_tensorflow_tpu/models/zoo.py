"""Classification backbone zoo: Inception-V3, Inception-ResNet-V2, Xception.

Parity with the reference's backbone zoo (ref: nets/inception_v3.py,
nets/inception_resnet_v2.py, nets/xception.py — present but unregistered for
detection, ref: nets/nets_factory.py:34-42). These are compact NHWC flax
implementations of the standard public architectures, TPU-friendly
(bf16-capable, BatchNorm in f32), usable as classifier backbones or future
detector feature extractors.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, Conv


class ConvBN(nn.Module):
    """conv + BN + ReLU, VALID/SAME selectable — the inception 'conv2d'."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            norm=True,
            train=self.train,
            dtype=self.dtype,
            # inception-family BN epsilon (slim inception_v3 arg scope and
            # torchvision BasicConv2d both use 0.001 — weight-import parity
            # depends on it)
            bn_epsilon=1e-3,
            name="conv",
        )(x)


def _pool(x, kind="max", window=(3, 3), strides=(1, 1), padding="SAME",
          count_include_pad=True):
    """count_include_pad only affects 'avg' with SAME padding: TF/keras/slim
    average pools EXCLUDE the padded zeros from the mean (pass False — the
    reference semantics, needed for keras weight parity), torchvision
    INCLUDES them (True — what the InceptionV3 torch import matches)."""
    if kind == "max":
        return nn.max_pool(x, window, strides, padding)
    return nn.avg_pool(x, window, strides, padding,
                       count_include_pad=count_include_pad)


class InceptionA(nn.Module):
    pool_features: int
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cb = lambda f, k, name: ConvBN(f, k, train=self.train, dtype=self.dtype, name=name)
        b0 = cb(64, (1, 1), "b0_1x1")(x)
        b1 = cb(48, (1, 1), "b1_1x1")(x)
        b1 = cb(64, (5, 5), "b1_5x5")(b1)
        b2 = cb(64, (1, 1), "b2_1x1")(x)
        b2 = cb(96, (3, 3), "b2_3x3a")(b2)
        b2 = cb(96, (3, 3), "b2_3x3b")(b2)
        b3 = _pool(x, "avg")
        b3 = cb(self.pool_features, (1, 1), "b3_1x1")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionB(nn.Module):
    """Grid reduction 35x35 -> 17x17."""

    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cb = lambda f, k, name, **kw: ConvBN(f, k, train=self.train, dtype=self.dtype, name=name, **kw)
        b0 = cb(384, (3, 3), "b0_3x3", strides=(2, 2), padding="VALID")(x)
        b1 = cb(64, (1, 1), "b1_1x1")(x)
        b1 = cb(96, (3, 3), "b1_3x3a")(b1)
        b1 = cb(96, (3, 3), "b1_3x3b", strides=(2, 2), padding="VALID")(b1)
        b2 = _pool(x, "max", strides=(2, 2), padding="VALID")
        return jnp.concatenate([b0, b1, b2], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        cb = lambda f, k, name: ConvBN(f, k, train=self.train, dtype=self.dtype, name=name)
        b0 = cb(192, (1, 1), "b0_1x1")(x)
        b1 = cb(c7, (1, 1), "b1_1x1")(x)
        b1 = cb(c7, (1, 7), "b1_1x7")(b1)
        b1 = cb(192, (7, 1), "b1_7x1")(b1)
        b2 = cb(c7, (1, 1), "b2_1x1")(x)
        b2 = cb(c7, (7, 1), "b2_7x1a")(b2)
        b2 = cb(c7, (1, 7), "b2_1x7a")(b2)
        b2 = cb(c7, (7, 1), "b2_7x1b")(b2)
        b2 = cb(192, (1, 7), "b2_1x7b")(b2)
        b3 = _pool(x, "avg")
        b3 = cb(192, (1, 1), "b3_1x1")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionD(nn.Module):
    """Grid reduction 17x17 -> 8x8."""

    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cb = lambda f, k, name, **kw: ConvBN(f, k, train=self.train, dtype=self.dtype, name=name, **kw)
        b0 = cb(192, (1, 1), "b0_1x1")(x)
        b0 = cb(320, (3, 3), "b0_3x3", strides=(2, 2), padding="VALID")(b0)
        b1 = cb(192, (1, 1), "b1_1x1")(x)
        b1 = cb(192, (1, 7), "b1_1x7")(b1)
        b1 = cb(192, (7, 1), "b1_7x1")(b1)
        b1 = cb(192, (3, 3), "b1_3x3", strides=(2, 2), padding="VALID")(b1)
        b2 = _pool(x, "max", strides=(2, 2), padding="VALID")
        return jnp.concatenate([b0, b1, b2], axis=-1)


class InceptionE(nn.Module):
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cb = lambda f, k, name: ConvBN(f, k, train=self.train, dtype=self.dtype, name=name)
        b0 = cb(320, (1, 1), "b0_1x1")(x)
        b1 = cb(384, (1, 1), "b1_1x1")(x)
        b1 = jnp.concatenate(
            [cb(384, (1, 3), "b1_1x3")(b1), cb(384, (3, 1), "b1_3x1")(b1)], axis=-1
        )
        b2 = cb(448, (1, 1), "b2_1x1")(x)
        b2 = cb(384, (3, 3), "b2_3x3")(b2)
        b2 = jnp.concatenate(
            [cb(384, (1, 3), "b2_1x3")(b2), cb(384, (3, 1), "b2_3x1")(b2)], axis=-1
        )
        b3 = _pool(x, "avg")
        b3 = cb(192, (1, 1), "b3_1x1")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV3(nn.Module):
    """Inception-V3 classifier (ref: nets/inception_v3.py)."""

    num_classes: int = 1001
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, Dict]:
        cb = lambda f, k, name, **kw: ConvBN(f, k, train=self.train, dtype=self.dtype, name=name, **kw)
        eps = {}
        x = cb(32, (3, 3), "stem1", strides=(2, 2), padding="VALID")(x)
        x = cb(32, (3, 3), "stem2", padding="VALID")(x)
        x = cb(64, (3, 3), "stem3")(x)
        x = _pool(x, "max", strides=(2, 2), padding="VALID")
        x = cb(80, (1, 1), "stem4", padding="VALID")(x)
        x = cb(192, (3, 3), "stem5", padding="VALID")(x)
        x = _pool(x, "max", strides=(2, 2), padding="VALID")
        eps["stem"] = x
        x = InceptionA(32, self.train, self.dtype, name="mixed_5b")(x)
        x = InceptionA(64, self.train, self.dtype, name="mixed_5c")(x)
        x = InceptionA(64, self.train, self.dtype, name="mixed_5d")(x)
        eps["mixed_5d"] = x
        x = InceptionB(self.train, self.dtype, name="mixed_6a")(x)
        x = InceptionC(128, self.train, self.dtype, name="mixed_6b")(x)
        x = InceptionC(160, self.train, self.dtype, name="mixed_6c")(x)
        x = InceptionC(160, self.train, self.dtype, name="mixed_6d")(x)
        x = InceptionC(192, self.train, self.dtype, name="mixed_6e")(x)
        eps["mixed_6e"] = x
        x = InceptionD(self.train, self.dtype, name="mixed_7a")(x)
        x = InceptionE(self.train, self.dtype, name="mixed_7b")(x)
        x = InceptionE(self.train, self.dtype, name="mixed_7c")(x)
        eps["mixed_7c"] = x
        x = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=jnp.float32,
                          name="logits")(x)
        return logits.astype(jnp.float32), eps


class SeparableConvBN(nn.Module):
    """Depthwise-separable conv + BN (the xception primitive)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Conv(
            c, self.kernel, strides=self.strides, padding="SAME",
            feature_group_count=c, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="depthwise",
        )(x)
        x = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="pointwise",
        )(x)
        return BatchNorm(use_running_average=not self.train, epsilon=1e-3, name="bn")(x)


class XceptionBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (2, 2)
    relu_first: bool = True
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = nn.Conv(
            self.features, (1, 1), strides=self.strides, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="shortcut",
        )(x)
        res = BatchNorm(use_running_average=not self.train, epsilon=1e-3, name="shortcut_bn")(res)
        y = x
        for i in range(2):
            if self.relu_first or i > 0:
                y = nn.relu(y)
            y = SeparableConvBN(self.features, train=self.train, dtype=self.dtype,
                                name=f"sep{i + 1}")(y)
        y = nn.max_pool(y, (3, 3), self.strides, "SAME")
        return y + res


class Xception(nn.Module):
    """Xception classifier (ref: nets/xception.py)."""

    num_classes: int = 1000
    middle_blocks: int = 8
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, Dict]:
        eps = {}
        x = ConvBN(32, (3, 3), strides=(2, 2), padding="VALID",
                   train=self.train, dtype=self.dtype, name="entry1")(x)
        x = ConvBN(64, (3, 3), padding="VALID", train=self.train,
                   dtype=self.dtype, name="entry2")(x)
        x = XceptionBlock(128, relu_first=False, train=self.train, dtype=self.dtype,
                          name="entry_block1")(x)
        x = XceptionBlock(256, train=self.train, dtype=self.dtype, name="entry_block2")(x)
        x = XceptionBlock(728, train=self.train, dtype=self.dtype, name="entry_block3")(x)
        eps["entry"] = x
        for i in range(self.middle_blocks):
            res = x
            y = x
            for j in range(3):
                y = nn.relu(y)
                y = SeparableConvBN(728, train=self.train, dtype=self.dtype,
                                    name=f"middle{i + 1}_sep{j + 1}")(y)
            x = y + res
        eps["middle"] = x
        res = nn.Conv(1024, (1, 1), strides=(2, 2), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="exit_shortcut")(x)
        res = BatchNorm(use_running_average=not self.train, epsilon=1e-3, name="exit_shortcut_bn")(res)
        y = nn.relu(x)
        y = SeparableConvBN(728, train=self.train, dtype=self.dtype, name="exit_sep1")(y)
        y = nn.relu(y)
        y = SeparableConvBN(1024, train=self.train, dtype=self.dtype, name="exit_sep2")(y)
        y = nn.max_pool(y, (3, 3), (2, 2), "SAME")
        x = y + res
        x = nn.relu(SeparableConvBN(1536, train=self.train, dtype=self.dtype, name="exit_sep3")(x))
        x = nn.relu(SeparableConvBN(2048, train=self.train, dtype=self.dtype, name="exit_sep4")(x))
        eps["exit"] = x
        x = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=jnp.float32,
                          name="logits")(x)
        return logits.astype(jnp.float32), eps


class InceptionResnetBlock(nn.Module):
    """Scaled residual inception block (block35/block17/block8 family).

    activation=False gives the FINAL block8 of the reference net — scale 1,
    no ReLU (ref: nets/inception_resnet_v2.py `block8(net,
    activation_fn=None)` after the 9 scaled repeats)."""

    kind: str  # 'block35' | 'block17' | 'block8'
    scale: float = 0.17
    train: bool = False
    dtype: Any = jnp.float32
    activation: bool = True

    @nn.compact
    def __call__(self, x):
        cb = lambda f, k, name: ConvBN(f, k, train=self.train, dtype=self.dtype, name=name)
        c = x.shape[-1]
        if self.kind == "block35":
            b0 = cb(32, (1, 1), "b0")(x)
            b1 = cb(32, (1, 1), "b1a")(x)
            b1 = cb(32, (3, 3), "b1b")(b1)
            b2 = cb(32, (1, 1), "b2a")(x)
            b2 = cb(48, (3, 3), "b2b")(b2)
            b2 = cb(64, (3, 3), "b2c")(b2)
            mixed = jnp.concatenate([b0, b1, b2], axis=-1)
        elif self.kind == "block17":
            b0 = cb(192, (1, 1), "b0")(x)
            b1 = cb(128, (1, 1), "b1a")(x)
            b1 = cb(160, (1, 7), "b1b")(b1)
            b1 = cb(192, (7, 1), "b1c")(b1)
            mixed = jnp.concatenate([b0, b1], axis=-1)
        else:
            b0 = cb(192, (1, 1), "b0")(x)
            b1 = cb(192, (1, 1), "b1a")(x)
            b1 = cb(224, (1, 3), "b1b")(b1)
            b1 = cb(256, (3, 1), "b1c")(b1)
            mixed = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name="up")(mixed)
        out = x + self.scale * up
        return nn.relu(out) if self.activation else out


class InceptionResnetV2(nn.Module):
    """Inception-ResNet-V2 classifier, compact depth-configurable variant
    (ref: nets/inception_resnet_v2.py)."""

    num_classes: int = 1001
    blocks35: int = 10
    blocks17: int = 20
    blocks8: int = 9
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, Dict]:
        cb = lambda f, k, name, **kw: ConvBN(f, k, train=self.train, dtype=self.dtype, name=name, **kw)
        eps = {}
        x = cb(32, (3, 3), "stem1", strides=(2, 2), padding="VALID")(x)
        x = cb(32, (3, 3), "stem2", padding="VALID")(x)
        x = cb(64, (3, 3), "stem3")(x)
        x = _pool(x, "max", strides=(2, 2), padding="VALID")
        x = cb(80, (1, 1), "stem4", padding="VALID")(x)
        x = cb(192, (3, 3), "stem5", padding="VALID")(x)
        x = _pool(x, "max", strides=(2, 2), padding="VALID")
        # mixed_5b
        b0 = cb(96, (1, 1), "m5b_b0")(x)
        b1 = cb(48, (1, 1), "m5b_b1a")(x)
        b1 = cb(64, (5, 5), "m5b_b1b")(b1)
        b2 = cb(64, (1, 1), "m5b_b2a")(x)
        b2 = cb(96, (3, 3), "m5b_b2b")(b2)
        b2 = cb(96, (3, 3), "m5b_b2c")(b2)
        # TF/slim/keras avg-pool semantics (padding excluded from the mean)
        b3 = _pool(x, "avg", count_include_pad=False)
        b3 = cb(64, (1, 1), "m5b_b3")(b3)
        x = jnp.concatenate([b0, b1, b2, b3], axis=-1)
        for i in range(self.blocks35):
            x = InceptionResnetBlock("block35", 0.17, self.train, self.dtype,
                                     name=f"block35_{i + 1}")(x)
        eps["block35"] = x
        # reduction_a
        b0 = cb(384, (3, 3), "ra_b0", strides=(2, 2), padding="VALID")(x)
        b1 = cb(256, (1, 1), "ra_b1a")(x)
        b1 = cb(256, (3, 3), "ra_b1b")(b1)
        b1 = cb(384, (3, 3), "ra_b1c", strides=(2, 2), padding="VALID")(b1)
        b2 = _pool(x, "max", strides=(2, 2), padding="VALID")
        x = jnp.concatenate([b0, b1, b2], axis=-1)
        for i in range(self.blocks17):
            x = InceptionResnetBlock("block17", 0.10, self.train, self.dtype,
                                     name=f"block17_{i + 1}")(x)
        eps["block17"] = x
        # reduction_b
        b0 = cb(256, (1, 1), "rb_b0a")(x)
        b0 = cb(384, (3, 3), "rb_b0b", strides=(2, 2), padding="VALID")(b0)
        b1 = cb(256, (1, 1), "rb_b1a")(x)
        b1 = cb(288, (3, 3), "rb_b1b", strides=(2, 2), padding="VALID")(b1)
        b2 = cb(256, (1, 1), "rb_b2a")(x)
        b2 = cb(288, (3, 3), "rb_b2b")(b2)
        b2 = cb(320, (3, 3), "rb_b2c", strides=(2, 2), padding="VALID")(b2)
        b3 = _pool(x, "max", strides=(2, 2), padding="VALID")
        x = jnp.concatenate([b0, b1, b2, b3], axis=-1)
        for i in range(self.blocks8):
            x = InceptionResnetBlock("block8", 0.20, self.train, self.dtype,
                                     name=f"block8_{i + 1}")(x)
        # final unscaled, non-activated block8 (ref: inception_resnet_v2.py
        # `net = block8(net, activation_fn=None)` after the scaled repeats;
        # keras applications names it block8_10 with scale=1.0)
        x = InceptionResnetBlock("block8", 1.0, self.train, self.dtype,
                                 activation=False, name="block8_final")(x)
        x = cb(1536, (1, 1), "conv7b")(x)
        eps["conv7b"] = x
        x = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=jnp.float32,
                          name="logits")(x)
        return logits.astype(jnp.float32), eps
