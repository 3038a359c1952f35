"""SSD-300/512 detectors — the inherited capability family.

TPU-native re-design of the reference's SSD nets
(ref: nets/ssd_vgg_300.py:82-531, nets/ssd_vgg_512.py:77-607): VGG-16 body
with SSD's atrous conv6 (rate 6) tail, extra stride-2 feature blocks, L2-norm
(scale 20) on block4, and shared multibox heads. Outputs follow the same
flat [B, N_total, ...] contract as RON, with a constant objectness of 1
(SSD has no objectness prior) so the inference pipelines are shared.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Conv, L2Normalization, max_pool_2x2, pad2d
from .ron import DetectorOutputs, DetectorSpec

SSD_300_SPEC = DetectorSpec(
    name="ssd_300_vgg",
    img_shape=(300, 300),
    num_classes=21,
    feat_layers=("block4", "block7", "block8", "block9", "block10", "block11"),
    feat_shapes=((38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)),
    # SSD matches without border filtering; borders = img size disable it.
    allowed_borders=(300.0,) * 6,
    anchor_sizes=(
        (21.0, 45.0),
        (45.0, 99.0),
        (99.0, 153.0),
        (153.0, 207.0),
        (207.0, 261.0),
        (261.0, 315.0),
    ),
    anchor_ratios=(
        (2.0, 0.5),
        (2.0, 0.5, 3.0, 1.0 / 3.0),
        (2.0, 0.5, 3.0, 1.0 / 3.0),
        (2.0, 0.5, 3.0, 1.0 / 3.0),
        (2.0, 0.5),
        (2.0, 0.5),
    ),
    anchor_steps=(8.0, 16.0, 32.0, 64.0, 100.0, 300.0),
    anchor_style="ssd",
    normalizations=(20.0, -1.0, -1.0, -1.0, -1.0, -1.0),
    has_objectness=False,
)

SSD_512_SPEC = DetectorSpec(
    name="ssd_512_vgg",
    img_shape=(512, 512),
    num_classes=21,
    feat_layers=("block4", "block7", "block8", "block9", "block10", "block11", "block12"),
    feat_shapes=((64, 64), (32, 32), (16, 16), (8, 8), (4, 4), (2, 2), (1, 1)),
    allowed_borders=(512.0,) * 7,
    anchor_sizes=(
        (20.48, 51.2),
        (51.2, 133.12),
        (133.12, 215.04),
        (215.04, 296.96),
        (296.96, 378.88),
        (378.88, 460.8),
        (460.8, 542.72),
    ),
    anchor_ratios=(
        (2.0, 0.5),
        (2.0, 0.5, 3.0, 1.0 / 3.0),
        (2.0, 0.5, 3.0, 1.0 / 3.0),
        (2.0, 0.5, 3.0, 1.0 / 3.0),
        (2.0, 0.5, 3.0, 1.0 / 3.0),
        (2.0, 0.5),
        (2.0, 0.5),
    ),
    anchor_steps=(8.0, 16.0, 32.0, 64.0, 128.0, 256.0, 512.0),
    anchor_style="ssd",
    normalizations=(20.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0),
    has_objectness=False,
)


class MultiboxHead(nn.Module):
    """Class + location predictors of one feature layer
    (ref: nets/ssd_vgg_300.py:403-431 `ssd_multibox_layer`)."""

    num_anchors: int
    num_classes: int
    normalization: float = -1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.normalization > 0:
            x = L2Normalization(scale_init=self.normalization, name="l2_norm")(x)
        loc = Conv(4 * self.num_anchors, (3, 3), act=None, dtype=self.dtype, name="conv_loc")(x)
        cls = Conv(
            self.num_anchors * self.num_classes, (3, 3), act=None, dtype=self.dtype,
            name="conv_cls",
        )(x)
        b, h, w, _ = cls.shape
        cls = cls.reshape(b, h, w, self.num_anchors, self.num_classes)
        loc = loc.reshape(b, h, w, self.num_anchors, 4)
        return cls, loc


class SSDExtraBlock(nn.Module):
    """1x1 bottleneck + (padded) 3x3, optionally strided
    (ref: nets/ssd_vgg_300.py:487-508, ssd_vgg_512.py:410-441)."""

    bottleneck: int
    features: int
    strided: bool = True
    kernel: tuple = (3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.bottleneck, (1, 1), dtype=self.dtype, name="conv1x1")(x)
        if self.strided:
            x = pad2d(x, (1, 1))
            x = Conv(
                self.features, self.kernel, strides=(2, 2), padding="VALID",
                dtype=self.dtype, name="conv3x3",
            )(x)
        else:
            x = Conv(
                self.features, self.kernel, padding="VALID", dtype=self.dtype,
                name="conv3x3" if self.kernel == (3, 3) else "conv4x4",
            )(x)
        return x


class SSD(nn.Module):
    """SSD detector (300 or 512 per spec)."""

    spec: DetectorSpec = SSD_300_SPEC
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32
    fuse_block1: bool = False  # Pallas block-1 kernel (see vgg.py)
    s2d_stem: bool = False  # polyphase space-to-depth block 1 (see vgg.py)

    @nn.compact
    def __call__(self, images, train: bool = False) -> DetectorOutputs:
        spec = self.spec
        x = images.astype(self.dtype)
        conv = lambda f, name, **kw: Conv(features=f, dtype=self.dtype, name=name, **kw)

        end_points = {}
        assert not (self.fuse_block1 and self.s2d_stem)
        if self.s2d_stem:
            from .vgg import _ConvKernelBias, s2d_block1, s2d_stem_supported

            assert s2d_stem_supported(x.shape[1], x.shape[2])
            w1, b1 = _ConvKernelBias((3, 3, 3, 64), name="conv1_1")()
            w2, b2 = _ConvKernelBias((3, 3, 64, 64), name="conv1_2")()
            x = s2d_block1(x, w1, b1, w2, b2, dtype=self.dtype)
        elif self.fuse_block1:
            from ..kernels import fused_vgg_block1
            from .vgg import _ConvKernelBias, fused_block1_supported

            assert fused_block1_supported(x.shape[1], x.shape[2])
            w1, b1 = _ConvKernelBias((3, 3, 3, 64), name="conv1_1")()
            w2, b2 = _ConvKernelBias((3, 3, 64, 64), name="conv1_2")()
            # interpret='auto': resolved at lowering time per the actual
            # target platform (never the ambient default device).
            x = fused_vgg_block1(x, w1, b1, w2, b2, interpret="auto")
        else:
            x = conv(64, "conv1_1")(x)
            x = conv(64, "conv1_2")(x)
            end_points["block1"] = x
            x = max_pool_2x2(x)
        x = conv(128, "conv2_1")(x)
        x = conv(128, "conv2_2")(x)
        end_points["block2"] = x
        x = max_pool_2x2(x)
        x = conv(256, "conv3_1")(x)
        x = conv(256, "conv3_2")(x)
        x = conv(256, "conv3_3")(x)
        end_points["block3"] = x
        x = max_pool_2x2(x)
        x = conv(512, "conv4_1")(x)
        x = conv(512, "conv4_2")(x)
        x = conv(512, "conv4_3")(x)
        end_points["block4"] = x
        x = max_pool_2x2(x)
        x = conv(512, "conv5_1")(x)
        x = conv(512, "conv5_2")(x)
        x = conv(512, "conv5_3")(x)
        end_points["block5"] = x
        # SSD keeps spatial size here: 3x3 stride-1 pool
        # (ref: nets/ssd_vgg_300.py:474).
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        x = conv(1024, "conv6", dilation=(6, 6))(x)
        end_points["block6"] = x
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = conv(1024, "conv7", kernel=(1, 1))(x)
        end_points["block7"] = x
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        is_512 = spec.name == "ssd_512_vgg"
        x = SSDExtraBlock(256, 512, strided=True, dtype=self.dtype, name="block8")(x)
        end_points["block8"] = x
        x = SSDExtraBlock(128, 256, strided=True, dtype=self.dtype, name="block9")(x)
        end_points["block9"] = x
        if is_512:
            x = SSDExtraBlock(128, 256, strided=True, dtype=self.dtype, name="block10")(x)
            end_points["block10"] = x
            x = SSDExtraBlock(128, 256, strided=True, dtype=self.dtype, name="block11")(x)
            end_points["block11"] = x
            # block12: pad + 4x4 VALID (ref: ssd_vgg_512.py:434-441)
            y = Conv(128, (1, 1), dtype=self.dtype, name="block12_conv1x1")(x)
            y = pad2d(y, (1, 1))
            y = Conv(256, (4, 4), padding="VALID", dtype=self.dtype, name="block12_conv4x4")(y)
            end_points["block12"] = y
        else:
            x = SSDExtraBlock(128, 256, strided=False, dtype=self.dtype, name="block10")(x)
            end_points["block10"] = x
            x = SSDExtraBlock(128, 256, strided=False, dtype=self.dtype, name="block11")(x)
            end_points["block11"] = x

        logits_l, locs_l = [], []
        for i, layer in enumerate(spec.feat_layers):
            cls, loc = MultiboxHead(
                spec.num_anchors_per_cell(i),
                spec.num_classes,
                normalization=spec.normalizations[i],
                dtype=self.dtype,
                name=f"{layer}_box",
            )(end_points[layer])
            b = cls.shape[0]
            logits_l.append(cls.reshape(b, -1, spec.num_classes))
            locs_l.append(loc.reshape(b, -1, 4))

        logits = jnp.concatenate(logits_l, axis=1).astype(jnp.float32)
        locations = jnp.concatenate(locs_l, axis=1).astype(jnp.float32)
        predictions = jax.nn.softmax(logits, axis=-1)
        ones = jnp.ones(logits.shape[:2], jnp.float32)
        return DetectorOutputs(
            predictions=predictions,
            logits=logits,
            objness_pred=ones,  # SSD has no objectness prior
            objness_logits=jnp.stack([jnp.zeros_like(ones), ones * 1e3], axis=-1),
            locations=locations,
        )
