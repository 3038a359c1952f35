"""RON-320 detector: VGG backbone + reverse connections + objectness priors.

TPU-native re-design of the reference's RON network
(ref: nets/ron_vgg_320.py:86-630). Key differences from the TF1 original,
chosen for XLA/TPU:

- NHWC + configurable compute dtype (bfloat16 on TPU), f32 params/BN;
- head outputs are returned flattened and concatenated across all feature
  layers as [B, N_total, ...] — the layout the joint all-layer target
  encoder and losses consume, so no per-layer python lists survive tracing;
- anchors are precomputed constants (`DetectorSpec.anchor_layout`).

Flattening order matches the anchor layout: per layer row-major (y, x,
anchor), layers coarse→fine (block7, block6, block5, block4), identical to
the reference's reshape+concat (ref: nets/ron_vgg_320.py:652-675).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.anchors import AnchorLayout, build_anchor_layout
from .layers import BatchNorm, Conv, ConvTranspose
from .vgg import VGG16Backbone


@dataclasses.dataclass(frozen=True)
class DetectorSpec:
    """Static detector hyper-parameters (ref: RONParams,
    nets/ron_vgg_320.py:72-124)."""

    name: str
    img_shape: Tuple[int, int]
    num_classes: int
    feat_layers: Tuple[str, ...]
    feat_shapes: Tuple[Tuple[int, int], ...]
    allowed_borders: Tuple[float, ...]
    anchor_sizes: Tuple[Tuple[float, ...], ...]
    anchor_ratios: Tuple[Tuple[float, ...], ...]
    anchor_steps: Tuple[float, ...]
    anchor_offset: float = 0.5
    prior_scaling: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
    anchor_style: str = "ron"  # 'ron' (sizes x ratios) | 'ssd' (sizes[0]+ratios)
    # Per-layer L2-normalization scale init; <=0 disables (SSD block4 uses 20,
    # ref: nets/ssd_vgg_300.py:122 normalizations).
    normalizations: Tuple[float, ...] = ()
    # Whether the model emits a real objectness prior (RON). SSD sets False:
    # its ModelOutput carries objness=1 placeholders, so objectness-gated
    # paths (RealtimeConfig.for_spec) must pick class-wise semantics instead.
    has_objectness: bool = True

    @functools.lru_cache(maxsize=None)
    def anchor_layout(self) -> AnchorLayout:
        return build_anchor_layout(
            self.img_shape,
            self.feat_shapes,
            self.anchor_sizes,
            self.anchor_ratios,
            self.anchor_steps,
            self.allowed_borders,
            self.anchor_offset,
            self.anchor_style,
        )

    def num_anchors_per_cell(self, layer_idx: int) -> int:
        if self.anchor_style == "ssd":
            return len(self.anchor_sizes[layer_idx]) + len(self.anchor_ratios[layer_idx])
        return len(self.anchor_sizes[layer_idx]) * len(self.anchor_ratios[layer_idx])


RON_320_SPEC = DetectorSpec(
    name="ron_320_vgg",
    img_shape=(320, 320),
    num_classes=21,
    feat_layers=("block7", "block6", "block5", "block4"),
    feat_shapes=((5, 5), (10, 10), (20, 20), (40, 40)),
    allowed_borders=(32.0, 16.0, 8.0, 4.0),
    anchor_sizes=((224.0, 256.0), (160.0, 192.0), (96.0, 128.0), (32.0, 64.0)),
    anchor_ratios=tuple((1.0, 2.0, 3.0, 0.5, 1.0 / 3.0) for _ in range(4)),
    anchor_steps=(64.0, 32.0, 16.0, 8.0),
)


class DetectorOutputs(NamedTuple):
    """Flat all-layer head outputs, [B, N_total, ...]."""

    predictions: jnp.ndarray  # [B, N, C] softmax class probabilities
    logits: jnp.ndarray  # [B, N, C]
    objness_pred: jnp.ndarray  # [B, N] P(object)
    objness_logits: jnp.ndarray  # [B, N, 2]
    locations: jnp.ndarray  # [B, N, 4] (cx, cy, w, h) offsets


class ClsHead(nn.Module):
    """Two inception-style {3x3, 1x1}-concat-BN blocks then a 3x3 predictor
    (ref: nets/ron_vgg_320.py:378-404 `pred_cls_module`)."""

    num_anchors: int
    num_classes: int
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for blk in ("inception1", "inception2"):
            b0 = Conv(512, (3, 3), act=None, dtype=self.dtype, name=f"{blk}_3x3")(x)
            b1 = Conv(512, (1, 1), act=None, dtype=self.dtype, name=f"{blk}_1x1")(x)
            x = jnp.concatenate([b0, b1], axis=-1)
            x = BatchNorm(use_running_average=not self.train, name=f"{blk}_bn")(x)
            x = nn.relu(x)
        x = Conv(
            self.num_anchors * self.num_classes,
            (3, 3),
            act=None,
            dtype=self.dtype,
            name="pred",
        )(x)
        b, h, w, _ = x.shape
        return x.reshape(b, h, w, self.num_anchors, self.num_classes)


class BoxHead(nn.Module):
    """3x3 conv(512, BN) + 3x3 predictor -> [B,H,W,A,4]
    (ref: nets/ron_vgg_320.py:406-415 `reg_bbox_module`)."""

    num_anchors: int
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(512, (3, 3), norm=True, train=self.train, dtype=self.dtype, name="conv")(x)
        x = Conv(4 * self.num_anchors, (3, 3), act=None, dtype=self.dtype, name="pred")(x)
        b, h, w, _ = x.shape
        return x.reshape(b, h, w, self.num_anchors, 4)


class ReverseConnection(nn.Module):
    """Top-down reverse connection producing a 512-ch ref map
    (ref: nets/ron_vgg_320.py:418-432 `reverse_connection_module_with_pred`).

    First (coarsest) layer: strided 2x2 conv of the backbone feature.
    Others: 3x3 conv(BN+ReLU) of the lateral feature + ReLU'd 2x2 deconv of
    the upper ref map, summed, ReLU.
    """

    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, left, right=None):
        if right is None:
            return Conv(
                512, (2, 2), strides=(2, 2), norm=True, train=self.train,
                dtype=self.dtype, name="conv_left",
            )(left)
        left_conv = Conv(
            512, (3, 3), norm=True, train=self.train, dtype=self.dtype, name="conv_left"
        )(left)
        up = ConvTranspose(512, (2, 2), (2, 2), dtype=self.dtype, name="deconv_right")(right)
        return nn.relu(left_conv + up)


class ObjectnessHead(nn.Module):
    """3x3 conv(512, BN, ReLU) + 3x3 2A-way predictor
    (ref: nets/ron_vgg_320.py:428-430)."""

    num_anchors: int
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(512, (3, 3), norm=True, train=self.train, dtype=self.dtype, name="conv")(x)
        x = Conv(2 * self.num_anchors, (3, 3), act=None, dtype=self.dtype, name="score")(x)
        b, h, w, _ = x.shape
        return x.reshape(b, h, w, self.num_anchors, 2)


class RON(nn.Module):
    """The RON detector (ref: nets/ron_vgg_320.py:434-580 `ron_net` /
    `ron_net_reducedfc`)."""

    spec: DetectorSpec = RON_320_SPEC
    backbone_variant: str = "reduced"  # 'reduced' | 'heavy'
    dtype: Any = jnp.float32
    fuse_block1: bool = False  # Pallas block-1 kernel (see vgg.py)
    s2d_stem: bool = False  # polyphase space-to-depth block 1 (see vgg.py)
    remat_blocks12: bool = False  # recompute blocks 1-2 in bwd (see vgg.py)

    @nn.compact
    def __call__(self, images, train: bool = False) -> DetectorOutputs:
        """images: [B, H, W, 3] whitened (VGG mean-subtracted) pixels."""
        spec = self.spec
        x = images.astype(self.dtype)
        end_points = VGG16Backbone(
            variant=self.backbone_variant,
            dtype=self.dtype,
            fuse_block1=self.fuse_block1,
            s2d_stem=self.s2d_stem,
            remat_blocks12=self.remat_blocks12,
            name="backbone",
        )(x)

        logits_l, objl_l, locs_l = [], [], []
        ref_map = None
        for i, layer in enumerate(spec.feat_layers):
            a = spec.num_anchors_per_cell(i)
            ref_map = ReverseConnection(
                train=train, dtype=self.dtype, name=f"{layer}_reverse"
            )(end_points[layer], ref_map)
            obj = ObjectnessHead(
                a, train=train, dtype=self.dtype, name=f"{layer}_objectness"
            )(ref_map)
            cls = ClsHead(
                a, spec.num_classes, train=train, dtype=self.dtype, name=f"{layer}_cls"
            )(ref_map)
            box = BoxHead(a, train=train, dtype=self.dtype, name=f"{layer}_box")(ref_map)

            b = obj.shape[0]
            logits_l.append(cls.reshape(b, -1, spec.num_classes))
            objl_l.append(obj.reshape(b, -1, 2))
            locs_l.append(box.reshape(b, -1, 4))

        logits = jnp.concatenate(logits_l, axis=1).astype(jnp.float32)
        objness_logits = jnp.concatenate(objl_l, axis=1).astype(jnp.float32)
        locations = jnp.concatenate(locs_l, axis=1).astype(jnp.float32)

        predictions = jax.nn.softmax(logits, axis=-1)
        objness_pred = jax.nn.softmax(objness_logits, axis=-1)[..., 1]
        return DetectorOutputs(
            predictions=predictions,
            logits=logits,
            objness_pred=objness_pred,
            objness_logits=objness_logits,
            locations=locations,
        )
