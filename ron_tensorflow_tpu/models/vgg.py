"""VGG-16 backbones (reduced-fc and heavy variants), NHWC flax modules.

TPU-native re-design of the reference's slim VGG body shared by RON and SSD
(ref: nets/ron_vgg_320.py:510-556 reduced / :434-485 heavy;
nets/vgg.py:110-244 classification zoo). Endpoints follow the reference's
`block1..block7` naming; blockN is recorded *before* its pool, so for a
320x320 input: block4 = 40x40, block5 = 20x20, block6/7 = 10x10.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Conv, max_pool_2x2


class _ConvKernelBias(nn.Module):
    """Bare conv parameters under the same tree path as `Conv` (name/conv/
    {kernel,bias}) so fused Pallas paths share checkpoints with the layer
    composition."""

    shape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        inner = _KernelBias(shape=self.shape, name="conv")
        return inner()


class _KernelBias(nn.Module):
    shape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(), self.shape, jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.shape[-1],), jnp.float32
        )
        return kernel, bias


def _phase_output_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Phase-OUTPUT form of a 3x3 stride-1 SAME conv: one 4x4 stride-2 conv
    whose 4*C_out channels are the four 2x2 output phases.

        out[2i+p, 2j+q, o] = sum_{dy,dx} w[dy+1, dx+1] x[2i+p+dy, 2j+q+dx]
                           = (conv(x_pad, K, stride 2))[i, j, (2p+q)C+o]
        with K[a, b, :, (2p+q)C+o] = w[a-p, b-q]  (zero outside [0,3))

    i.e. K places w at offset (p, q) inside the 4x4 window — built with four
    static pads + one concat (backward = slice/add, no gather/scatter).
    FLOP inflation is 16/9 (the structural zeros) but every MXU dimension is
    round: contraction 4*4*C_in, output 4*C_out lanes.

    w: [3, 3, C_in, C_out] -> K: [4, 4, C_in, 4*C_out] (phase-major p, q).
    """
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3), "phase-output transform implemented for 3x3 only"
    cols = [
        jnp.pad(w, ((p, 1 - p), (q, 1 - q), (0, 0), (0, 0)))
        for p in (0, 1)
        for q in (0, 1)
    ]
    return jnp.concatenate(cols, axis=-1)


def s2d_block1(x, w1, b1, w2, b2, dtype=jnp.float32):
    """VGG block 1 (conv1_1 + ReLU + conv1_2 + ReLU + 2x2 max pool) with the
    expensive conv1_2 + pool computed as ONE phase-output stride-2 conv — the
    TPU space-to-depth stem.

    The hypothesis it tested: conv1_2 is ~95% of block 1's FLOPs and
    profiles at ~16% MXU efficiency (64-in/64-out channels starve the
    128-lane MXU). In phase-output form it becomes a [4, 4, 64, 256]
    stride-2 conv (contraction 1024, output 256 lanes) that lands directly
    on the pooled grid; pool1 is then an elementwise max over the 4 phase
    channel groups. conv1_1 stays at the original layout (its FLOPs are
    1/21 of conv1_2's).

    MEASURED NEGATIVE (round-4 in-situ A/Bs, batch 32): the full-polyphase
    variant (s2d input, dense phase convs, 2.67x FLOPs) ran 285 vs 310
    img/s baseline; THIS phase-output form (16/9 FLOPs) ran 297 vs 310.
    Both lose because block 1 at 320^2 x 64ch is HBM-bound, not MXU-lane
    bound (see docs/tpu_performance.md rule 4) — extra FLOPs buy nothing
    when the MXU waits on HBM. Kept opt-in (exact, tested, GSPMD-safe) as
    the recorded result; do NOT enable expecting a speedup.

    Exact (pure reindexing of the same parameters + the same f32
    accumulation), differentiable, GSPMD-partitionable (plain XLA convs —
    unlike the Pallas fused block 1 this works under pjit meshes and in
    training). Returns [B, H/2, W/2, 64] = the post-pool1 tensor. Matches
    the reference stem (ref: nets/ron_vgg_320.py:530-533 conv1 x2 + pool1).
    """
    dn = ("NHWC", "HWIO", "NHWC")
    co2 = w2.shape[-1]

    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w1.astype(dtype), (1, 1), "SAME", dimension_numbers=dn
    )
    y = jax.nn.relu(y + b1.astype(dtype))

    k2 = _phase_output_kernel(w2).astype(dtype)
    # out row phases (2i+p) tap input rows 2i-1..2i+2 -> pad (1, 2); the
    # bottom/right pad rows only feed taps that are structural zeros or map
    # to the original SAME pad, so the equality is exact.
    y2 = jax.lax.conv_general_dilated(
        y, k2, (2, 2), ((1, 2), (1, 2)), dimension_numbers=dn
    )
    y2 = jax.nn.relu(y2 + jnp.tile(b2, 4).astype(dtype))
    b, h, w, _ = y2.shape
    # pool1: the 2x2/stride-2 SAME max pool windows ARE the phase groups
    return y2.reshape(b, h, w, 4, co2).max(axis=3)


def s2d_stem_supported(height: int, width: int) -> bool:
    """The phase-output stem needs even spatial dims (2x2 phase grid)."""
    return height % 2 == 0 and width % 2 == 0


def fused_block1_supported(height: int, width: int) -> bool:
    """The fused block-1 Pallas kernel needs an even width and a row tile
    that divides H (see kernels/fused_conv_pool.fused_vgg_block1)."""
    return width % 2 == 0 and any(height % r == 0 for r in (32, 16, 12, 8, 4))


class VGG16Backbone(nn.Module):
    """VGG-16 feature extractor with detection-style fc6/fc7 conv heads.

    variant='reduced': fc6 = 3x3 conv, dilation 3, 1024ch; fc7 = 1x1, 1024ch
      (ref: nets/ron_vgg_320.py:548-553 — the `vgg16_reducedfc` used for the
      published 0.7+ mAP runs).
    variant='heavy': fc6 = 7x7 conv 4096ch; fc7 = 1x1 4096ch
      (ref: nets/ron_vgg_320.py:478-484).
    """

    variant: str = "reduced"
    dtype: Any = jnp.float32
    # Run block 1 (conv1_1+conv1_2+pool) as one Pallas kernel — the
    # full-resolution intermediates never touch HBM. Same param tree, so a
    # flag flip on a trained checkpoint is safe. Differentiable (recompute
    # custom VJP in kernels/fused_conv_pool.py), so it applies to training
    # too; the `block1` (pre-pool) endpoint is not materialized (no RON/SSD
    # head consumes it).
    fuse_block1: bool = False
    # Run block 1 in the 2x2 polyphase (space-to-depth) domain — exact, pure
    # XLA, GSPMD-partitionable, same param tree (see s2d_block1). The train
    # path's MXU fix for the channel-starved stem. Mutually exclusive with
    # fuse_block1; `block1` endpoint not materialized (same caveat).
    s2d_stem: bool = False
    # Rematerialize blocks 1-2 (conv1_1..pool2) in the backward pass
    # (jax.checkpoint / nn.remat): their full-resolution activations — the
    # largest in the network and ~3x over block 1's HBM traffic floor at
    # bs32 (NOTES round-4 #1) — are recomputed instead of round-tripping
    # HBM as saved residuals. Same param tree; `block1`/`block2` endpoints
    # not materialized (no RON/SSD head consumes them). Training-side
    # experiment knob; exact by construction.
    remat_blocks12: bool = False

    def _blocks12(self, x):
        """conv1_1..pool2 as one rematerializable span (names unchanged, so
        the param tree matches the inline path exactly)."""
        conv = lambda f, name: Conv(features=f, dtype=self.dtype, name=name)
        x = conv(64, "conv1_1")(x)
        x = conv(64, "conv1_2")(x)
        x = max_pool_2x2(x)
        x = conv(128, "conv2_1")(x)
        x = conv(128, "conv2_2")(x)
        return max_pool_2x2(x)

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        conv = lambda f, name, **kw: Conv(features=f, dtype=self.dtype, name=name, **kw)
        end_points = {}

        assert not (self.fuse_block1 and self.s2d_stem), (
            "fuse_block1 and s2d_stem are mutually exclusive"
        )
        assert not (self.remat_blocks12 and (self.fuse_block1 or self.s2d_stem)), (
            "remat_blocks12 applies to the plain block-1/2 path"
        )
        if self.remat_blocks12:
            x = nn.remat(VGG16Backbone._blocks12)(self, x)
        elif self.s2d_stem:
            assert s2d_stem_supported(x.shape[1], x.shape[2]), (
                f"s2d_stem needs even spatial dims, got {x.shape}"
            )
            w1, b1 = _ConvKernelBias((3, 3, 3, 64), name="conv1_1")()
            w2, b2 = _ConvKernelBias((3, 3, 64, 64), name="conv1_2")()
            x = s2d_block1(x, w1, b1, w2, b2, dtype=self.dtype)
        elif self.fuse_block1:
            from ..kernels import fused_vgg_block1

            assert fused_block1_supported(x.shape[1], x.shape[2]), (
                f"fuse_block1 unsupported for input {x.shape}"
            )
            w1, b1 = _ConvKernelBias((3, 3, 3, 64), name="conv1_1")()
            w2, b2 = _ConvKernelBias((3, 3, 64, 64), name="conv1_2")()
            # interpret='auto': resolved at lowering time per the actual
            # target platform (never the ambient default device).
            x = fused_vgg_block1(
                x.astype(self.dtype), w1, b1, w2, b2, interpret="auto"
            )
        else:
            x = conv(64, "conv1_1")(x)
            x = conv(64, "conv1_2")(x)
            end_points["block1"] = x
            x = max_pool_2x2(x)
        if not self.remat_blocks12:  # block 2 lives inside the remat span
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
        x = max_pool_2x2(x)

        if self.variant == "reduced":
            x = conv(1024, "fc6", kernel=(3, 3), dilation=(3, 3))(x)
            end_points["block6"] = x
            x = conv(1024, "fc7", kernel=(1, 1))(x)
        elif self.variant == "heavy":
            x = conv(4096, "fc6", kernel=(7, 7))(x)
            end_points["block6"] = x
            x = conv(4096, "fc7", kernel=(1, 1))(x)
        else:
            raise ValueError(f"unknown VGG variant {self.variant!r}")
        end_points["block7"] = x
        return end_points


class VGGBackbone(nn.Module):
    """Generic VGG family backbone — the classification zoo entries the
    reference registers (vgg_a / vgg_16 / vgg_19, ref: nets/vgg.py:49-244,
    nets/nets_factory.py:34-42). Conv counts per block:
    vgg_a (VGG-11): (1, 1, 2, 2, 2); vgg_16: (2, 2, 3, 3, 3);
    vgg_19: (2, 2, 4, 4, 4)."""

    depth: str = "vgg_16"
    fc_variant: str = "reduced"  # 'reduced' | 'heavy'
    dtype: Any = jnp.float32

    _COUNTS = {"vgg_a": (1, 1, 2, 2, 2), "vgg_16": (2, 2, 3, 3, 3), "vgg_19": (2, 2, 4, 4, 4)}

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        counts = self._COUNTS[self.depth]
        widths = (64, 128, 256, 512, 512)
        end_points = {}
        for blk, (n, f) in enumerate(zip(counts, widths), start=1):
            for ci in range(n):
                x = Conv(f, dtype=self.dtype, name=f"conv{blk}_{ci + 1}")(x)
            end_points[f"block{blk}"] = x
            x = max_pool_2x2(x)
        if self.fc_variant == "reduced":
            x = Conv(1024, kernel=(3, 3), dilation=(3, 3), dtype=self.dtype, name="fc6")(x)
            end_points["block6"] = x
            x = Conv(1024, kernel=(1, 1), dtype=self.dtype, name="fc7")(x)
        else:
            x = Conv(4096, kernel=(7, 7), dtype=self.dtype, name="fc6")(x)
            end_points["block6"] = x
            x = Conv(4096, kernel=(1, 1), dtype=self.dtype, name="fc7")(x)
        end_points["block7"] = x
        return end_points


class VGG16Classifier(nn.Module):
    """VGG-16 image classifier head over the backbone — the zoo entry
    (ref: nets/vgg.py:110-173 `vgg_16`), used for warm-start weight
    verification like the reference's converter parity checks
    (ref: test_tf_vgg16.py:26-133)."""

    num_classes: int = 1000
    variant: str = "reduced"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, Dict]:
        eps = VGG16Backbone(variant=self.variant, dtype=self.dtype, name="backbone")(x)
        x = eps["block7"]
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="logits",
        )(x)
        return x, eps
