"""Tiny detector specs for tests and multi-chip dry runs.

A 64x64 RON with the same layer topology as RON-320 (block7→block4 reverse
connections) but 1/2/4/8 grids — compiles in seconds, exercises every code
path of the full model.
"""

from .ron import DetectorSpec

RON_TINY_SPEC = DetectorSpec(
    name="ron_tiny_vgg",
    img_shape=(64, 64),
    num_classes=21,
    feat_layers=("block7", "block6", "block5", "block4"),
    feat_shapes=((1, 1), (2, 2), (4, 4), (8, 8)),
    allowed_borders=(32.0, 16.0, 8.0, 4.0),
    anchor_sizes=((44.8, 51.2), (32.0, 38.4), (19.2, 25.6), (6.4, 12.8)),
    anchor_ratios=tuple((1.0, 2.0, 3.0, 0.5, 1.0 / 3.0) for _ in range(4)),
    anchor_steps=(64.0, 32.0, 16.0, 8.0),
)
