"""Detector model zoo (flax.linen)."""

from .ron import RON, RON_320_SPEC, DetectorOutputs, DetectorSpec
from .vgg import VGG16Backbone, VGG16Classifier

__all__ = [
    "RON",
    "RON_320_SPEC",
    "DetectorOutputs",
    "DetectorSpec",
    "VGG16Backbone",
    "VGG16Classifier",
    "get_network",
]


def get_network(name: str):
    """Model registry (ref: nets/nets_factory.py:54-64): name ->
    (model module instance, DetectorSpec)."""
    def _ssd(which):
        from . import ssd

        spec = ssd.SSD_300_SPEC if which == 300 else ssd.SSD_512_SPEC
        return ssd.SSD(spec=spec), spec

    def _tiny():
        from .testing import RON_TINY_SPEC

        return RON(spec=RON_TINY_SPEC), RON_TINY_SPEC

    registry = {
        "ron_320_vgg": lambda: (RON(spec=RON_320_SPEC, backbone_variant="reduced"), RON_320_SPEC),
        "ron_320_vgg_heavy": lambda: (RON(spec=RON_320_SPEC, backbone_variant="heavy"), RON_320_SPEC),
        "ssd_300_vgg": lambda: _ssd(300),
        "ssd_512_vgg": lambda: _ssd(512),
        # The reference's *_caffe entries differ only in initializer scope
        # (nets_factory.py:39-41,49-51 — caffe-model-seeded init); here caffe
        # weights arrive via `cli import-ckpt --format caffe`, so the aliases
        # resolve to the same architectures.
        "ssd_300_vgg_caffe": lambda: _ssd(300),
        "ssd_512_vgg_caffe": lambda: _ssd(512),
        # 64x64 smoke-test model (same topology, tiny grids)
        "ron_tiny_vgg": _tiny,
    }
    if name not in registry:
        raise ValueError(f"unknown network {name!r}; options: {sorted(registry)}")
    return registry[name]()
