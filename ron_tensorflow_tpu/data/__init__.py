"""Data layer: TFRecord IO, VOC schema, converters, device-side
augmentation, input pipeline."""

from . import example, preprocess, tfrecord, voc
from .convert import convert_voc, encode_voc_example
from .pipeline import PipelineConfig, PrefetchIterator, batch_iterator, parse_voc_example
from .preprocess import PreprocessConfig, eval_preprocess, train_augment, train_augment_batch, whiten

__all__ = [
    "example",
    "preprocess",
    "tfrecord",
    "voc",
    "convert_voc",
    "encode_voc_example",
    "PipelineConfig",
    "PrefetchIterator",
    "batch_iterator",
    "parse_voc_example",
    "PreprocessConfig",
    "eval_preprocess",
    "train_augment",
    "train_augment_batch",
    "whiten",
]
