"""Data layer: TFRecord IO, VOC schema, converters, device-side
augmentation, input pipeline."""

from . import example, preprocess, resize, tfrecord, voc
from .convert import convert_voc, encode_voc_example
from .pipeline import PipelineConfig, PrefetchIterator, batch_iterator, parse_voc_example
from .preprocess import PreprocessConfig, eval_preprocess, train_augment, train_augment_batch, whiten
from .resize import preprocess_for_eval, remap_boxes_for_eval, tf1_bilinear_resize

__all__ = [
    "resize",
    "preprocess_for_eval",
    "remap_boxes_for_eval",
    "tf1_bilinear_resize",
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
