"""Input pipeline: TFRecord shards -> fixed-size device batches.

TPU-native replacement for the reference's slim `DatasetDataProvider` +
shuffle queues + 24 preprocessing threads (ref: ron_net.py:222-306, D7 in
SURVEY). Host work is IO + JPEG decode + one resize to the fixed working
canvas; ALL augmentation runs on device as one jitted batch program
(`preprocess.train_augment_batch`). A background thread keeps a small
prefetch queue of ready host batches.

Difficult-object handling matches the trainer: difficult GT are dropped
unless every object is difficult, in which case all are kept
(ref: ron_net.py:241-244).
"""

from __future__ import annotations

import dataclasses
import io
import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from . import example as pb
from .tfrecord import read_records, shard_for_worker


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    batch_size: int = 32
    working_shape: tuple = (512, 512)  # host canvas fed to device augmentation
    max_boxes: int = 56
    shuffle: bool = True
    shuffle_buffer: int = 512
    prefetch: int = 4
    keep_difficult: bool = False  # training drops difficult (with fallback)
    num_workers: int = 1
    worker_index: int = 0
    seed: int = 0
    # Cache decoded+resized images (uint8) in host RAM after the first
    # epoch — VOC07+12 at 512x512 is ~17 GB, trivially within a TPU host's
    # memory, and it removes the single-core JPEG-decode bottleneck
    # (~5 ms/image) from epochs 2+.
    cache_decoded: bool = False
    # 'float32' (default) or 'uint8': uint8 quarters the host->device batch
    # transfer (the dominant cost on bandwidth-limited links); the consumer
    # converts on device (image.astype(f32) / 255).
    output_dtype: str = "float32"
    # Eval resize strategy (ref: ssd_vgg_preprocessing.py:358-425 + the
    # eval_ssd_network.py resize flag). None = train path (fast cv2 warp to
    # the working canvas; augmentation re-warps anyway). When set, images are
    # resized with TF1-legacy bilinear numerics (data/resize.py) and gt boxes
    # are remapped for CENTRAL_CROP / PAD_AND_RESIZE. 'NONE' cannot be
    # batched (variable shapes) — use the realtime evaluator for it.
    eval_resize: Optional[str] = None
    # JPEG-decode thread pool per batch (the reference ran 24 preprocessing
    # threads, ref: ron_net.py:300). cv2/PIL release the GIL, so decode
    # scales with cores; outputs are order-preserving and bit-identical to
    # serial. -1 = auto (min(8, cpu_count-1)); 0/1 = serial.
    decode_workers: int = -1
    # Grain child PROCESSES for the grain_pipeline variant (0 = in-process).
    # Raise on many-core hosts — the process pool is where the reference's
    # 24 preprocessing threads (ref: ron_net.py:300) map for the
    # deterministic/checkpointable pipeline. NOTE: grain shards indices
    # across workers and interleaves their batch streams, so batch
    # COMPOSITION differs from worker_count=0; the sample set, per-sample
    # decode bytes, and run-to-run determinism are unchanged (tested in
    # tests/test_grain.py).
    grain_workers: int = 0


def decode_jpeg_raw(data: bytes) -> np.ndarray:
    """JPEG -> uint8 [H,W,3] RGB at original resolution."""
    try:
        import cv2

        arr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        return cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def decode_jpeg(data: bytes, out_hw) -> np.ndarray:
    """JPEG -> float32 [H,W,3] in [0,1] resized to the working canvas
    (fast cv2 warp — the train path; eval uses TF1-parity resize)."""
    arr = decode_jpeg_raw(data)
    try:
        import cv2

        arr = cv2.resize(arr, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
    except ImportError:
        from PIL import Image

        arr = np.asarray(Image.fromarray(arr).resize((out_hw[1], out_hw[0]), Image.BILINEAR))
    return arr.astype(np.float32) / 255.0


def decode_jpeg_eval(data: bytes, out_hw, strategy: str) -> np.ndarray:
    """JPEG -> uint8 [out_h,out_w,3] canvas via the eval resize strategy with
    TF1-legacy bilinear numerics (pad fill = VGG mean = whitened zero)."""
    from .resize import preprocess_for_eval

    raw = decode_jpeg_raw(data)
    whitened, _, _ = preprocess_for_eval(raw, np.zeros((0, 4), np.float32), strategy, out_hw)
    from .preprocess import VGG_MEANS

    pixels = whitened + np.asarray(VGG_MEANS, np.float32)
    return np.clip(pixels + 0.5, 0.0, 255.0).astype(np.uint8)


def parse_voc_example(record: bytes) -> Dict:
    """Serialized Example -> dict of numpy GT + raw JPEG bytes."""
    ex = pb.decode_example(record)
    n = len(ex.get("image/object/bbox/label", []))
    boxes = np.zeros((n, 4), np.float32)
    if n:
        boxes[:, 0] = ex["image/object/bbox/ymin"]
        boxes[:, 1] = ex["image/object/bbox/xmin"]
        boxes[:, 2] = ex["image/object/bbox/ymax"]
        boxes[:, 3] = ex["image/object/bbox/xmax"]
    return {
        "jpeg": ex["image/encoded"][0],
        "shape": tuple(ex.get("image/shape", (0, 0, 3))),
        "labels": np.asarray(ex.get("image/object/bbox/label", []), np.int32),
        "boxes": boxes,
        "difficult": np.asarray(
            ex.get("image/object/bbox/difficult", [0] * n), np.int32
        ),
        "truncated": np.asarray(
            ex.get("image/object/bbox/truncated", [0] * n), np.int32
        ),
    }


def _apply_difficult_policy(sample: Dict, keep_difficult: bool) -> Dict:
    if keep_difficult or sample["labels"].size == 0:
        return sample
    mask = sample["difficult"] == 0
    if not mask.any():  # all difficult -> keep everything (ref: ron_net.py:241-244)
        return sample
    return {
        **sample,
        "labels": sample["labels"][mask],
        "boxes": sample["boxes"][mask],
        "difficult": sample["difficult"][mask],
        "truncated": sample["truncated"][mask],
    }


def _pad_gt(sample: Dict, max_boxes: int) -> Dict:
    n = min(sample["labels"].size, max_boxes)
    labels = np.zeros((max_boxes,), np.int32)
    boxes = np.zeros((max_boxes, 4), np.float32)
    difficult = np.zeros((max_boxes,), np.int32)
    valid = np.zeros((max_boxes,), bool)
    labels[:n] = sample["labels"][:n]
    boxes[:n] = sample["boxes"][:n]
    difficult[:n] = sample["difficult"][:n]
    valid[:n] = True
    return {"labels": labels, "boxes": boxes, "difficult": difficult, "valid": valid}


def iterate_samples(
    files: List[str], config: PipelineConfig, epochs: Optional[int] = None
) -> Iterator[Dict]:
    """Stream decoded samples from shards (shuffled per epoch)."""
    rng = np.random.default_rng(config.seed + config.worker_index)
    files = shard_for_worker(files, config.num_workers, config.worker_index)
    if not files:
        raise ValueError("no input shards for this worker")
    epoch = 0
    while epochs is None or epoch < epochs:
        order = list(files)
        if config.shuffle:
            rng.shuffle(order)
        buf: List[Dict] = []
        for path in order:
            for record in read_records(path):
                sample = parse_voc_example(record)
                sample = _apply_difficult_policy(sample, config.keep_difficult)
                if config.shuffle:
                    buf.append(sample)
                    if len(buf) >= config.shuffle_buffer:
                        idx = rng.integers(len(buf))
                        buf[idx], buf[-1] = buf[-1], buf[idx]
                        yield buf.pop()
                else:
                    yield sample
        while buf:
            idx = rng.integers(len(buf))
            buf[idx], buf[-1] = buf[-1], buf[idx]
            yield buf.pop()
        epoch += 1


def batch_iterator(
    files: List[str],
    config: PipelineConfig,
    epochs: Optional[int] = None,
    drop_remainder: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Fixed-size host batches: image01 [B,H0,W0,3] float (or uint8 per
    config.output_dtype), gt_labels [B,G], gt_boxes [B,G,4], gt_valid [B,G],
    gt_difficult [B,G], sample_valid [B].

    With drop_remainder=False the final short batch is zero-padded to full
    size and `sample_valid` marks the real rows — evaluation must cover
    every image (the reference evaluates all 4952 VOC test images), so
    padded rows can be masked out downstream instead of images being
    silently dropped.
    """
    if config.eval_resize == "NONE":
        raise ValueError(
            "eval_resize='NONE' yields variable shapes and cannot be batched; "
            "use the realtime evaluator for it"
        )
    it = iterate_samples(files, config, epochs)
    cache: Dict[bytes, np.ndarray] = {}

    def _decode(jpeg: bytes) -> np.ndarray:
        if config.eval_resize:
            return decode_jpeg_eval(jpeg, config.working_shape, config.eval_resize)
        return (decode_jpeg(jpeg, config.working_shape) * 255.0 + 0.5).astype(np.uint8)

    def decode(jpeg: bytes) -> np.ndarray:
        """Returns the uint8 working canvas (cached by content hash)."""
        if not config.cache_decoded:
            return _decode(jpeg)
        import hashlib

        key = hashlib.blake2b(jpeg, digest_size=16).digest()
        hit = cache.get(key)
        if hit is None:
            hit = _decode(jpeg)
            cache[key] = hit
        return hit

    if config.decode_workers == -1:
        import os

        n_workers = max(1, min(8, (os.cpu_count() or 2) - 1))
    else:
        n_workers = max(1, config.decode_workers)
    pool = None
    if n_workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=n_workers, thread_name_prefix="decode")

    exhausted = False
    try:
        while not exhausted:
            samples: List[Dict] = []
            try:
                for _ in range(config.batch_size):
                    samples.append(next(it))
            except StopIteration:
                exhausted = True
                if not samples or drop_remainder:
                    return
            # Decode the whole batch in the thread pool (cv2/PIL release the
            # GIL); order-preserving, bit-identical to the serial path.
            if pool is not None:
                images = list(pool.map(decode, (s["jpeg"] for s in samples)))
            else:
                images = [decode(s["jpeg"]) for s in samples]
            labels, boxes, valid, difficult = [], [], [], []
            for s in samples:
                if config.eval_resize in ("CENTRAL_CROP", "PAD_AND_RESIZE"):
                    from .resize import remap_boxes_for_eval

                    h0, w0 = s["shape"][:2]
                    if not (h0 and w0):  # shape absent from the record
                        import PIL.Image

                        w0, h0 = PIL.Image.open(io.BytesIO(s["jpeg"])).size
                    s = {
                        **s,
                        "boxes": remap_boxes_for_eval(
                            s["boxes"], (h0, w0), config.eval_resize, config.working_shape
                        ),
                    }
                gt = _pad_gt(s, config.max_boxes)
                labels.append(gt["labels"])
                boxes.append(gt["boxes"])
                valid.append(gt["valid"])
                difficult.append(gt["difficult"])
            n_real = len(images)
            pad = config.batch_size - n_real
            if pad:
                images += [np.zeros_like(images[0])] * pad
                labels += [np.zeros_like(labels[0])] * pad
                boxes += [np.zeros_like(boxes[0])] * pad
                valid += [np.zeros_like(valid[0])] * pad
                difficult += [np.zeros_like(difficult[0])] * pad
            stacked = np.stack(images)  # uint8 from decode()
            if config.output_dtype != "uint8":
                stacked = stacked.astype(np.float32) / 255.0
            sample_valid = np.zeros((config.batch_size,), bool)
            sample_valid[:n_real] = True
            yield {
                "image01": stacked,
                "gt_labels": np.stack(labels),
                "gt_boxes": np.stack(boxes),
                "gt_valid": np.stack(valid),
                "gt_difficult": np.stack(difficult),
                "sample_valid": sample_valid,
            }
    finally:
        if pool is not None:
            pool.shutdown(wait=False)


class PrefetchIterator:
    """Background-thread prefetch of host batches (the queue-runner
    replacement)."""

    _SENTINEL = object()

    def __init__(self, iterator: Iterator, depth: int = 4):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(target=self._fill, args=(iterator,), daemon=True)
        self._err: Optional[BaseException] = None
        self._thread.start()

    def _fill(self, iterator):
        try:
            for item in iterator:
                self._q.put(item)
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


class DevicePrefetcher:
    """Device-placement prefetch: a background thread applies `place`
    (host batch -> device arrays, e.g. jax.device_put with shardings) one
    batch ahead, so the host->device transfer of batch N+1 overlaps the
    device compute of batch N. On hosts where the accelerator link is the
    bottleneck this pipelines transfer against compute instead of
    serializing them in the train loop.

    The reference's analogue is the staging of `tf.train.batch` queues onto
    the GPU (ref: ron_net.py:296-308); XLA-side we keep it explicit."""

    _SENTINEL = object()

    def __init__(self, iterator: Iterator, place, depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._fill, args=(iterator, place), daemon=True
        )
        self._thread.start()

    def _fill(self, iterator, place):
        try:
            for item in iterator:
                self._q.put(place(item))
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
