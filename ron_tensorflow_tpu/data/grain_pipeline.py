"""Grain-backed input pipeline — deterministic, shardable, checkpointable.

Production alternative to `data/pipeline.py`'s thread+queue pipeline
(ref D7: the slim DatasetDataProvider + queue runners,
ron_net.py:222-306). What Grain adds over the default pipeline:

- global determinism: the sample order is a pure function of (seed, epoch,
  shard), independent of worker timing;
- per-process sharding by INDEX (drop_remainder) instead of by file — exact
  global batch semantics for any process count;
- iterator checkpointing: `get_state()/set_state()` capture the exact
  position in the input stream, so a resumed training job continues with
  the next unseen sample (the reference lost input position on restart).

Random access into TFRecord shards uses the native framing scanner
(data/native.py) to index record spans once per file, falling back to a
python scan.

Enable with `data.use_grain=true` in TrainConfig.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np

from .pipeline import (
    PipelineConfig,
    _apply_difficult_policy,
    _pad_gt,
    decode_jpeg,
    parse_voc_example,
)


def _index_records(path: str) -> List[tuple]:
    """[(offset, length), ...] for every record payload in a shard."""
    from . import native

    with open(path, "rb") as f:
        buf = f.read()
    if native.get_lib() is not None:
        offsets, lengths = native.scan_records(buf, verify=True)
        return list(zip(offsets.tolist(), lengths.tolist()))
    # python fallback: walk the framing
    import struct

    spans, pos = [], 0
    while pos + 12 <= len(buf):
        (length,) = struct.unpack("<Q", buf[pos : pos + 8])
        if pos + 12 + length + 4 > len(buf):
            raise IOError(
                f"truncated TFRecord shard {path}: record at offset {pos} "
                f"claims {length} payload bytes but only "
                f"{len(buf) - pos - 12} remain"
            )
        spans.append((pos + 12, length))
        pos += 12 + length + 4
    return spans


class TFRecordVocSource:
    """Grain RandomAccessDataSource over VOC TFRecord shards.

    __getitem__ returns the fully-decoded, GT-padded sample dict the
    trainer consumes (image01 uint8 canvas + padded GT arrays).
    """

    def __init__(self, files: Sequence[str], config: PipelineConfig):
        self._files = list(files)
        self._config = config
        self._spans: List[tuple] = []  # (file_idx, offset, length)
        for fi, path in enumerate(self._files):
            for off, ln in _index_records(path):
                self._spans.append((fi, off, ln))
        self._fds: Dict[int, int] = {}

    def __len__(self) -> int:
        return len(self._spans)

    def __repr__(self) -> str:
        # Grain validates checkpoints against repr(data_source): make it a
        # stable content signature, not an object id.
        import os

        names = ",".join(os.path.basename(p) for p in self._files)
        return (
            f"TFRecordVocSource(files=[{names}], records={len(self._spans)}, "
            f"canvas={tuple(self._config.working_shape)})"
        )

    def _read(self, fi: int, off: int, ln: int) -> bytes:
        import os

        # os.pread is an atomic positioned read — grain's read pool calls
        # __getitem__ from multiple threads, so no shared seek state allowed.
        fd = self._fds.get(fi)
        if fd is None:
            fd = os.open(self._files[fi], os.O_RDONLY)
            self._fds[fi] = fd
        return os.pread(fd, ln, off)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self._config
        fi, off, ln = self._spans[index]
        sample = parse_voc_example(self._read(fi, off, ln))
        sample = _apply_difficult_policy(sample, cfg.keep_difficult)
        image = (decode_jpeg(sample["jpeg"], cfg.working_shape) * 255.0 + 0.5).astype(
            np.uint8
        )
        gt = _pad_gt(sample, cfg.max_boxes)
        return {
            "image01": image,
            "gt_labels": gt["labels"],
            "gt_boxes": gt["boxes"],
            "gt_valid": gt["valid"],
            "gt_difficult": gt["difficult"],
        }

    # pickling across grain workers: drop open descriptors
    def __getstate__(self):
        state = dict(self.__dict__)
        state["_fds"] = {}
        return state


def grain_batch_iterator(
    files: Sequence[str],
    config: PipelineConfig,
    epochs: Optional[int] = None,
):
    """Deterministic batched iterator (a grain PyGrainDatasetIterator —
    supports get_state()/set_state() for input checkpointing). Yields the
    same batch dicts as `pipeline.batch_iterator` plus sample_valid."""
    import grain.python as pg

    source = TFRecordVocSource(files, config)
    sampler = pg.IndexSampler(
        num_records=len(source),
        shard_options=pg.ShardOptions(
            shard_index=config.worker_index,
            shard_count=config.num_workers,
            drop_remainder=True,
        ),
        shuffle=config.shuffle,
        num_epochs=epochs,
        seed=config.seed,
    )
    loader = pg.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[pg.Batch(batch_size=config.batch_size, drop_remainder=True)],
        # 0 = in-process; config.grain_workers spawns that many child
        # processes (the multi-core decode path; same batches either way)
        worker_count=config.grain_workers,
    )
    return iter(loader)


class GrainBatches:
    """Trainer-facing wrapper: iteration + (de)serializable input state."""

    def __init__(self, files, config: PipelineConfig, epochs=None):
        self._it = grain_batch_iterator(files, config, epochs)

    def __iter__(self):
        return self

    def __next__(self):
        batch = dict(next(self._it))
        batch["sample_valid"] = np.ones((batch["image01"].shape[0],), bool)
        return batch

    def state_json(self) -> str:
        return json.dumps(self._it.get_state().decode())

    def restore_state_json(self, text: str) -> None:
        self._it.set_state(json.loads(text).encode())
