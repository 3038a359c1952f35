"""A/B held-out mAP across DetectionConfig variants on a trained synthetic
checkpoint (from tools/synthetic_e2e.py's work dir). Validates that the TPU
speed knobs (shared_top_k preselection, approx_top_k, NMS method) do not
change detection quality.

Usage:
  PYTHONPATH=.:/root/.axon_site python tools/ab_detection_config.py \
      /tmp/synth_e2e_XXXX [model_name]
"""

import os
import sys
from dataclasses import replace

import jax
import numpy as np


def main():
    work = sys.argv[1]
    model_name = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SYNTH_MODEL", "ron_320_vgg"
    )

    from ron_tensorflow_tpu.data.pipeline import PipelineConfig, batch_iterator
    from ron_tensorflow_tpu.data.preprocess import whiten_np
    from ron_tensorflow_tpu.eval import StreamingEvaluator
    from ron_tensorflow_tpu.inference.detector import DetectionConfig
    from ron_tensorflow_tpu.models import get_network
    from ron_tensorflow_tpu.train.checkpoint import CheckpointManager

    model, spec = get_network(model_name)
    model = model.clone(dtype=jax.numpy.bfloat16)  # production inference mode
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jax.numpy.zeros((1, *spec.img_shape, 3)),
            train=False,
        )
    )
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    variables, step = CheckpointManager(os.path.join(work, "model")).restore_eval(
        zeros["params"], zeros.get("batch_stats", {})
    )
    print(f"[ab] {model_name} @ step {step}")

    rec_dir = os.path.join(work, "records")
    test_files = sorted(
        os.path.join(rec_dir, f) for f in os.listdir(rec_dir) if "test" in f
    )
    # AB_MAX_BOXES: crowded rehearsal sets carry up to 48 GT/image — the
    # default 8-pad would silently truncate the GT tables and corrupt recall.
    max_boxes = int(os.environ.get("AB_MAX_BOXES", "8"))
    pcfg = PipelineConfig(batch_size=8, working_shape=spec.img_shape,
                          max_boxes=max_boxes,
                          shuffle=False, keep_difficult=True,
                          output_dtype="uint8")

    # Materialize the eval set once (uint8 — whitening runs on device inside
    # the evaluator): the host-side decode+resize is the slow part on this
    # 1-core host, and it is identical across all 9 variants.
    cached = [
        {
            "image": hb["image01"],
            "gt_labels": hb["gt_labels"],
            "gt_boxes": hb["gt_boxes"],
            "gt_difficult": hb["gt_difficult"],
            "sample_valid": hb["sample_valid"],
        }
        for hb in batch_iterator(test_files, pcfg, epochs=1, drop_remainder=False)
    ]

    def eval_batches():
        return iter(cached)

    base = DetectionConfig(select_threshold=0.05, objectness_threshold=0.03)
    # Speed knobs (must be mAP-lossless) x NMS mode/threshold points (these
    # CHANGE semantics — reported for the record, not asserted equal).
    variants = {
        "exact reference (no knobs)": replace(
            base, shared_top_k=0, approx_top_k=False, nms_method="loop"
        ),
        "approx_top_k only": replace(
            base, approx_top_k=True, shared_top_k=0, nms_method="loop"
        ),
        "presel shared_top_k=1000": replace(base, shared_top_k=1000),
        "presel + pallas NMS": replace(base, shared_top_k=1000, nms_method="pallas"),
        "pallas NMS": replace(base, nms_method="pallas"),
        "fixpoint NMS": replace(base, nms_method="fixpoint"),
        "nms mode=union (semantic)": replace(base, nms_mode="union"),
        "nms thresh=0.45 (semantic)": replace(base, nms_threshold=0.45),
        "nms thresh=0.30 (semantic)": replace(base, nms_threshold=0.30),
    }
    results = {}
    for name, cfg in variants.items():
        ev = StreamingEvaluator(model, spec, cfg)
        map07, map12, aps, stats = ev.run(variables, eval_batches(), log_every=0)
        present = [v for v in aps.values() if v >= 0]
        results[name] = map07
        print(
            f"{name:28s}: mAP07 {map07:.4f}  mAP12 {map12:.4f}  "
            f"mean-present-AP07 {np.mean(present):.4f}"
        )
    exact = results["exact reference (no knobs)"]
    lossless = [n for n in results if "semantic" not in n]
    bad = {n: results[n] for n in lossless if abs(results[n] - exact) > 1e-6}
    if bad:
        print(f"LOSSLESS-KNOB MISMATCH vs exact ({exact:.4f}): {bad}")
    else:
        print(f"all speed knobs lossless (mAP07 {exact:.4f})")


if __name__ == "__main__":
    main()
