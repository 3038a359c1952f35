"""Generate golden parity fixtures by EXECUTING the reference's own TF1 graph
code (read-only, from /root/reference) under tf.compat.v1 on TF 2.x.

This produces the strongest correctness evidence available without VOC data:
the fixtures in tests/fixtures/reference_parity.npz are the *actual numeric
outputs* of the reference implementation —
  - anchors:   nets/ron_vgg_320.py:285-355 `ron_anchors_all_layers`
  - encoder:   nets/ssd_common.py:337-414 `tf_ssd_bboxes_encode`
  - decode:    nets/ssd_common.py:448-498 `tf_ssd_bboxes_decode`
  - NMS:       tf_extended/bboxes.py:173-234 `bboxes_nms` (union & min modes)
  - matching:  tf_extended/bboxes.py:316-404 `bboxes_matching`
  - PR + AP:   tf_extended/metrics.py:100-130, 212-258
on fixed random inputs. tests/test_reference_parity.py asserts our JAX ops
reproduce them (labels/TP/FP exactly, floats bit-close).

The reference is TF 1.x (tf.contrib); the few contrib imports it makes are
import-only (never called on the paths we drive), so they are satisfied with
inert shim modules. No reference code is copied — it is imported from
/root/reference and executed.

Usage:  python tools/make_reference_fixtures.py
Deterministic (fixed seeds): reruns reproduce the same fixture file.
"""

from __future__ import annotations

import os
import sys
import types

# Disable oneDNN's approximate transcendentals BEFORE TF import — otherwise
# tf.log in the encoder differs from IEEE by ~1e-4 and the fixtures are not
# bit-comparable.
os.environ["TF_ENABLE_ONEDNN_OPTS"] = "0"

import numpy as np

REFERENCE = "/root/reference"
OUT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures", "reference_parity.npz"
)

# RON-320 hyper-parameters (ref: nets/ron_vgg_320.py:96-124 default_params).
IMG_SHAPE = (320, 320)
FEAT_SHAPES = [(5, 5), (10, 10), (20, 20), (40, 40)]
ANCHOR_SIZES = [(224.0, 256.0), (160.0, 192.0), (96.0, 128.0), (32.0, 64.0)]
ANCHOR_RATIOS = [[1, 2, 3, 0.5, 1.0 / 3]] * 4
ANCHOR_STEPS = [64, 32, 16, 8]
ALLOWED_BORDERS = [32.0, 16.0, 8.0, 4.0]
NUM_CLASSES = 21
PRIOR_SCALING = [0.1, 0.1, 0.2, 0.2]
POSITIVE_THRESHOLD = 0.56
IGNORE_THRESHOLD = 0.3


class _Inert:
    """Inert attribute sink for contrib symbols that are imported but never
    executed on the driven paths (e.g. slim.softmax as a default arg)."""

    def __init__(self, name):
        self._name = name

    def __call__(self, *a, **k):
        return _Inert(self._name + "()")

    def __getattr__(self, n):
        return _Inert(self._name + "." + n)

    def __repr__(self):
        return f"<inert {self._name}>"


def _shim(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    m.__getattr__ = lambda n, _name=name: _Inert(_name + "." + n)  # PEP 562
    sys.modules[name] = m
    return m


def load_reference_modules():
    """Import the reference's graph code under tf.compat.v1 with contrib shims.

    Returns (tf1, ssd_common, tfe, ron_vgg_320).
    """
    import tensorflow as tf_real

    tf1 = tf_real.compat.v1
    tf1.disable_eager_execution()

    # Pre-import the real TF-internal submodules the reference pulls in via
    # `from tensorflow.python.... import ...` so they are cached in sys.modules
    # before we swap the top-level name.
    from tensorflow.python.framework import dtypes, ops, sparse_tensor  # noqa: F401
    from tensorflow.python.ops import (  # noqa: F401
        array_ops,
        check_ops,
        control_flow_ops,
        init_ops,
        math_ops,
        nn,
        nn_ops,
        state_ops,
        variable_scope,
        variables,
    )

    # TF 2.21 removed the ops.Tensor alias the reference's _is_tensor checks.
    if not hasattr(ops, "Tensor"):
        ops.Tensor = tf_real.Tensor

    identity_decorator = lambda f: f
    # Real (minimal) slim so the reference's RON graph code itself can build
    # and run (tools/slim_shim.py); everything else contrib stays inert.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from slim_shim import build_slim

    contrib = _shim("tensorflow.contrib", slim=build_slim(tf1))
    _shim("tensorflow.contrib.image")
    _shim("tensorflow.contrib.image.python")
    _shim("tensorflow.contrib.image.python.ops", image_ops=_Inert("image_ops"))
    _shim("tensorflow.contrib.framework")
    _shim("tensorflow.contrib.framework.python")
    _shim(
        "tensorflow.contrib.framework.python.ops",
        add_arg_scope=identity_decorator,
        variables=_Inert("contrib_variables"),
    )
    _shim("tensorflow.contrib.layers")
    _shim("tensorflow.contrib.layers.python")
    _shim(
        "tensorflow.contrib.layers.python.layers",
        initializers=_Inert("initializers"),
        utils=_Inert("utils"),
    )
    _shim("tensorflow.contrib.metrics")
    _shim("tensorflow.contrib.metrics.python")
    _shim("tensorflow.contrib.metrics.python.ops", set_ops=_Inert("set_ops"))

    try:
        tf1.contrib = contrib
    except Exception:
        pass

    sys.modules["tensorflow"] = tf1
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    import tf_extended as tfe  # noqa: E402
    from nets import ron_vgg_320, ssd_common  # noqa: E402

    return tf1, ssd_common, tfe, ron_vgg_320


def load_reference_preprocessing():
    """Import the reference preprocessing module (requires the shims of
    load_reference_modules to have run first)."""
    from preprocessing import ssd_vgg_preprocessing  # noqa: E402

    return ssd_vgg_preprocessing


def random_gt(rng, n, min_size=0.08):
    """Random normalized gt boxes (ymin,xmin,ymax,xmax) and labels 1..20."""
    y1 = rng.uniform(0.0, 1.0 - min_size, n).astype(np.float32)
    x1 = rng.uniform(0.0, 1.0 - min_size, n).astype(np.float32)
    h = rng.uniform(min_size, 0.7, n).astype(np.float32)
    w = rng.uniform(min_size, 0.7, n).astype(np.float32)
    boxes = np.stack([y1, x1, np.minimum(y1 + h, 1.0), np.minimum(x1 + w, 1.0)], axis=1)
    labels = rng.integers(1, NUM_CLASSES, n).astype(np.int64)
    return labels, boxes


def clustered_boxes(rng, n_clusters, per_cluster):
    """Overlapping box clusters — long suppression chains for NMS."""
    boxes = []
    for _ in range(n_clusters):
        cy, cx = rng.uniform(0.2, 0.8, 2)
        h, w = rng.uniform(0.1, 0.35, 2)
        for _ in range(per_cluster):
            jy, jx = rng.normal(0, 0.02, 2)
            jh, jw = rng.normal(1.0, 0.1, 2)
            hh, ww = max(h * jh, 0.02), max(w * jw, 0.02)
            boxes.append(
                [cy + jy - hh / 2, cx + jx - ww / 2, cy + jy + hh / 2, cx + jx + ww / 2]
            )
    return np.clip(np.asarray(boxes, np.float32), 0.0, 1.0)


def main():
    tf1, ssd_common, tfe, ron_vgg_320 = load_reference_modules()
    fixtures = {}

    # ---------------- anchors (numpy, no session needed) ----------------
    layers_anchors = ron_vgg_320.ron_anchors_all_layers(
        IMG_SHAPE, FEAT_SHAPES, ANCHOR_SIZES, ANCHOR_RATIOS, ANCHOR_STEPS, offset=0.5
    )
    flat_cycxhw = []
    for (yref, xref, href, wref) in layers_anchors:
        # Broadcast to [H, W, A] exactly like the joint encoder's corner math
        # (ref: nets/ssd_common.py:372-383), then flatten H-major.
        ymin = (yref - href / 2.0).reshape(-1)
        xmin = (xref - wref / 2.0).reshape(-1)
        ymax = (yref + href / 2.0).reshape(-1)
        xmax = (xref + wref / 2.0).reshape(-1)
        flat_cycxhw.append(
            np.stack(
                [(ymin + ymax) / 2, (xmin + xmax) / 2, ymax - ymin, xmax - xmin], axis=1
            )
        )
    anchors_cycxhw = np.concatenate(flat_cycxhw, axis=0).astype(np.float32)
    fixtures["anchors_cycxhw"] = anchors_cycxhw
    n_anchors = anchors_cycxhw.shape[0]
    assert n_anchors == 21250, n_anchors

    graph = tf1.Graph()
    fetches = {}
    rng = np.random.default_rng(20260816)

    with graph.as_default():
        # ---------------- encoder ----------------
        for case, n_gt in (("e1", 1), ("e3", 3), ("e8", 8)):
            labels_np, boxes_np = random_gt(rng, n_gt)
            fixtures[f"enc_{case}_gt_labels"] = labels_np
            fixtures[f"enc_{case}_gt_boxes"] = boxes_np
            t_labels, t_locs, t_scores, _ = ssd_common.tf_ssd_bboxes_encode(
                tf1.constant(labels_np),
                tf1.constant(boxes_np),
                layers_anchors,
                NUM_CLASSES,
                IMG_SHAPE,
                ALLOWED_BORDERS,
                NUM_CLASSES,
                positive_threshold=POSITIVE_THRESHOLD,
                ignore_threshold=IGNORE_THRESHOLD,
                prior_scaling=PRIOR_SCALING,
            )
            flat_labels = tf1.concat(t_labels, axis=0)
            flat_locs = tf1.concat([tf1.reshape(l, [-1, 4]) for l in t_locs], axis=0)
            flat_scores = tf1.concat(t_scores, axis=0)
            fetches[f"enc_{case}_labels"] = flat_labels
            fetches[f"enc_{case}_locations"] = flat_locs
            fetches[f"enc_{case}_scores"] = flat_scores

        # ---------------- decode ----------------
        feat_locs_np = []
        for (h, w) in FEAT_SHAPES:
            feat_locs_np.append(
                (rng.standard_normal((2, h, w, 10, 4)) * 0.8).astype(np.float32)
            )
        flat_loc_in = np.concatenate([f.reshape(2, -1, 4) for f in feat_locs_np], axis=1)
        fixtures["dec_locations"] = flat_loc_in
        dec = ssd_common.tf_ssd_bboxes_decode(
            [tf1.constant(f) for f in feat_locs_np], layers_anchors, PRIOR_SCALING
        )
        fetches["dec_boxes"] = tf1.concat(
            [tf1.reshape(b, [2, -1, 4]) for b in dec], axis=1
        )

        # ---------------- NMS ----------------
        nms_boxes_np = clustered_boxes(rng, n_clusters=12, per_cluster=5)
        n_nms = nms_boxes_np.shape[0]
        nms_scores_np = rng.uniform(0.05, 1.0, n_nms).astype(np.float32)
        # Exact score ties to pin tie-breaking (top_k keeps lower index first).
        nms_scores_np[7] = nms_scores_np[3]
        nms_scores_np[25] = nms_scores_np[11]
        fixtures["nms_scores"] = nms_scores_np
        fixtures["nms_boxes"] = nms_boxes_np
        for mode in ("union", "min"):
            for thresh, keep in ((0.45, 20), (0.45, 200), (0.3, 20)):
                s, b = tfe.bboxes_nms(
                    tf1.constant(nms_scores_np),
                    tf1.constant(nms_boxes_np),
                    nms_threshold=thresh,
                    keep_top_k=keep,
                    mode=mode,
                )
                key = f"nms_{mode}_{int(thresh * 100)}_{keep}"
                fetches[key + "_scores"] = s
                fetches[key + "_boxes"] = b

        # ---------------- matching + PR + AP ----------------
        for case, cls in (("m1", 1), ("m2", 2)):
            n_det, n_g = 30, 6
            det_boxes_np = clustered_boxes(rng, n_clusters=6, per_cluster=5)
            det_scores_np = np.sort(
                rng.uniform(0.1, 1.0, n_det).astype(np.float32)
            )[::-1].copy()
            glabels_np = rng.integers(1, 4, n_g).astype(np.int64)
            glabels_np[0] = cls  # at least one gt of the class
            _, gboxes_np = random_gt(rng, n_g)
            # Put some gt near detection clusters so TPs exist.
            gboxes_np[:3] = det_boxes_np[[0, 10, 20]] + rng.normal(
                0, 0.01, (3, 4)
            ).astype(np.float32)
            gdiff_np = (rng.uniform(size=n_g) < 0.3).astype(np.int64)
            fixtures[f"match_{case}_label"] = np.int64(cls)
            fixtures[f"match_{case}_det_scores"] = det_scores_np
            fixtures[f"match_{case}_det_boxes"] = det_boxes_np
            fixtures[f"match_{case}_glabels"] = glabels_np
            fixtures[f"match_{case}_gboxes"] = gboxes_np
            fixtures[f"match_{case}_gdifficults"] = gdiff_np
            n_gb, tp, fp = tfe.bboxes_matching(
                cls,
                tf1.constant(det_scores_np),
                tf1.constant(det_boxes_np),
                tf1.constant(glabels_np),
                tf1.constant(gboxes_np),
                tf1.constant(gdiff_np),
                matching_threshold=0.5,
            )
            fetches[f"match_{case}_n_gt"] = n_gb
            fetches[f"match_{case}_tp"] = tp
            fetches[f"match_{case}_fp"] = fp
            prec, rec = tfe.precision_recall(
                n_gb, np.int32(n_det), tp, fp, tf1.constant(det_scores_np)
            )
            fetches[f"ap_{case}_precision"] = prec
            fetches[f"ap_{case}_recall"] = rec
            fetches[f"ap_{case}_voc07"] = tfe.average_precision_voc07(prec, rec)
            fetches[f"ap_{case}_voc12"] = tfe.average_precision_voc12(prec, rec)

        # ---------------- eval preprocessing (resize strategies) ----------
        # Runs the reference's ACTUAL preprocess_for_eval
        # (ref: preprocessing/ssd_vgg_preprocessing.py:358-425) for every
        # resize strategy on one larger-than-320 and one smaller-than-320
        # image, covering both the crop and the pad branches.
        ssd_vgg_preprocessing = load_reference_preprocessing()
        for tag, (ih, iw) in (("big", (375, 500)), ("small", (240, 280))):
            img_np = rng.integers(0, 256, (ih, iw, 3)).astype(np.uint8)
            pl, pb = random_gt(rng, 4)
            fixtures[f"pre_{tag}_image"] = img_np
            fixtures[f"pre_{tag}_gt_labels"] = pl
            fixtures[f"pre_{tag}_gt_boxes"] = pb
            for strategy in ("NONE", "CENTRAL_CROP", "PAD_AND_RESIZE", "WARP_RESIZE"):
                out_img, _, out_boxes, bbox_img = (
                    ssd_vgg_preprocessing.preprocess_for_eval(
                        tf1.constant(img_np),
                        tf1.constant(pl),
                        tf1.constant(pb),
                        out_shape=(320, 320),
                        resize=strategy,
                    )
                )
                key = f"pre_{tag}_{strategy.lower()}"
                fetches[key + "_image"] = out_img
                fetches[key + "_boxes"] = out_boxes
                fetches[key + "_bbox_img"] = bbox_img

        with tf1.Session(graph=graph) as sess:
            results = sess.run(fetches)

    for k, v in results.items():
        fixtures[k] = np.asarray(v)

    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    np.savez_compressed(OUT_PATH, **fixtures)
    print(f"wrote {len(fixtures)} arrays to {os.path.normpath(OUT_PATH)}")
    for k in sorted(fixtures):
        v = fixtures[k]
        print(f"  {k}: shape={getattr(v, 'shape', ())} dtype={getattr(v, 'dtype', type(v))}")


if __name__ == "__main__":
    main()
