"""Run the reference's OWN RON-320 graph code end to end (TF 2.x compat.v1 +
tools/slim_shim.py) with deterministic weights, to produce:

  1. tests/fixtures/reference_forward.npz — the reference network's forward
     outputs on a fixed input, used by tests/test_model_parity.py to prove
     our flax RON computes the SAME function on the SAME weights
     (ref graph code: nets/ron_vgg_320.py:510-580 ron_net_reducedfc);
  2. BASELINE_MEASURED.json — a MEASURED reference inference baseline
     (sess.run forward, CPU), replacing bench.py's assumed number
     (VERDICT r1 weakness #3; ref timing hooks: eval_ron_network.py:362-366).

Weights are derived deterministically from each slim variable NAME (crc32 →
rng), so the test can regenerate them bit-identically without shipping a
~120 MB weight dump; only names/shapes + outputs are stored.

Usage: TF_ENABLE_ONEDNN_OPTS=0 python tools/reference_forward.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import zlib

os.environ["TF_ENABLE_ONEDNN_OPTS"] = "0"  # IEEE transcendentals/matmuls

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_reference_fixtures import load_reference_modules  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "reference_forward.npz")
BASELINE = os.path.join(REPO, "BASELINE_MEASURED.json")


def weight_for(name: str, shape) -> np.ndarray:
    """Deterministic, name-keyed pseudo-weights with sane magnitudes
    (fan-in-scaled convs, non-trivial BN stats so the BN mapping is tested)."""
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    shape = tuple(int(s) for s in shape)
    leaf = name.rsplit("/", 1)[-1]
    if leaf in ("moving_variance", "gamma"):
        return rng.uniform(0.8, 1.2, shape).astype(np.float32)
    if leaf in ("moving_mean", "beta", "biases"):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)
    assert leaf == "weights", name
    # conv HWIO fan-in = kh*kw*cin; TF deconv layout is [kh, kw, OUT, IN].
    cin = shape[3] if "deconv" in name else shape[2]
    std = np.sqrt(2.0 / (shape[0] * shape[1] * cin))
    return (rng.standard_normal(shape) * std).astype(np.float32)


def fixed_input(batch: int = 1) -> np.ndarray:
    """Whitened-scale input image, fixed seed."""
    rng = np.random.default_rng(99)
    return (rng.uniform(0.0, 255.0, (batch, 320, 320, 3)) - 115.0).astype(np.float32)


def main():
    tf1, _, _, ron_vgg_320 = load_reference_modules()

    graph = tf1.Graph()
    with graph.as_default():
        inputs = tf1.placeholder(tf1.float32, [None, 320, 320, 3], name="inputs")
        predictions, logits, objness_pred, objness_logits, localisations, _ = (
            ron_vgg_320.ron_net_reducedfc(inputs, is_training=False)
        )
        # Flatten per layer to [B, H*W*A, C] and concat — our output layout.
        def flat(tensors, c):
            return tf1.concat(
                [tf1.reshape(t, [tf1.shape(t)[0], -1, c]) for t in tensors], axis=1
            )

        fetches = {
            "logits": flat(logits, 21),
            "objness_logits": flat(objness_logits, 2),
            "locations": flat(localisations, 4),
            "predictions": flat(predictions, 21),
            "objness_pred": tf1.squeeze(flat(objness_pred, 1), -1),
        }
        variables = tf1.global_variables()

        with tf1.Session(graph=graph) as sess:
            names, shapes, loads = [], [], []
            for v in variables:
                name = v.name[:-2]  # strip ':0'
                names.append(name)
                shapes.append([int(s) for s in v.shape])
                loads.append(v.assign(weight_for(name, v.shape)))
            sess.run(loads)
            print(f"[reference_forward] loaded {len(names)} variables")

            img = fixed_input(1)
            outs = sess.run(fetches, {inputs: img})
            n = outs["logits"].shape[1]
            assert n == 21250, n

            # ---- baseline timing (the reference's own graph, this CPU) ----
            for _ in range(2):  # warmup
                sess.run(fetches["predictions"], {inputs: img})
            reps = 10
            t0 = time.perf_counter()
            for _ in range(reps):
                sess.run(fetches["predictions"], {inputs: img})
            dt = (time.perf_counter() - t0) / reps
            img_per_sec = 1.0 / dt

    np.savez_compressed(
        FIXTURE,
        input=img,
        var_names=np.asarray(names),
        var_shapes=np.asarray(json.dumps(shapes)),
        **{k: v for k, v in outs.items()},
    )
    print(f"wrote {FIXTURE}: n_anchors={n}")

    baseline = {
        "reference_forward_images_per_sec": round(img_per_sec, 3),
        "sec_per_image": round(dt, 4),
        "conditions": {
            "graph": "nets/ron_vgg_320.py ron_net_reducedfc via tools/slim_shim.py",
            "batch": 1,
            "device": "1-core host CPU (this machine), TF2 compat.v1 session",
            "tf_oneDNN": "disabled",
            "note": (
                "forward only (sess.run of softmax predictions); the "
                "reference's published pipeline ran the same graph plus "
                "CPU while-loop NMS, so this is an upper bound on its "
                "single-image throughput here"
            ),
        },
    }
    with open(BASELINE, "w") as f:
        json.dump(baseline, f, indent=2)
    print(json.dumps(baseline))


if __name__ == "__main__":
    main()
