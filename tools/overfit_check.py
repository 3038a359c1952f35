"""End-to-end consistency check: overfit RON-tiny on 8 synthetic images and
verify the full eval pipeline recovers the boxes with high mAP.

This closes the loop encoder -> loss -> training -> decode -> NMS -> AP: if
any of them disagreed about coordinate order, anchor layout or gating, the
mAP would collapse. Expected result: mAP(voc07) >= 0.8 after ~400 steps.

Run: PYTHONPATH=.:/root/.axon_site python tools/overfit_check.py [--platform cpu]
"""

import sys
import time

import numpy as np


def main():
    if "--platform" in sys.argv:
        import jax

        jax.config.update("jax_platforms", sys.argv[sys.argv.index("--platform") + 1])
    import jax
    import jax.numpy as jnp

    from ron_tensorflow_tpu.inference import DetectionConfig, Detector
    from ron_tensorflow_tpu.losses import RonLossConfig
    from ron_tensorflow_tpu.models.ron import RON
    from ron_tensorflow_tpu.models.testing import RON_TINY_SPEC
    from ron_tensorflow_tpu.ops.ap import StreamingTpFp
    from ron_tensorflow_tpu.ops.encode import TargetEncoder
    from ron_tensorflow_tpu.ops.matching import match_all_classes
    from ron_tensorflow_tpu.train import (
        OptimizerConfig,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    spec = RON_TINY_SPEC
    rng = np.random.default_rng(0)

    # 8 images, each with 1-2 colored rectangles on noise background.
    B, G = 8, 2
    images = rng.uniform(0, 0.3, (B, 64, 64, 3)).astype(np.float32)
    gt_boxes = np.zeros((B, G, 4), np.float32)
    gt_labels = np.zeros((B, G), np.int32)
    gt_valid = np.zeros((B, G), bool)
    for i in range(B):
        n = 1 + i % 2
        for j in range(n):
            cy, cx = rng.uniform(0.35, 0.65, 2)
            h, w = rng.uniform(0.3, 0.5, 2)
            y0, x0 = max(cy - h / 2, 0.0), max(cx - w / 2, 0.0)
            y1, x1 = min(cy + h / 2, 1.0), min(cx + w / 2, 1.0)
            cls = 1 + (i + j) % 3
            color = np.zeros(3)
            color[(cls - 1) % 3] = 0.9
            images[i, int(y0 * 64) : int(y1 * 64), int(x0 * 64) : int(x1 * 64)] = color
            gt_boxes[i, j] = [y0, x0, y1, x1]
            gt_labels[i, j] = cls
            gt_valid[i, j] = True

    whitened = images * 255.0 - np.array([123.0, 117.0, 104.0], np.float32)

    model = RON(spec=spec)
    encoder = TargetEncoder(spec.anchor_layout(), spec.img_shape, 0.5, 0.3)
    tx = make_optimizer(
        OptimizerConfig(
            optimizer="momentum", learning_rate=2e-3, weight_decay=1e-4,
            learning_rate_decay_type="fixed",
        )
    )
    state = create_train_state(model, jax.random.PRNGKey(0), (B, 64, 64, 3), tx)
    step = jax.jit(make_train_step(model, encoder, tx, RonLossConfig()))

    batch = {
        "image": jnp.asarray(whitened),
        "gt_labels": jnp.asarray(gt_labels),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_valid": jnp.asarray(gt_valid),
    }
    t0 = time.time()
    for i in range(400):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        if (i + 1) % 100 == 0:
            print(f"step {i + 1}: loss {float(metrics['loss/total']):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    det = Detector(
        model, spec,
        DetectionConfig(top_k=64, keep_top_k=16, select_threshold=0.1),
    )
    scores, boxes = det(variables, batch["image"])
    res = jax.vmap(
        lambda s, b, gl, gb: match_all_classes(
            spec.num_classes, s, b, gl, gb, jnp.zeros_like(gl), 0.5
        )
    )(scores, boxes, batch["gt_labels"], batch["gt_boxes"])

    acc = StreamingTpFp(spec.num_classes)
    for img in range(B):
        for c in range(1, spec.num_classes):
            acc.add(
                c,
                np.asarray(res.n_gt[img, c - 1]),
                np.asarray(scores[img, c - 1]),
                np.asarray(res.tp[img, c - 1]),
                np.asarray(res.fp[img, c - 1]),
            )
    m07, aps = acc.mean_average_precision("voc07")
    used = {c: round(v, 3) for c, v in aps.items() if acc.n_gt[c] > 0}
    print("per-class AP:", used)
    print(f"overfit mAP(voc07) = {m07:.4f} over classes with gt: "
          f"{np.mean(list(used.values())):.4f}")
    ok = np.mean(list(used.values())) >= 0.8
    print("OVERFIT CHECK:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
