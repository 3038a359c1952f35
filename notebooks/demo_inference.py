"""Demo inference walkthrough — the `ssd_notebook.ipynb` equivalent
(ref: notebooks/ssd_notebook.ipynb, notebooks/ssd_tests.ipynb) as a plain
script: load an image, run the detector, post-process with the numpy path,
draw boxes.

Usage:
    PYTHONPATH=.:/root/.axon_site python notebooks/demo_inference.py IMG.jpg \
        [--model-dir ./model] [--platform cpu] [--out demo_out.jpg]

Without --model-dir the model runs with random weights (pipeline smoke run).
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image")
    ap.add_argument("--model", default="ron_320_vgg")
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="demo_out.jpg")
    ap.add_argument("--select-threshold", type=float, default=0.5)
    ap.add_argument("--nms-threshold", type=float, default=0.45)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ron_tensorflow_tpu.data.preprocess import whiten
    from ron_tensorflow_tpu.inference import np_methods
    from ron_tensorflow_tpu.models import get_network
    from ron_tensorflow_tpu.utils.visualization import draw_boxes

    model, spec = get_network(args.model)

    # --- load weights (or random init for a smoke run) ---
    if args.model_dir:
        from ron_tensorflow_tpu.train.checkpoint import CheckpointManager
        from ron_tensorflow_tpu.train.optimizer import OptimizerConfig, make_optimizer
        from ron_tensorflow_tpu.train.state import create_train_state

        tx = make_optimizer(OptimizerConfig(learning_rate_decay_type="fixed"))
        state = create_train_state(model, jax.random.PRNGKey(0), (1, *spec.img_shape, 3), tx)
        state = CheckpointManager(args.model_dir).restore(state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        print(f"restored checkpoint at step {int(state.step)}")
    else:
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, *spec.img_shape, 3)), train=False
        )
        print("no --model-dir: running with random weights (smoke run)")

    # --- preprocess: warp-resize + VGG whitening ---
    pil = Image.open(args.image).convert("RGB")
    img01 = np.asarray(
        pil.resize((spec.img_shape[1], spec.img_shape[0]), Image.BILINEAR), np.float32
    ) / 255.0
    batched = jnp.expand_dims(whiten(jnp.asarray(img01)), 0)

    # --- forward + numpy post-processing (the notebook path) ---
    out = model.apply(variables, batched, train=False)
    layout = spec.anchor_layout()
    predictions = np.asarray(out.predictions[0]) * np.asarray(out.objness_pred[0])[:, None]
    classes, scores, boxes = np_methods.detect(
        predictions,
        np.asarray(out.locations[0]),
        layout.cyxhw,
        select_threshold=args.select_threshold,
        nms_threshold=args.nms_threshold,
    )
    print(f"{len(classes)} detections")
    for c, s, b in zip(classes, scores, boxes):
        print(f"  class {c}: score {s:.3f} box {np.round(b, 3)}")

    draw_boxes(img01, boxes, classes, scores).save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    sys.exit(main())
