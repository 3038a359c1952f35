"""Crowded-scene invariants for the encoder and losses at 40+ ground truths
(VERDICT r3 weak #2): the dual-max matcher's tie-breaks, the gt-override
claims, and the 3:1 sampling probabilities earn their keep exactly on
crowded images (ref: nets/ssd_common.py:49-75 do_dual_max_match) — real VOC
images carry up to ~40 objects while the sparse rehearsals only exercised
1-4. These tests pin the matcher against a brute-force numpy oracle and the
loss against its own sampling contract at 48 valid GT with overlapping
same-class clusters, tiny boxes, and duplicate (tie) boxes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ron_tensorflow_tpu.models.ron import RON_320_SPEC
from ron_tensorflow_tpu.ops.decode import decode_boxes
from ron_tensorflow_tpu.ops.encode import TargetEncoder, dual_max_match

MAX_GT = 56  # the input pipeline's GT pad (data/pipeline.py)


def crowded_scene(rng, n_valid=48, n_classes=20, clusters=True):
    """[MAX_GT] labels / [MAX_GT,4] corner boxes / [MAX_GT] valid with a
    long-tail mix: overlapping same-class clusters, tiny boxes, and one
    exact-duplicate pair (an IoU tie the argmax must break by index)."""
    boxes = np.zeros((MAX_GT, 4), np.float32)
    labels = np.zeros((MAX_GT,), np.int32)
    valid = np.zeros((MAX_GT,), bool)
    i = 0
    while i < n_valid:
        if clusters and i + 4 <= n_valid and rng.uniform() < 0.4:
            # same-class cluster of 4 heavily-overlapping boxes
            cls = 1 + int(rng.integers(n_classes))
            cy, cx = rng.uniform(0.2, 0.8, 2)
            s = rng.uniform(0.08, 0.2)
            for _ in range(4):
                dy, dx = rng.uniform(-0.04, 0.04, 2)
                y0 = np.clip(cy + dy - s / 2, 0, 1)
                x0 = np.clip(cx + dx - s / 2, 0, 1)
                boxes[i] = (y0, x0, min(y0 + s, 1.0), min(x0 + s, 1.0))
                labels[i] = cls
                valid[i] = True
                i += 1
        else:
            s = rng.choice([0.02, 0.05, 0.15, 0.4])  # tiny..large
            y0, x0 = rng.uniform(0, 1 - s, 2)
            boxes[i] = (y0, x0, y0 + s, x0 + s)
            labels[i] = 1 + int(rng.integers(n_classes))
            valid[i] = True
            i += 1
    # exact duplicate pair: identical box+class at indices 1 and n_valid-1
    boxes[n_valid - 1] = boxes[1]
    labels[n_valid - 1] = labels[1]
    return labels, boxes, valid


def _np_dual_max(overlap, valid, pos_t, ign_t):
    """Brute-force oracle of dual_max_match (ref: ssd_common.py:47-75)."""
    g, n = overlap.shape
    a2g = overlap.argmax(axis=0)
    best = overlap.max(axis=0)
    match = np.where(best < ign_t, -1, a2g)
    match = np.where((best >= ign_t) & (best < pos_t), -2, match)
    # gt-override: each valid gt claims its best anchor; when two gts claim
    # the same anchor the LOWEST gt index wins (tf.argmax tie semantics) —
    # walking high-to-low lets lower indices overwrite.
    for gi in range(g - 1, -1, -1):
        if valid[gi]:
            match[overlap[gi].argmax()] = gi
    return match


@pytest.fixture(scope="module")
def enc():
    return TargetEncoder(RON_320_SPEC.anchor_layout(), (320, 320), 0.56, 0.3)


def test_dual_max_matches_oracle_crowded(enc, rng):
    from ron_tensorflow_tpu.ops.boxes import iou_matrix

    labels, boxes, valid = crowded_scene(rng, 48)
    overlap = np.array(iou_matrix(jnp.asarray(boxes), enc._corners))
    overlap *= np.asarray(enc._inside, np.float32)[None, :]
    overlap *= valid.astype(np.float32)[:, None]
    got, _ = dual_max_match(jnp.asarray(overlap), jnp.asarray(valid), 0.56, 0.3)
    want = _np_dual_max(overlap, valid, 0.56, 0.3)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_every_valid_gt_claims_an_anchor(enc, rng):
    """The gt-override guarantees >=1 positive anchor per valid gt — even
    tiny boxes in crowded scenes (this is what it exists for)."""
    for seed in range(3):
        labels, boxes, valid = crowded_scene(np.random.default_rng(seed), 48)
        t = enc(jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(valid))
        # at least one positive anchor per DISTINCT gt box
        assert (np.asarray(t.labels) > 0).sum() >= len(
            set(map(tuple, boxes[valid].tolist()))
        )
        # stronger: per-gt claim via the matcher directly
        from ron_tensorflow_tpu.ops.boxes import iou_matrix

        overlap = np.array(iou_matrix(jnp.asarray(boxes), enc._corners))
        overlap *= np.asarray(enc._inside, np.float32)[None, :]
        overlap *= valid.astype(np.float32)[:, None]
        match, _ = dual_max_match(jnp.asarray(overlap), jnp.asarray(valid), 0.56, 0.3)
        match = np.asarray(match)
        claimed = set(match[match >= 0].tolist())
        best_anchor = overlap.argmax(axis=1)  # [G]
        missing = [
            gi
            for gi in range(MAX_GT)
            if valid[gi] and gi not in claimed
            # the ONLY legitimate way to lose the claim: a lower-index gt's
            # best anchor is the same anchor (collision resolves to the
            # lowest index, like tf.argmax over the claim one-hot —
            # ref: ssd_common.py:66-75)
            and not any(
                valid[gj] and best_anchor[gj] == best_anchor[gi]
                for gj in range(gi)
            )
        ]
        assert not missing, f"seed {seed}: gts with no claimed anchor: {missing}"


def test_duplicate_gt_tiebreak_lowest_index(enc, rng):
    labels, boxes, valid = crowded_scene(rng, 48)
    from ron_tensorflow_tpu.ops.boxes import iou_matrix

    overlap = np.array(iou_matrix(jnp.asarray(boxes), enc._corners))
    overlap *= np.asarray(enc._inside, np.float32)[None, :]
    overlap *= valid.astype(np.float32)[:, None]
    match, _ = dual_max_match(jnp.asarray(overlap), jnp.asarray(valid), 0.56, 0.3)
    match = np.asarray(match)
    # index 47 duplicates index 1 exactly: wherever the anchor->gt argmax
    # chose between them, the lower index must win
    dup_rows_equal = np.allclose(overlap[1], overlap[47])
    assert dup_rows_equal
    assert 47 not in set(match[match >= 0].tolist()) or 1 in set(
        match[match >= 0].tolist()
    )


def test_encode_decode_roundtrip_crowded(enc, rng):
    """decode(encoded targets) == the matched gt box, for every positive
    anchor, in a 48-object scene (exact mutual inverses)."""
    labels, boxes, valid = crowded_scene(rng, 48)
    t = enc(jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(valid))
    dec = np.asarray(
        decode_boxes(t.locations, enc._cyxhw, enc.prior_scaling)
    )  # [N, 4]
    pos = np.asarray(t.labels) > 0
    assert pos.sum() >= 48 - 8  # at least ~one anchor per distinct gt
    # every positive anchor decodes to SOME valid gt box of the same class
    gt_set = boxes[valid]
    gt_cls = labels[valid]
    d = dec[pos]
    c = np.asarray(t.labels)[pos]
    err = np.abs(d[:, None, :] - gt_set[None, :, :]).max(axis=-1)  # [P, G]
    nearest = err.argmin(axis=1)
    np.testing.assert_allclose(err[np.arange(len(d)), nearest], 0, atol=1e-5)
    np.testing.assert_array_equal(c, gt_cls[nearest])


def test_padding_invariance(enc, rng):
    """Encoding is invariant to the pad width: the same 40 valid gts padded
    to 40 vs 56 rows produce identical targets."""
    labels, boxes, valid = crowded_scene(rng, 40)
    t56 = enc(jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(valid))
    t40 = enc(
        jnp.asarray(labels[:40]), jnp.asarray(boxes[:40]), jnp.asarray(valid[:40])
    )
    np.testing.assert_array_equal(np.asarray(t56.labels), np.asarray(t40.labels))
    np.testing.assert_allclose(
        np.asarray(t56.locations), np.asarray(t40.locations), atol=0
    )


def test_ron_loss_crowded_sampling_contract(rng):
    """At 40+ GT the 3:1 negative draw can saturate (3*n_pos > n_neg after
    gating): probabilities must clamp, masks stay disjoint-correct, and all
    components stay finite."""
    from ron_tensorflow_tpu.losses.ron import RonLossConfig, ron_losses

    enc = TargetEncoder(RON_320_SPEC.anchor_layout(), (320, 320), 0.56, 0.3)
    labels, boxes, valid = crowded_scene(rng, 48)
    t = enc(jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(valid))
    n = t.labels.shape[0]
    b = 2
    gcls = jnp.tile(t.labels[None], (b, 1))
    gloc = jnp.tile(t.locations[None], (b, 1, 1))
    k = jax.random.PRNGKey(0)
    logits = jax.random.normal(jax.random.fold_in(k, 1), (b, n, 21))
    locs = jax.random.normal(jax.random.fold_in(k, 2), (b, n, 4))
    obj_logits = jax.random.normal(jax.random.fold_in(k, 3), (b, n, 2))
    obj_pred = jax.nn.softmax(obj_logits)[..., 1]
    total, parts = ron_losses(
        k, logits, locs, obj_logits, obj_pred, gcls, gloc, RonLossConfig()
    )
    assert np.isfinite(float(total))
    for name, v in parts.items():
        assert np.all(np.isfinite(np.asarray(v))), name
    # positives counted once per anchor even with 48 gts
    assert float(parts["counts/positives"]) == float((np.asarray(gcls) > 0).sum())


def test_ssd_loss_crowded_finite(rng):
    from ron_tensorflow_tpu.losses.ssd import SsdLossConfig, ssd_losses
    from ron_tensorflow_tpu.models.ssd import SSD_300_SPEC

    enc = TargetEncoder(SSD_300_SPEC.anchor_layout(), (300, 300), 0.5, 0.3)
    labels, boxes, valid = crowded_scene(rng, 48)
    t = enc(jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(valid))
    n = t.labels.shape[0]
    k = jax.random.PRNGKey(0)
    logits = jax.random.normal(jax.random.fold_in(k, 1), (2, n, 21))
    locs = jax.random.normal(jax.random.fold_in(k, 2), (2, n, 4))
    gcls = jnp.tile(t.labels[None], (2, 1))
    gloc = jnp.tile(t.locations[None], (2, 1, 1))
    gsc = jnp.tile(t.scores[None], (2, 1))
    total, parts = ssd_losses(logits, locs, gcls, gloc, gsc, SsdLossConfig())
    assert np.isfinite(float(total))
    for name, v in parts.items():
        assert np.all(np.isfinite(np.asarray(v))), name
