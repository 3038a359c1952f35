"""Pallas TPU kernel: fused greedy NMS.

The XLA implementations in `ops/nms.py` (sequential fori_loop / suppression
fixpoint) pay per-iteration XLA loop overhead and materialize [K, K] overlap
matrices. This kernel runs the greedy suppression scan entirely in VMEM,
computing each candidate's overlap row on the fly — one grid program per
8-row tile of (batch*class) candidate rows, vectorized across the tile.

Semantics are identical to `ops.nms.nms_sorted`: candidates must be
score-sorted descending; a candidate is kept iff it is alive (not suppressed
by an earlier kept candidate at overlap >= threshold), has score > 0, and
fewer than keep_top_k candidates were already kept. The kernel emits the
keep MASK; fixed-size compaction stays in XLA where scatter is cheap.

See /opt/skills/guides/pallas_guide.md for the kernel-authoring model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 8  # sublane tile: rows processed per grid program


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nms_kernel(
    scores_ref, ymin_ref, xmin_ref, ymax_ref, xmax_ref, keep_ref,
    *, k_pad, nms_threshold, keep_top_k, mode,
):
    """8 candidate rows per program; all state is [ROW_TILE, k_pad] in VMEM."""
    scores = scores_ref[...]
    ymin = ymin_ref[...]
    xmin = xmin_ref[...]
    ymax = ymax_ref[...]
    xmax = xmax_ref[...]
    vol = (ymax - ymin) * (xmax - xmin)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, k_pad), 1)

    # All loop carries are float32 masks — Mosaic's scf.for legalization
    # rejects i1 vector carries.
    def body(i, state):
        alive, keep, kept = state  # f32 [R,K], f32 [R,K], f32 [R,1]
        onef = (lane_ids == i).astype(jnp.float32)

        # Column i of each [ROW_TILE, k_pad] plane as a [ROW_TILE, 1]
        # broadcastable scalar-per-row (Mosaic has no value dynamic_slice;
        # a masked reduction is one VPU pass).
        def col(a):
            return jnp.sum(a * onef, axis=1, keepdims=True)

        take = (
            (col(alive) > 0.0)
            & (kept < float(keep_top_k))
            & (col(scores) > 0.0)
        ).astype(jnp.float32)  # [ROW_TILE, 1]

        iy0 = jnp.maximum(ymin, col(ymin))
        ix0 = jnp.maximum(xmin, col(xmin))
        iy1 = jnp.minimum(ymax, col(ymax))
        ix1 = jnp.minimum(xmax, col(xmax))
        inter = jnp.maximum(iy1 - iy0, 0.0) * jnp.maximum(ix1 - ix0, 0.0)
        if mode == "union":
            denom = vol + col(vol) - inter
        else:  # 'min'
            denom = jnp.minimum(vol, col(vol))
        ov = jnp.where(denom > 0.0, inter / jnp.where(denom > 0.0, denom, 1.0), 0.0)

        keep = jnp.maximum(keep, onef * take)
        suppress = (ov >= nms_threshold).astype(jnp.float32) * take
        alive = alive * (1.0 - suppress)
        kept = kept + take
        return alive, keep, kept

    alive0 = jnp.ones((ROW_TILE, k_pad), jnp.float32)
    keep0 = jnp.zeros((ROW_TILE, k_pad), jnp.float32)
    kept0 = jnp.zeros((ROW_TILE, 1), jnp.float32)
    _, keep, _ = jax.lax.fori_loop(0, k_pad, body, (alive0, keep0, kept0))
    keep_ref[...] = (keep > 0.0).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("nms_threshold", "keep_top_k", "mode", "interpret")
)
def pallas_nms_keep_mask(
    scores: jnp.ndarray,
    boxes: jnp.ndarray,
    nms_threshold: float = 0.5,
    keep_top_k: int = 200,
    mode: str = "min",
    interpret: bool = False,
) -> jnp.ndarray:
    """Greedy-NMS keep mask for score-sorted candidate rows.

    Args:
      scores: [R, K] descending scores (R = batch*classes rows).
      boxes: [R, K, 4] corner boxes.
      interpret: run in Pallas interpreter mode (for CPU tests).

    Returns:
      keep: [R, K] bool.
    """
    r, k = scores.shape
    k_pad = _round_up(k, 128)
    r_pad = _round_up(r, ROW_TILE)
    if k_pad != k or r_pad != r:
        scores = jnp.pad(scores, ((0, r_pad - r), (0, k_pad - k)))
        boxes = jnp.pad(boxes, ((0, r_pad - r), (0, k_pad - k), (0, 0)))

    planes = [boxes[..., i] for i in range(4)]  # ymin/xmin/ymax/xmax [R, K]

    kernel = functools.partial(
        _nms_kernel,
        k_pad=k_pad,
        nms_threshold=nms_threshold,
        keep_top_k=keep_top_k,
        mode=mode,
    )
    spec = pl.BlockSpec((ROW_TILE, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    keep = pl.pallas_call(
        kernel,
        grid=(r_pad // ROW_TILE,),
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((r_pad, k_pad), jnp.int32),
        interpret=interpret,
    )(scores, *planes)
    return keep[:r, :k].astype(bool)


GROUP = 16  # instances per grid program for the fixpoint kernel


def _nms_fixpoint_kernel(
    scores_ref, ymin_ref, xmin_ref, ymax_ref, xmax_ref, keep_ref,
    *, k_pad, nms_threshold, mode,
):
    """GROUP instances per program, all iterated in ONE batched while_loop;
    per instance the [K, K] overlap matrix is built in VMEM and the
    greedy-suppression fixpoint (see ops/nms.nms_sorted_fixpoint) runs in
    O(chain-depth) VPU passes with zero HBM traffic for the matrix.

    Transpose-free trick: overlap is SYMMETRIC, so the strictly-upper mask of
    ov ([suppressor i on sublanes, candidate j on lanes]) and its strictly-
    lower mask give both orientations of the suppression operator F. Each
    loop step applies F twice — rows from the column state, then columns from
    the fresh row state (F∘F reaches the same unique fixpoint in half the
    iterations; level k of the greedy recurrence settles after k
    applications of F regardless of grouping)."""
    g, k = GROUP, k_pad
    scores = scores_ref[...]  # [G, K]
    y0 = ymin_ref[...]
    x0 = xmin_ref[...]
    y1 = ymax_ref[...]
    x1 = xmax_ref[...]
    vol = (y1 - y0) * (x1 - x0)

    def cols_of(a):  # [G, K] -> [G, K, 1]
        return jnp.swapaxes(a[:, None, :], 1, 2)

    y0r, x0r, y1r, x1r, volr = (a[:, None, :] for a in (y0, x0, y1, x1, vol))
    y0c, x0c, y1c, x1c, volc = (cols_of(a) for a in (y0, x0, y1, x1, vol))

    inter = jnp.maximum(jnp.minimum(y1c, y1r) - jnp.maximum(y0c, y0r), 0.0) * (
        jnp.maximum(jnp.minimum(x1c, x1r) - jnp.maximum(x0c, x0r), 0.0)
    )  # [G, K, K]: i on sublanes, j on lanes
    if mode == "union":
        denom = volc + volr - inter
    else:  # 'min'
        denom = jnp.minimum(volc, volr)
    # ov >= t  <=>  inter >= t * denom (for denom > 0) — division-free, and
    # exact: both sides are products/sums of f32 box coordinates.
    hit = (inter >= nms_threshold * denom) & (denom > 0.0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, k, k), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, k, k), 2)
    # Masks and keep-state are exactly {0, 1}: bf16 products/maxes are exact,
    # and halve the VPU traffic of the fixpoint loop.
    sup_u = jnp.where(hit & (rows < cols), 1.0, 0.0).astype(jnp.bfloat16)
    sup_l = jnp.where(hit & (rows > cols), 1.0, 0.0).astype(jnp.bfloat16)

    valid_r = (scores > 0.0).astype(jnp.bfloat16)  # [G, K]
    valid_c = cols_of(valid_r)  # [G, K, 1]

    def cond(c):
        keep_r, prev_r, keep_c, it = c
        # i1 vector comparisons hit Mosaic relayout limits — use arithmetic:
        # states are exactly {0,1}, so any change has |diff| sum >= 1.
        diff = keep_r.astype(jnp.float32) - prev_r.astype(jnp.float32)
        changed = jnp.sum(jnp.abs(diff)) > 0.0
        return changed & (it < k)

    def body(c):
        keep_r, _, keep_c, it = c
        # rows from columns: suppressed_j = max_i sup_u[i,j] * keep[i]
        new_r = valid_r * (1.0 - jnp.max(sup_u * keep_c, axis=1))
        # columns from the fresh rows (second F application, transpose-free):
        new_c = valid_c * (
            1.0 - jnp.max(sup_l * new_r[:, None, :], axis=2, keepdims=True)
        )
        return new_r, keep_r, new_c, it + 1

    # Seed: one application from keep0 = valid.
    keep_c0 = valid_c * (
        1.0 - jnp.max(sup_l * valid_r[:, None, :], axis=2, keepdims=True)
    )
    keep_r, _, keep_c, _ = jax.lax.while_loop(
        cond, body, (valid_r, 1.0 - valid_r, keep_c0, 0)
    )
    # One final row update from the settled columns so both views agree.
    keep_r = valid_r * (1.0 - jnp.max(sup_u * keep_c, axis=1))
    keep_ref[...] = (keep_r.astype(jnp.float32) > 0.0).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("nms_threshold", "mode", "interpret")
)
def pallas_nms_fixpoint_keep_mask(
    scores: jnp.ndarray,
    boxes: jnp.ndarray,
    nms_threshold: float = 0.5,
    mode: str = "min",
    interpret: bool = False,
) -> jnp.ndarray:
    """Fixpoint greedy-NMS keep mask (uncapped) for score-sorted rows.

    scores [R, K] descending, boxes [R, K, 4] -> keep [R, K] bool. Apply the
    keep_top_k cap downstream (cumsum), as nms_sorted_fixpoint does.
    """
    r, k = scores.shape
    k_pad = _round_up(k, 128)
    r_pad = _round_up(r, GROUP)
    if k_pad != k or r_pad != r:
        scores = jnp.pad(scores, ((0, r_pad - r), (0, k_pad - k)))
        boxes = jnp.pad(boxes, ((0, r_pad - r), (0, k_pad - k), (0, 0)))
    planes = [boxes[..., i] for i in range(4)]

    kernel = functools.partial(
        _nms_fixpoint_kernel, k_pad=k_pad, nms_threshold=nms_threshold, mode=mode
    )
    spec = pl.BlockSpec((GROUP, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    keep = pl.pallas_call(
        kernel,
        grid=(r_pad // GROUP,),
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((r_pad, k_pad), jnp.int32),
        interpret=interpret,
    )(scores, *planes)
    return keep[:r, :k].astype(bool)


def nms_sorted_pallas(scores, boxes, nms_threshold=0.5, keep_top_k=200, mode="min",
                      interpret="auto", method: str = "fixpoint"):
    """Drop-in variant of `ops.nms.nms_sorted` for batched rows.

    scores [R, K], boxes [R, K, 4] -> (scores [R, keep_top_k],
    boxes [R, keep_top_k, 4]) compacted in score order. method='fixpoint'
    (chain-depth iterations on a VMEM overlap matrix) or 'scan' (the
    K-step sequential kernel); both produce the sequential-greedy keep set.

    interpret: True/False, or 'auto' (default) — with 'auto' the
    interpret-vs-compiled choice is made at XLA lowering time
    (lax.platform_dependent), following the platform the computation is
    actually placed on rather than the ambient default platform.
    """
    if method == "fixpoint":
        mask_fn = functools.partial(
            pallas_nms_fixpoint_keep_mask,
            nms_threshold=nms_threshold, mode=mode,
        )
    else:
        mask_fn = functools.partial(
            pallas_nms_keep_mask,
            nms_threshold=nms_threshold, keep_top_k=keep_top_k, mode=mode,
        )
    if interpret == "auto":
        keep = jax.lax.platform_dependent(
            scores, boxes,
            cpu=functools.partial(mask_fn, interpret=True),
            default=functools.partial(mask_fn, interpret=False),
        )
    else:
        keep = mask_fn(scores, boxes, interpret=bool(interpret))
    pos = jnp.cumsum(keep, axis=-1) - 1
    keep = keep & (pos < keep_top_k)
    dst = jnp.where(keep, pos, keep_top_k)
    r = scores.shape[0]
    out_s = jnp.zeros((r, keep_top_k), scores.dtype)
    out_b = jnp.zeros((r, keep_top_k, 4), boxes.dtype)
    out_s = out_s.at[jnp.arange(r)[:, None], dst].set(scores, mode="drop")
    out_b = out_b.at[jnp.arange(r)[:, None], dst].set(boxes, mode="drop")
    return out_s, out_b
