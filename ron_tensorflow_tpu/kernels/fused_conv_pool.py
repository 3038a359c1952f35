"""Pallas TPU kernel: fused 3x3 conv + bias + ReLU + 2x2/s2 max-pool.

Motivation (measured on v5e, batch 32): every VGG block tail
(convN_k -> ReLU -> pool) round-trips its full activation through HBM twice
under XLA — at 320x320x64 that's ~840 MB per step against ~500 GB/s
effective bandwidth, making the stem bandwidth-bound (block1 alone is ~40%
of the backbone). Fusing conv+ReLU+pool into one kernel halves the traffic:
read the conv input once (tiles DMA'd HBM->VMEM with a 2-row halo), write
only the pooled output (4x smaller).

The conv is computed as 9 shifted [rows*W, C] x [C, Co] MXU matmuls
accumulated in f32; pooling is two max-reductions over split sublane dims.

STATUS: experimental — numerically verified against XLA (interpret + TPU)
but currently only TIES XLA's fused timing on v5e (per-program VPU data
movement eats the bandwidth savings; see NOTES.md), so the models do NOT
wire it in by default. No autodiff: inference only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stem_kernel(xa_ref, xb_ref, w_ref, b_ref, out_ref, *, rows, width2, c):
    """Merged-column stem tile: conv3x3(C=c) + ReLU + 2x2 pool, with column
    pairs packed into 2c lanes.

    xa_ref: [1, rows, W/2, 2c] — this row tile (adjacent column pairs merged
      into channels — a pure reshape of NHWC; input padded on H).
    xb_ref: [1, rows, W/2, 2c] — the NEXT row tile; its first 2 rows are the
      bottom halo. Fetching the halo as a second auto-pipelined block keeps
      Pallas's double buffering (a manual in-kernel DMA serializes the
      pipeline and costs ~10x).
    w_ref: [3, 6c, 2c] merged taps: for merged-column shift
      d in {-1, 0, +1}, the [2c, 2c] block matrix routing (even|odd) input
      channels to (even|odd) output columns (see merge_stem_weights).
    out_ref: [1, rows//2, W/2, c] pooled output tile.
    """
    x_tile = jnp.concatenate([xa_ref[0], xb_ref[0, :2]], axis=0)  # [rows+2, W/2, 2c]

    # Stack the three row taps along the contraction dim: one [rows*W/2, 6c]
    # x [6c, 2c] matmul per column shift (3 total) instead of 9 — fewer VPU
    # roll/add epilogues, better MXU K-occupancy.
    a3 = jnp.concatenate(
        [x_tile[dy : dy + rows] for dy in range(3)], axis=-1
    ).reshape(rows * width2, 6 * c)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, width2, 1), 1)
    acc = jnp.zeros((rows, width2, 2 * c), jnp.float32)
    for di, d in enumerate((-1, 0, 1)):
        p = jax.lax.dot_general(
            a3,
            w_ref[di],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(rows, width2, 2 * c)
        # out[w2] needs p[w2 + d]: roll by -d (mod) and mask the wrap.
        if d == 0:
            acc = acc + p
        else:
            rolled = pltpu.roll(p, (-d) % width2, axis=1)
            if d == -1:
                mask = col_ids >= 1
            else:
                mask = col_ids < width2 - 1
            acc = acc + jnp.where(mask, rolled, 0.0)

    z = jnp.maximum(acc + b_ref[0, :].astype(jnp.float32), 0.0)
    z = z.reshape(rows // 2, 2, width2, 2 * c).max(axis=1)  # row pool
    # Column-pair pool = max over the (even, odd) channel halves. Lane-split
    # reshapes are unsupported in Mosaic, so: circular lane roll by c gives
    # max(z_j, z_{j+c}) duplicated across both halves, then an identity
    # matmul extracts the first c lanes.
    zmax = jnp.maximum(z, pltpu.roll(z, c, axis=2))
    i2c = jax.lax.broadcasted_iota(jnp.int32, (2 * c, c), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (2 * c, c), 1)
    eye = (i2c == ic).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        zmax.reshape((rows // 2) * width2, 2 * c).astype(jnp.bfloat16),
        eye,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.reshape(rows // 2, width2, c).astype(out_ref.dtype)


def merge_stem_weights(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, c, c] conv kernel -> [3, 6c, 2c] merged taps, row taps stacked on K.

    Derivation: with columns merged pairwise (even|odd channel blocks),
      even_out[w2] = W0 @ odd[w2-1] + W1 @ even[w2] + W2 @ odd[w2]
      odd_out[w2]  = W0 @ even[w2]  + W1 @ odd[w2]  + W2 @ even[w2+1]
    giving block matrices for merged shifts d = -1, 0, +1.
    """
    c = w.shape[2]
    z = jnp.zeros((c, c), w.dtype)
    per_shift = {-1: [], 0: [], 1: []}
    for dy in range(3):
        w0, w1, w2 = w[dy, 0], w[dy, 1], w[dy, 2]
        per_shift[-1].append(jnp.block([[z, z], [w0, z]]))  # col w2-1: odd->even
        per_shift[0].append(jnp.block([[w1, w0], [w2, w1]]))
        per_shift[1].append(jnp.block([[z, w2], [z, z]]))  # col w2+1: even->odd
    # [3 shifts, 3*2c (stacked row taps), 2c]
    return jnp.stack([jnp.concatenate(per_shift[d], axis=0) for d in (-1, 0, 1)])


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_stem_conv_relu_pool2(
    x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Block-1 tail: maxpool2x2(relu(conv3x3_SAME(x, w) + b)) for C=Co=64-ish
    channels, with column-pair merging so DMA lanes are 2C >= 128 and the
    MXU contracts over 2C.

    x: [B, H, W, C]; w: [3, 3, C, C]; b: [C] -> [B, H//2, W//2, C].
    """
    batch, h, width, c = x.shape
    assert w.shape == (3, 3, c, c)
    width2 = width // 2

    rows = h
    for cand in (32, 16, 8, 4, 2):
        if h % cand == 0:
            tile_bytes = 4 * cand * width2 * 2 * c * 2 + 2 * cand * width2 * 2 * c * 4
            if tile_bytes < 10 * 1024 * 1024:
                rows = cand
                break

    # Pad H by 1 (top halo) and round up to one extra block row so the
    # next-tile halo fetch stays in bounds.
    n_tiles = h // rows
    xp = jnp.pad(x, ((0, 0), (1, (n_tiles + 1) * rows - h - 1), (0, 0), (0, 0)))
    xm = xp.reshape(batch, (n_tiles + 1) * rows, width2, 2 * c).astype(jnp.bfloat16)
    wm = merge_stem_weights(w).astype(jnp.bfloat16)
    bm = jnp.concatenate([b, b]).reshape(1, 2 * c)

    kernel = functools.partial(_stem_kernel, rows=rows, width2=width2, c=c)
    tile_spec = lambda off: pl.BlockSpec(
        (1, rows, width2, 2 * c),
        lambda bi, ri, _off=off: (bi, ri + _off, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(batch, n_tiles),
        in_specs=[
            tile_spec(0),
            tile_spec(1),
            pl.BlockSpec((3, 6 * c, 2 * c), lambda bi, ri: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda bi, ri: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows // 2, width2, c),
            lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, h // 2, width2, c), x.dtype),
        interpret=interpret,
    )(xm, xm, wm, bm)


def _kernel(x_hbm, w_ref, b_ref, out_ref, x_vmem, sem, *, rows, width, cin, cout):
    """One (batch, row-tile) program.

    x_hbm: [B, H+2, W, C] input padded on H only (W stays tile-aligned),
      resident in HBM.
    w_ref: [9, cin, cout] packed 3x3 taps (VMEM).
    b_ref: [1, cout] (VMEM).
    out_ref: [1, rows//2, width//2, cout] pooled output tile (VMEM).
    x_vmem: [rows+2, width, cin] scratch; sem: DMA semaphore.

    Column taps are applied on the matmul OUTPUT via lane-roll + boundary
    masks (unaligned sublane slices are not expressible in Mosaic); row taps
    are free dim-0 slices of the halo'd tile.
    """
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ri * rows, rows + 2), :, :], x_vmem, sem
    )
    copy.start()
    copy.wait()

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, width, 1), 1)

    acc = jnp.zeros((rows, width, cout), jnp.float32)
    for dy in range(3):
        a2 = x_vmem[dy : dy + rows].reshape(rows * width, cin)
        for dx in range(3):
            p = jax.lax.dot_general(
                a2,
                w_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(rows, width, cout)
            # out[x] needs p[x + dx - 1]: roll by (1 - dx) and zero the
            # wrapped boundary column.
            shift = 1 - dx
            if shift == 0:
                acc = acc + p
            else:
                rolled = pltpu.roll(p, shift % width, axis=1)
                if shift > 0:
                    mask = col_ids >= shift
                else:
                    mask = col_ids < width + shift
                acc = acc + jnp.where(mask, rolled, 0.0)

    z = jnp.maximum(acc + b_ref[0, :].astype(jnp.float32), 0.0)
    # 2x2/s2 max pool: rows via free dim-0 split; columns via roll + pairwise
    # max + paired-channel reshape downsample.
    z = z.reshape(rows // 2, 2, width, cout).max(axis=1)  # [rows/2, W, Co]
    zmax = jnp.maximum(z, pltpu.roll(z, width - 1, axis=1))  # [r, W, Co]; col c vs c+1
    # Take even columns: merge column pairs into channels (pure reshape),
    # the even column is the first Co block of each merged pair.
    zz = zmax.reshape(rows // 2, width // 2, 2, cout)
    out_ref[0] = zz[:, :, 0, :].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_conv3x3_relu_pool2(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = maxpool2x2(relu(conv3x3_SAME(x, w) + b)).

    Args:
      x: [B, H, W, C] activations (H, W even).
      w: [3, 3, C, Co] conv kernel (HWIO).
      b: [Co] bias.

    Returns: [B, H//2, W//2, Co].
    """
    batch, h, width, cin = x.shape
    cout = w.shape[-1]
    assert h % 2 == 0 and width % 2 == 0, "even spatial dims required"

    # Row tile: as many conv rows per program as VMEM comfortably allows.
    rows = h
    for cand in (64, 32, 16, 8, 4, 2):
        if h % cand == 0:
            tile_bytes = (
                (cand + 2) * width * cin * 2  # input scratch (bf16)
                + 2 * cand * width * cout * 4  # f32 accumulator + tap product
                + 9 * cin * cout * 2
            )
            if tile_bytes < 10 * 1024 * 1024:
                rows = cand
                break

    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0))).astype(jnp.bfloat16)
    wp = w.reshape(9, cin, cout).astype(jnp.bfloat16)
    bp = b.reshape(1, cout)

    kernel = functools.partial(_kernel, rows=rows, width=width, cin=cin, cout=cout)
    return pl.pallas_call(
        kernel,
        grid=(batch, h // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # stays in HBM; DMA'd manually
            pl.BlockSpec((9, cin, cout), lambda bi, ri: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, ri: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows // 2, width // 2, cout),
            lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, h // 2, width // 2, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, width, cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wp, bp)
