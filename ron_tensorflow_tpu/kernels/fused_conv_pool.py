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

STATUS: numerically verified against XLA (interpret + TPU). The whole-block
kernel (`fused_vgg_block1`) wins at 320² batch 32 (1.16x over XLA) and is
wired in behind opt-in flags; the single-conv variants only TIE XLA on v5e
(per-program VPU data movement eats the bandwidth savings; see NOTES.md).
`fused_vgg_block1` is differentiable via a recompute-based custom VJP.
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
    """[3, 3, ci, co] conv kernel -> [3, 6ci, 2co] merged taps, row taps
    stacked on K.

    Derivation: with columns merged pairwise (even|odd channel blocks),
      even_out[w2] = W0 @ odd[w2-1] + W1 @ even[w2] + W2 @ odd[w2]
      odd_out[w2]  = W0 @ even[w2]  + W1 @ odd[w2]  + W2 @ even[w2+1]
    giving block matrices for merged shifts d = -1, 0, +1.
    """
    ci, co = w.shape[2], w.shape[3]
    z = jnp.zeros((ci, co), w.dtype)
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


def _merged_conv3x3(x_tile, w_taps, bias, rows_out, width2):
    """SAME 3x3 conv on a merged-column tile, + bias + ReLU.

    x_tile: [rows_out + 2, width2, 2ci] (one halo row each side).
    w_taps: [3, 6ci, 2co] merged taps (see merge_stem_weights).
    bias:   [2co] f32.
    Returns [rows_out, width2, 2co] f32 (post-ReLU).
    """
    two_ci = x_tile.shape[-1]
    a3 = jnp.concatenate(
        [x_tile[dy : dy + rows_out] for dy in range(3)], axis=-1
    ).reshape(rows_out * width2, 3 * two_ci)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_out, width2, 1), 1)
    acc = None
    for di, d in enumerate((-1, 0, 1)):
        p = jax.lax.dot_general(
            a3,
            w_taps[di],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(rows_out, width2, -1)
        if d == 0:
            acc = p if acc is None else acc + p
        else:
            rolled = pltpu.roll(p, (-d) % width2, axis=1)
            mask = col_ids >= 1 if d == -1 else col_ids < width2 - 1
            masked = jnp.where(mask, rolled, 0.0)
            acc = masked if acc is None else acc + masked
    return jnp.maximum(acc + bias, 0.0)


def _block1_kernel(
    xa_ref, xb_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, rows, width2, c, h
):
    """Whole VGG double-conv block in one pass: convA(ci->c) + ReLU +
    convB(c->c) + ReLU + 2x2/s2 max-pool, merged-column layout throughout.
    The [H, W, c] intermediates live only in VMEM — HBM sees the [., ., ci]
    input once and the 4x-smaller pooled output once (vs 4 full-activation
    round-trips under XLA). Covers VGG block 1 (ci=3) and block 2 (ci=64).

    xa_ref: [1, rows, width2, 2ci] this row tile (columns pair-merged).
    xb_ref: [1, rows, width2, 2ci] next row tile; first 4 rows = bottom halo
      (2 halo rows per conv).
    w1_ref: [3, 6ci, 2c]; b1_ref/b2_ref: [1, 2c]; w2_ref: [3, 6c, 2c].
    out_ref: [1, rows//2, width2, c].
    """
    x_tile = jnp.concatenate([xa_ref[0], xb_ref[0, :4]], axis=0)  # [rows+4, w2, 2ci]
    y1 = _merged_conv3x3(
        x_tile, w1_ref, b1_ref[0, :].astype(jnp.float32), rows + 2, width2
    )
    # conv1_2's SAME padding is ZERO outside the image, but halo rows beyond
    # it would otherwise carry relu(b1) — zero them.
    g_rows = (
        jax.lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
        + pl.program_id(1) * rows
        - 1
    )
    y1 = jnp.where((g_rows >= 0) & (g_rows < h), y1, 0.0).astype(jnp.bfloat16)
    z = _merged_conv3x3(
        y1, w2_ref, b2_ref[0, :].astype(jnp.float32), rows, width2
    )
    # 2x2/s2 max-pool: row pairs on the sublane dim, column pairs are the
    # (even, odd) channel halves — lane-roll by c then extract the first c
    # lanes with an identity matmul (lane-split reshapes are unsupported).
    z = z.reshape(rows // 2, 2, width2, 2 * c).max(axis=1)
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


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_vgg_block1_impl(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """maxpool2(relu(convB(relu(convA(x))))) — a VGG double-conv block fused.

    x: [B, H, W, Ci]; w1: [3, 3, Ci, C]; w2: [3, 3, C, C]
    -> [B, H/2, W/2, C]. Covers block 1 (Ci=3) and block 2 (Ci=64).
    Forward only — autodiff is provided by the custom-VJP wrapper below.
    """
    batch, h, width, cin = x.shape
    assert w1.shape[:3] == (3, 3, cin)
    c = w1.shape[-1]
    assert w2.shape == (3, 3, c, c)
    width2 = width // 2

    rows = None
    for cand in (32, 16, 12, 8, 4):
        if h % cand == 0:
            # y1 f32+bf16 copies + a3 concat dominate VMEM
            tile_bytes = (cand + 2) * width2 * 2 * c * (4 + 2) * 3
            if tile_bytes < 10 * 1024 * 1024:
                rows = cand
                break
    assert rows is not None, (
        f"no usable row tile for H={h} (see models/vgg.fused_block1_supported)"
    )

    n_tiles = h // rows
    # 2 top halo rows; bottom rounded up one extra tile for the halo fetch.
    xp = jnp.pad(x, ((0, 0), (2, (n_tiles + 1) * rows - h - 2), (0, 0), (0, 0)))
    xm = xp.reshape(batch, (n_tiles + 1) * rows, width2, 2 * cin).astype(jnp.bfloat16)
    w1m = merge_stem_weights(w1).astype(jnp.bfloat16)  # [3, 6ci, 2c]
    w2m = merge_stem_weights(w2).astype(jnp.bfloat16)  # [3, 6c, 2c]
    b1m = jnp.concatenate([b1, b1]).reshape(1, 2 * c)
    b2m = jnp.concatenate([b2, b2]).reshape(1, 2 * c)

    kernel = functools.partial(_block1_kernel, rows=rows, width2=width2, c=c, h=h)
    tile_spec = lambda off: pl.BlockSpec(
        (1, rows, width2, 2 * cin),
        lambda bi, ri, _off=off: (bi, ri + _off, 0, 0),
        memory_space=pltpu.VMEM,
    )
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda bi, ri: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(batch, n_tiles),
        in_specs=[
            tile_spec(0),
            tile_spec(1),
            const_spec((3, 6 * cin, 2 * c)),
            const_spec((1, 2 * c)),
            const_spec((3, 6 * c, 2 * c)),
            const_spec((1, 2 * c)),
        ],
        out_specs=pl.BlockSpec(
            (1, rows // 2, width2, c),
            lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, h // 2, width2, c), x.dtype),
        interpret=interpret,
    )(xm, xm, w1m, b1m, w2m, b2m)


def _block1_xla_reference(x, w1, b1, w2, b2):
    """The exact XLA composition the Pallas block-1 kernel replaces
    (Conv semantics of models/layers.py: params cast to the activation
    dtype, SAME padding, ReLU; then 2x2/s2 max pool). Used by the custom
    VJP to derive the backward pass — residuals are recomputed here, so
    the fused forward doubles as rematerialization (no block-1
    activations are saved for the backward)."""
    dn = ("NHWC", "HWIO", "NHWC")
    h1 = jax.nn.relu(
        jax.lax.conv_general_dilated(
            x, w1.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn
        )
        + b1.astype(x.dtype)
    )
    h2 = jax.nn.relu(
        jax.lax.conv_general_dilated(
            h1, w2.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn
        )
        + b2.astype(x.dtype)
    )
    from ..models.layers import max_pool_2x2

    return max_pool_2x2(h2)


def _fused_vgg_block1_dispatch(x, w1, b1, w2, b2, interpret):
    """interpret True/False runs that mode; 'auto' defers the choice to XLA
    LOWERING time via lax.platform_dependent, so the kernel follows the
    platform the computation is actually placed on — never the ambient
    default platform (jax.devices()[0] can be a tunneled TPU while the
    arrays are committed to a CPU mesh; reading it here mis-dispatched
    exactly that case)."""
    if interpret == "auto":
        return jax.lax.platform_dependent(
            x, w1, b1, w2, b2,
            cpu=functools.partial(_fused_vgg_block1_impl, interpret=True),
            default=functools.partial(_fused_vgg_block1_impl, interpret=False),
        )
    return _fused_vgg_block1_impl(x, w1, b1, w2, b2, interpret=bool(interpret))


# The platform_dependent dispatch lives INSIDE the custom_vjp primal:
# lax.cond branches cannot be linearized through a custom_vjp function, but
# a custom_vjp whose primal contains the cond differentiates fine (autodiff
# only ever sees the registered bwd).
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_vgg_block1_ad(interpret, x, w1, b1, w2, b2):
    return _fused_vgg_block1_dispatch(x, w1, b1, w2, b2, interpret)


def _fused_vgg_block1_fwd(interpret, x, w1, b1, w2, b2):
    # Save only the inputs: block-1 intermediates ([B,H,W,64] x2, the
    # largest activations in the network) never reach HBM in fwd OR bwd.
    return (
        _fused_vgg_block1_dispatch(x, w1, b1, w2, b2, interpret),
        (x, w1, b1, w2, b2),
    )


def _fused_vgg_block1_bwd(interpret, residuals, g):
    del interpret
    _, vjp = jax.vjp(_block1_xla_reference, *residuals)
    return vjp(g)


_fused_vgg_block1_ad.defvjp(_fused_vgg_block1_fwd, _fused_vgg_block1_bwd)


def fused_vgg_block1(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    interpret="auto",
) -> jnp.ndarray:
    """maxpool2(relu(convB(relu(convA(x))))) fused in one Pallas pass.

    Differentiable: the forward runs the Pallas kernel (block-1
    intermediates stay in VMEM); the backward recomputes them via the XLA
    composition and differentiates that (flash-attention-style
    recompute-VJP), so training saves both the forward kernel time and the
    HBM round-trips of stored block-1 activations.

    interpret: True/False, or 'auto' (default) to pick interpret mode per
    the platform the computation is lowered for."""
    if interpret != "auto":
        interpret = bool(interpret)
    return _fused_vgg_block1_ad(interpret, x, w1, b1, w2, b2)


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
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM; DMA'd manually
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
