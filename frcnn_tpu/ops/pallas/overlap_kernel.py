"""Pallas TPU kernel for anchor_target_layer's IoU reductions.

The RPN target layer (``lib/layer_utils/anchor_target_layer.py:~20-180``,
SURVEY.md #15) needs four reductions of the (K anchors x G gt) IoU matrix:
per-anchor max and argmax, per-gt max, and the argmax-per-gt tie membership
(every anchor achieving a gt's max overlap is fg).  The dense jnp form
materializes several (K, G) f32 intermediates in HBM — at FPN train scale
(155k anchors x 64 padded gt x batch 8) that is ~10 ms of the step.  This
kernel computes the IoU tiles in VMEM and writes only the O(K) reductions:
the (K, G) matrix never exists.

Layout: gt on SUBLANES (G <= 64, padded to a sublane multiple), anchors on
LANES in tiles of ``TILE`` — so every per-anchor reduction is a sublane
reduce landing directly in the (1, TILE) output rows, with no transposes.
Anchor coordinates arrive transposed as (4, K) rows (the NMS kernel's
convention); gt coordinates as (G, 4) columns.

The argmax-per-gt ULP trap (see NEXT.md): tie membership must compare
floats produced by ONE compiled pass — two separately-lowered IoU
computations are not bitwise identical.  So the kernel stores, per tile,
(a) each gt's tile-max overlap and (b) per anchor a G-bit mask of which
gts it ties *within its own tile* (packed into two int32 words; both (a)
and (b) come from the same in-register values).  A tiny XLA epilogue then
reduces tile maxes to the global per-gt max and resolves membership purely
on the STORED floats: an anchor ties a gt's global max iff it ties that
gt's tile max and the tile max equals the global max.

Exactness: all comparisons are f32 equality on values computed once, so
the fg/bg label *structure* (argmax indices, tie membership) is exact.
The max-overlap floats differ from the dense jnp form at ULP level (any
two separately compiled IoU computations do — fusion/FMA ordering);
tests/test_pallas_kernels.py asserts structural equality + 2e-7 closeness
on the floats (interpret mode on CPU; compiled on TPU under
FRCNN_TPU_TEST_TPU=1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 4096          # anchors per grid step (lane axis, multiple of 128)
MAX_GT_WORDS = 64    # tie bits are packed into two int32 words → G <= 64


def _bit_weights(g_col):
    """(G, 1) int32 gt index → the two packed-word weight columns.

    Word 0 holds bits for g in [0, 32), word 1 for g in [32, 64); the weight
    is 1 << (g % 32) computed with the shift masked into range (a shift by
    >= 32 is undefined).  Distinct powers of two sum without carries, so an
    int32 sum over the gt axis of tie * weight IS the packed bitmask (the
    g == 31 / 63 bit wraps to the sign bit; the epilogue packs its gate
    words with the identical convention so the patterns match).
    """
    one = jnp.int32(1)
    low = g_col < 32
    sh = jnp.where(low, g_col, g_col - 32)
    w = jax.lax.shift_left(one, sh)
    return jnp.where(low, w, 0), jnp.where(low, 0, w)


def _overlap_kernel(anchors_ref, gt_ref, gtv_ref, inside_ref,
                    mx_ref, am_ref, tie0_ref, tie1_ref, tgm_ref, *, g):
    a = anchors_ref[:, :]                                   # (4, TILE)
    ax1, ay1, ax2, ay2 = (a[i:i + 1, :] for i in range(4))  # (1, TILE)
    gt = gt_ref[:, :]                                       # (G, 4)
    gx1, gy1, gx2, gy2 = (gt[:, i:i + 1] for i in range(4))  # (G, 1)

    iw = jnp.minimum(ax2, gx2) - jnp.maximum(ax1, gx1) + 1.0  # (G, TILE)
    ih = jnp.minimum(ay2, gy2) - jnp.maximum(ay1, gy1) + 1.0
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    area_a = (ax2 - ax1 + 1.0) * (ay2 - ay1 + 1.0)
    area_g = (gx2 - gx1 + 1.0) * (gy2 - gy1 + 1.0)
    ov = inter / (area_a + area_g - inter)

    mask = (gtv_ref[:, :] > 0) & (inside_ref[:, :] > 0)     # (G,1)&(1,TILE)
    ov = jnp.where(mask, ov, -1.0)

    mx = jnp.max(ov, axis=0, keepdims=True)                  # (1, TILE)
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)  # (G, 1)
    am = jnp.min(jnp.where(ov == mx, g_iota, g), axis=0, keepdims=True)

    tgm = jnp.max(ov, axis=1, keepdims=True)                 # (G, 1)
    tie = (ov == tgm).astype(jnp.int32)                      # (G, TILE)
    w0, w1 = _bit_weights(g_iota)

    mx_ref[:, :] = mx
    am_ref[:, :] = am
    tie0_ref[:, :] = jnp.sum(tie * w0, axis=0, keepdims=True)
    tie1_ref[:, :] = jnp.sum(tie * w1, axis=0, keepdims=True)
    tgm_ref[:, :, :] = tgm[None]


@partial(jax.jit, static_argnames=("interpret",))
def _overlap_stats_padded(anchors_t, gt, gtv_col, inside_row,
                          interpret: bool = False):
    """anchors_t (4, K) f32, gt (G, 4) f32, gtv_col (G, 1) f32,
    inside_row (1, K) f32; K % TILE == 0, G % 8 == 0, G <= 64."""
    k = anchors_t.shape[1]
    g = gt.shape[0]
    n_tiles = k // TILE
    out = pl.pallas_call(
        partial(_overlap_kernel, g=g),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((4, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.int32),
            jax.ShapeDtypeStruct((1, k), jnp.int32),
            jax.ShapeDtypeStruct((1, k), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, g, 1), jnp.float32),
        ],
        interpret=interpret,
    )(anchors_t, gt, gtv_col, inside_row)
    mx, am, tie0, tie1, tgm = out

    # Epilogue (all O(K) or O(T*G)): global per-gt max over tile maxes, then
    # tie membership from stored floats only.
    tgm = tgm[:, :, 0]                                       # (T, G)
    gt_max = jnp.max(tgm, axis=0)                            # (G,)
    winner = (tgm == gt_max[None, :]) & (gt_max[None, :] > 0)  # (T, G)
    gw = np.left_shift(np.uint32(1),
                       np.arange(g, dtype=np.uint32) % 32).view(np.int32)
    gw = jnp.asarray(gw)                                     # (G,) same packing
    ww0 = jnp.sum(jnp.where(winner & (jnp.arange(g) < 32)[None, :],
                            gw[None, :], 0), axis=1)         # (T,)
    ww1 = jnp.sum(jnp.where(winner & (jnp.arange(g) >= 32)[None, :],
                            gw[None, :], 0), axis=1)
    per_anchor = lambda w: jnp.repeat(w, TILE, total_repeat_length=k)
    is_ga = ((tie0[0] & per_anchor(ww0)) | (tie1[0] & per_anchor(ww1))) != 0
    return mx[0], am[0], is_ga


def anchor_overlap_stats(anchors, gt_boxes, gt_valid, inside,
                         interpret: bool = False):
    """The four anchor_target_layer IoU reductions without the (K, G) matrix.

    anchors (K, 4) f32, gt_boxes (G, 4) f32, gt_valid (G,) bool,
    inside (K,) bool → (max_overlaps (K,) f32, argmax_overlaps (K,) int32,
    is_gt_argmax (K,) bool), bit-identical to the dense jnp form in
    frcnn_tpu.models.targets (invalid gt / outside anchors masked to -1).
    Requires G <= 64 (callers fall back to the dense form beyond).
    """
    k = anchors.shape[0]
    g = gt_boxes.shape[0]
    if g > MAX_GT_WORDS:
        raise ValueError(f"anchor_overlap_stats supports G <= 64, got {g}")
    pad_k = (-k) % TILE
    pad_g = (-g) % 8
    anchors_t = jnp.pad(anchors.astype(jnp.float32),
                        ((0, pad_k), (0, 0))).T               # (4, K')
    inside_row = jnp.pad(inside, (0, pad_k)).astype(jnp.float32)[None, :]
    gt = jnp.pad(gt_boxes.astype(jnp.float32), ((0, pad_g), (0, 0)))
    gtv_col = jnp.pad(gt_valid, (0, pad_g)).astype(jnp.float32)[:, None]
    mx, am, is_ga = _overlap_stats_padded(anchors_t, gt, gtv_col, inside_row,
                                          interpret=interpret)
    # padded gt rows are invalid → ov -1 → can't win; padded anchors dropped
    am = jnp.minimum(am, g - 1)  # all-(-1) rows argmin to 0 anyway; clamp pad g
    return mx[:k], am[:k], is_ga[:k]
