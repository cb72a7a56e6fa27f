"""Pallas TPU greedy-NMS kernel.

TPU-native replacement for the reference's CUDA NMS
(``lib/nms/src/cuda/nms_kernel.cu:~1-150``, SURVEY.md #19).  Same blocked
algorithm family as the CUDA kernel's 64-box tiles, shaped for the VPU:

  boxes arrive score-DESC sorted (the proposal layer sorts).  Grid steps walk
  score-ordered tiles of 128 boxes sequentially (TPU grid steps run in order
  on one core, so a VMEM scratch carries the running suppressed mask):
    1. resolve intra-tile greedy suppression (128 tiny steps over a
       128x128 pairwise-IoU matrix, pure vector ops — no dynamic indexing:
       row i is extracted with an iota==i mask);
    2. the tile's kept boxes suppress all later boxes in one vectorized
       (128 x CHUNK) IoU sweep, chunked to bound VMEM.

Exactly greedy — bit-identical to ``frcnn_tpu.ops.nms.nms_mask`` (tested in
tests/test_pallas_kernels.py, interpret mode on CPU + compiled on TPU).

Layout notes: coordinates are passed transposed as (4, N) so each chunk slice
is a lane-aligned (1, CHUNK) row; masks live as (1, N) int32 rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
CHUNK = 1024


def _iou_mask(x1a, y1a, x2a, y2a, x1b, y1b, x2b, y2b, thresh):
    """Pairwise IoU > thresh for column vectors a (T,1) vs row vectors b (1,C)."""
    iw = jnp.minimum(x2a, x2b) - jnp.maximum(x1a, x1b) + 1.0
    ih = jnp.minimum(y2a, y2b) - jnp.maximum(y1a, y1b) + 1.0
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    inter = iw * ih
    area_a = (x2a - x1a + 1.0) * (y2a - y1a + 1.0)
    area_b = (x2b - x1b + 1.0) * (y2b - y1b + 1.0)
    return inter > thresh * (area_a + area_b - inter)


def _nms_kernel(coords_ref, valid_ref, keep_ref, sup_ref, *, thresh, n):
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _():
        sup_ref[:, :] = 1 - valid_ref[:, :]

    start = pl.multiple_of(ti * TILE, TILE)
    # tile coordinates as columns (T, 1)
    xt1 = coords_ref[0:1, pl.ds(start, TILE)].reshape(TILE, 1)
    yt1 = coords_ref[1:2, pl.ds(start, TILE)].reshape(TILE, 1)
    xt2 = coords_ref[2:3, pl.ds(start, TILE)].reshape(TILE, 1)
    yt2 = coords_ref[3:4, pl.ds(start, TILE)].reshape(TILE, 1)

    # (T, T) intra-tile IoU > thresh
    masked = _iou_mask(xt1, yt1, xt2, yt2,
                       xt1.reshape(1, TILE), yt1.reshape(1, TILE),
                       xt2.reshape(1, TILE), yt2.reshape(1, TILE), thresh)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)

    # int32 carry: Mosaic cannot legalize loops carrying i1 vectors
    sup_t = sup_ref[0:1, pl.ds(start, TILE)]  # (1, T) i32

    def intra(i, sup_t):
        alive = jnp.max(jnp.where(t_idx == i, sup_t, 0)) == 0  # scalar
        row = jnp.any(masked & (row_idx == i), axis=0, keepdims=True)  # (1, T)
        new = (alive & row & (t_idx > i)).astype(jnp.int32)
        return jnp.maximum(sup_t, new)

    sup_t = jax.lax.fori_loop(0, TILE, intra, sup_t)
    kept = 1 - sup_t  # (1, T) i32
    sup_ref[0:1, pl.ds(start, TILE)] = sup_t
    keep_ref[:, :] = kept

    # cross-tile: kept tile boxes suppress all later boxes, chunked
    # (reshape in i32: Mosaic can't re-layout 1-bit vectors across dims)
    kept_col = kept.reshape(TILE, 1) > 0
    g_row = start + t_idx.reshape(TILE, 1)  # (T, 1) global row index

    def chunk_body(jb, _):
        cs = pl.multiple_of(jb * CHUNK, CHUNK)
        xc1 = coords_ref[0:1, pl.ds(cs, CHUNK)]
        yc1 = coords_ref[1:2, pl.ds(cs, CHUNK)]
        xc2 = coords_ref[2:3, pl.ds(cs, CHUNK)]
        yc2 = coords_ref[3:4, pl.ds(cs, CHUNK)]
        iou = _iou_mask(xt1, yt1, xt2, yt2, xc1, yc1, xc2, yc2, thresh)
        g_col = cs + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        new_sup = jnp.any(kept_col & iou & (g_col > g_row), axis=0,
                          keepdims=True)  # (1, CHUNK)
        cur = sup_ref[0:1, pl.ds(cs, CHUNK)]
        sup_ref[0:1, pl.ds(cs, CHUNK)] = jnp.maximum(
            cur, new_sup.astype(jnp.int32))
        return 0

    # only chunks at/after this tile can contain later boxes
    first_chunk = start // CHUNK
    jax.lax.fori_loop(first_chunk, n // CHUNK, chunk_body, 0)


@partial(jax.jit, static_argnames=("thresh",))
def _nms_pallas_padded(coords, valid, thresh: float):
    n = coords.shape[1]
    kernel = partial(_nms_kernel, thresh=float(thresh), n=n)
    keep = pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # coords (4, N), whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # valid (1, N), whole
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, n), jnp.int32)],
    )(coords, valid)
    return keep[0]


def nms_mask_pallas(boxes, thresh, valid=None, interpret: bool = False):
    """Greedy NMS keep-mask.  boxes (N, 4) score-DESC sorted → (N,) bool.

    Semantics identical to ops.nms.nms_mask.  N is padded to a multiple of
    lcm(TILE, CHUNK) internally.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    pad = (-n) % CHUNK
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    coords = boxes.T.astype(jnp.float32)          # (4, N)
    valid_row = valid[None, :].astype(jnp.int32)  # (1, N)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            keep = _nms_pallas_padded(coords, valid_row, float(thresh))
    else:
        keep = _nms_pallas_padded(coords, valid_row, float(thresh))
    return (keep > 0)[:n]


# ---------------------------------------------------------------------------
# Batched variant: many independent NMS problems in ONE kernel launch.
#
# The serial depth of greedy NMS is fixed (one pass over score-ordered
# boxes), but it is the same walk for every image/class — so the per-step
# vector work batches for free across a B dimension (the unbatched kernel
# uses a (1, T) lane row; (BB, T) uses the idle sublanes).  One launch
# replaces B sequential ones: the detect pipeline runs per-class NMS for
# batch*classes problems at once.
# ---------------------------------------------------------------------------

B_BLOCK = 8


def _iou_mask_area(x1a, y1a, x2a, y2a, x1b, y1b, x2b, y2b, aa, ab, thresh):
    """Pairwise IoU > thresh with areas precomputed per box.  The area
    formula and every per-pair operation keep the ORIGINAL rounding order
    (bbox_overlaps semantics), so results stay bit-identical to
    ops.nms.nms_mask — only redundant per-sweep area math is hoisted."""
    iw = jnp.minimum(x2a, x2b) - jnp.maximum(x1a, x1b) + 1.0
    ih = jnp.minimum(y2a, y2b) - jnp.maximum(y1a, y1b) + 1.0
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    return inter > thresh * (aa + ab - inter)


def _nms_kernel_b(coords_ref, valid_ref, area_ref, keep_ref, sup_ref, m_ref,
                  cnt_ref, *, thresh, n, chunk, cap):
    ti = pl.program_id(1)
    bb = B_BLOCK

    @pl.when(ti == 0)
    def _():
        sup_ref[:, :] = 1 - valid_ref[:, :]
        cnt_ref[:, :] = jnp.zeros_like(cnt_ref[:, :])

    # Early-exit cap: callers (nms_fixed_batched) keep only the first
    # ``cap`` kept boxes per problem.  Boxes are score-ordered, so a problem
    # is SETTLED once it has ``cap`` kept (later tiles cannot change its
    # first ``cap`` kept entries) — or once no valid boxes remain from this
    # tile on (nothing left to keep: covers the all-invalid B-padding rows
    # and per-class problems with fewer than ``cap`` above-threshold boxes,
    # which a bare count>=cap test would stall on, disabling the exit for
    # the whole block).  When every problem in the block is settled, skip
    # the tile entirely and emit keep=0 (keep bits beyond the cap are
    # droppable — the caller's rank-sort keeps only the first ``cap``).
    # For the 6k-box proposal problem this skips ~80% of tiles.
    start = pl.multiple_of(ti * TILE, TILE)
    pos = jax.lax.broadcasted_iota(jnp.int32, (bb, n), 1)
    remaining = jnp.sum(jnp.where(pos >= start, valid_ref[:, :], 0), axis=1)
    done = jnp.all((cnt_ref[:, 0] >= cap) | (remaining == 0))

    @pl.when(done)
    def _():
        keep_ref[:, :] = jnp.zeros_like(keep_ref[:, :])

    @pl.when(jnp.logical_not(done))
    def _():
        # tile coordinates (BB, T) — block layout is (BB, 4, N)
        xt1 = coords_ref[:, 0, pl.ds(start, TILE)]
        yt1 = coords_ref[:, 1, pl.ds(start, TILE)]
        xt2 = coords_ref[:, 2, pl.ds(start, TILE)]
        yt2 = coords_ref[:, 3, pl.ds(start, TILE)]

        at = area_ref[:, pl.ds(start, TILE)]

        def col(v):  # (BB, T) → (BB, T, 1)
            return v.reshape(bb, TILE, 1)

        def row(v):  # (BB, T) → (BB, 1, T)
            return v.reshape(bb, 1, TILE)

        masked = _iou_mask_area(col(xt1), col(yt1), col(xt2), col(yt2),
                                row(xt1), row(yt1), row(xt2), row(yt2),
                                col(at), row(at), thresh)
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (bb, TILE), 1)
        # park the (BB, T, T) pair matrix in VMEM: the intra walk then loads
        # one (BB, 1, T) row per step instead of reducing the full matrix
        # (was ~128 vregs of select+any per step; now one strided load).
        # The later-box guard (col > row) is folded in here, once,
        # vectorized — the 128 sequential intra steps then skip it.
        row_i = jax.lax.broadcasted_iota(jnp.int32, (bb, TILE, TILE), 1)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (bb, TILE, TILE), 2)
        m_ref[:, :, :] = (masked & (col_i > row_i)).astype(jnp.int32)

        sup_t = sup_ref[:, pl.ds(start, TILE)]  # (BB, T) i32

        def intra(i, sup_t):
            alive = jnp.max(jnp.where(t_idx == i, sup_t, 0), axis=1,
                            keepdims=True) == 0                      # (BB, 1)
            rowi = m_ref[:, pl.ds(i, 1), :].reshape(bb, TILE) > 0    # (BB, T)
            new = (alive & rowi).astype(jnp.int32)
            return jnp.maximum(sup_t, new)

        sup_t = jax.lax.fori_loop(0, TILE, intra, sup_t)
        kept = 1 - sup_t
        sup_ref[:, pl.ds(start, TILE)] = sup_t
        keep_ref[:, :] = kept
        # count real kept boxes (padding is pre-suppressed via valid)
        cnt_ref[:, :] = cnt_ref[:, :] + jnp.sum(kept, axis=1, keepdims=True)

        kept_col = kept.reshape(bb, TILE, 1) > 0
        g_row = start + t_idx.reshape(bb, TILE, 1)

        def chunk_iou(cs):
            xc1 = coords_ref[:, 0, pl.ds(cs, chunk)].reshape(bb, 1, chunk)
            yc1 = coords_ref[:, 1, pl.ds(cs, chunk)].reshape(bb, 1, chunk)
            xc2 = coords_ref[:, 2, pl.ds(cs, chunk)].reshape(bb, 1, chunk)
            yc2 = coords_ref[:, 3, pl.ds(cs, chunk)].reshape(bb, 1, chunk)
            ac = area_ref[:, pl.ds(cs, chunk)].reshape(bb, 1, chunk)
            return _iou_mask_area(col(xt1), col(yt1), col(xt2), col(yt2),
                                  xc1, yc1, xc2, yc2, col(at), ac, thresh)

        def apply_sup(cs, new_sup):
            cur = sup_ref[:, pl.ds(cs, chunk)]
            sup_ref[:, pl.ds(cs, chunk)] = jnp.maximum(
                cur, new_sup.astype(jnp.int32))

        # the chunk CONTAINING this tile needs the later-box guard …
        fc = start // chunk
        cs0 = pl.multiple_of(fc * chunk, chunk)
        g_col = cs0 + jax.lax.broadcasted_iota(jnp.int32, (bb, 1, chunk), 2)
        apply_sup(cs0, jnp.any(kept_col & chunk_iou(cs0) & (g_col > g_row),
                               axis=1))

        # … chunks strictly after it are all later boxes — no guard
        def chunk_body(jb, _):
            cs = pl.multiple_of(jb * chunk, chunk)
            apply_sup(cs, jnp.any(kept_col & chunk_iou(cs), axis=1))
            return 0

        jax.lax.fori_loop(fc + 1, n // chunk, chunk_body, 0)


@partial(jax.jit, static_argnames=("thresh", "cap"))
def _nms_pallas_batched_padded(coords, valid, thresh: float, cap: int):
    """coords (B, 4, N), valid (B, N) i32; B % B_BLOCK == 0, N % TILE == 0."""
    b, _, n = coords.shape
    chunk = min(CHUNK, n)  # small problems don't pad to the full chunk
    # per-box areas hoisted out of the kernel sweeps — same formula and
    # rounding as bbox_overlaps, so keep masks stay bit-identical
    areas = ((coords[:, 2] - coords[:, 0] + 1.0)
             * (coords[:, 3] - coords[:, 1] + 1.0))
    kernel = partial(_nms_kernel_b, thresh=float(thresh), n=n, chunk=chunk,
                     cap=cap)
    keep = pl.pallas_call(
        kernel,
        grid=(b // B_BLOCK, n // TILE),
        in_specs=[
            pl.BlockSpec((B_BLOCK, 4, n), lambda bb, ti: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLOCK, n), lambda bb, ti: (bb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLOCK, n), lambda bb, ti: (bb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_BLOCK, TILE), lambda bb, ti: (bb, ti),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B_BLOCK, n), jnp.int32),
                        pltpu.VMEM((B_BLOCK, TILE, TILE), jnp.int32),
                        pltpu.VMEM((B_BLOCK, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(coords, valid, areas.astype(jnp.float32))
    return keep


def nms_mask_pallas_batched(boxes, thresh, valid=None, interpret: bool = False,
                            max_keep: int | None = None):
    """Batched greedy NMS: boxes (B, N, 4) score-DESC sorted per row,
    valid (B, N) → keep (B, N) bool.  One kernel launch for all B problems.

    max_keep: optional early-exit cap — the FIRST max_keep kept entries per
    problem are exact greedy; later keep bits may be dropped (zeroed).  Only
    valid for callers that keep at most max_keep boxes (nms_fixed_batched).
    """
    b, n = boxes.shape[:2]
    if valid is None:
        valid = jnp.ones((b, n), dtype=bool)
    # pad N to a tile multiple; the kernel picks chunk = min(CHUNK, N) so
    # small per-class problems (e.g. 300 boxes) don't pay for 1024 columns
    pad_n = (-n) % TILE if n <= CHUNK else (-n) % CHUNK
    pad_b = (-b) % B_BLOCK
    if pad_n or pad_b:
        boxes = jnp.pad(boxes, ((0, pad_b), (0, pad_n), (0, 0)))
        valid = jnp.pad(valid, ((0, pad_b), (0, pad_n)))
    coords = boxes.transpose(0, 2, 1).astype(jnp.float32)  # (B, 4, N)
    valid_i = valid.astype(jnp.int32)
    cap = n if max_keep is None else int(max_keep)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            keep = _nms_pallas_batched_padded(coords, valid_i, float(thresh),
                                              cap)
    else:
        keep = _nms_pallas_batched_padded(coords, valid_i, float(thresh), cap)
    return (keep > 0)[:b, :n]
