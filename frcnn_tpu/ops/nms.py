"""Non-maximum suppression — fixed-shape, pure-jnp reference implementations.

Replaces the reference's native NMS stack (CUDA kernel
``lib/nms/src/cuda/nms_kernel.cu:~1-150``, Cython/python CPU fallback,
dispatch wrapper ``lib/model/nms_wrapper.py`` — SURVEY.md #19/#20) with:

  * ``nms_mask``        — exact greedy NMS as a blocked fixed-shape jnp
                          computation (tile-sequential, vector-parallel), the
                          numerical truth for the Pallas kernel;
  * ``nms_mask_simple`` — row-at-a-time oracle (slow, obviously correct);
  * ``nms_fixed``       — sort + NMS + pad to a static K: the proposal-layer
                          building block (dynamic "keep list" of the reference
                          becomes indices + validity mask);
  * ``batched_class_nms`` — vmapped per-class test-time NMS.

The greedy semantics match the lineage exactly: boxes in descending score
order; box j is suppressed iff some earlier *kept* box i has IoU(i, j) >
thresh.  Inclusive-corner IoU (bbox_overlaps).

A Pallas TPU kernel with identical semantics lives in
``frcnn_tpu/ops/pallas/nms_kernel.py``; ``nms_mask_dispatch`` picks it on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from frcnn_tpu.ops.boxes import bbox_overlaps

NEG_INF = -1e10


def nms_mask_simple(boxes, thresh, valid=None):
    """O(N) sequential greedy NMS oracle.  boxes (N,4) sorted by score desc.

    Returns keep: (N,) bool.  ``valid`` marks real (non-padding) boxes;
    invalid boxes are never kept and never suppress.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    idx = jnp.arange(n)

    def body(i, suppressed):
        alive = jnp.logical_not(suppressed[i]) & valid[i]
        box_i = jax.lax.dynamic_slice(boxes, (i, 0), (1, 4))
        row = bbox_overlaps(box_i, boxes)[0] > thresh
        return suppressed | (alive & row & (idx > i))

    suppressed = jax.lax.fori_loop(0, n, body, jnp.logical_not(valid))
    return jnp.logical_not(suppressed) & valid


@partial(jax.jit, static_argnames=("tile",))
def nms_mask(boxes, thresh, valid=None, tile: int = 128):
    """Exact greedy NMS, blocked: sequential only within score-ordered tiles.

    boxes: (N, 4) sorted by descending score, N a multiple of ``tile``
    (pad with invalid entries otherwise).  Returns keep: (N,) bool.

    Algorithm (same one the reference's CUDA kernel tiles at 64 boxes,
    nms_kernel.cu): for each tile in order, (1) resolve intra-tile greedy
    sequentially (``tile`` tiny steps on a (tile,) vector), (2) the tile's
    kept boxes suppress all later boxes with one (tile, N) vectorized IoU —
    so the serial depth is O(N) tiny ops but all pairwise work is batched.
    """
    n_orig = n = boxes.shape[0]
    if n % tile != 0:
        pad = tile - n % tile
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        if valid is None:
            valid = jnp.arange(n + pad) < n
        else:
            valid = jnp.pad(valid, (0, pad))
        n = n + pad
    elif valid is None:
        valid = jnp.ones((n,), dtype=bool)

    num_tiles = n // tile
    idx = jnp.arange(n)
    t_idx = jnp.arange(tile)

    def tile_body(ti, suppressed):
        start = ti * tile
        tb = jax.lax.dynamic_slice(boxes, (start, 0), (tile, 4))
        sup_t = jax.lax.dynamic_slice(suppressed, (start,), (tile,))
        iou_tt = bbox_overlaps(tb, tb) > thresh

        def intra(i, sup_t):
            alive = jnp.logical_not(sup_t[i])
            return sup_t | (alive & iou_tt[i] & (t_idx > i))

        sup_t = jax.lax.fori_loop(0, tile, intra, sup_t)
        kept_t = jnp.logical_not(sup_t)  # (tile,)

        # kept tile boxes suppress every later box (global index > row's).
        iou_tn = bbox_overlaps(tb, boxes) > thresh  # (tile, N)
        later = idx[None, :] > (start + t_idx)[:, None]
        new_sup = jnp.any(kept_t[:, None] & iou_tn & later, axis=0)
        suppressed = suppressed | new_sup
        return jax.lax.dynamic_update_slice(suppressed, sup_t, (start,))

    suppressed = jax.lax.fori_loop(0, num_tiles, tile_body, jnp.logical_not(valid))
    return (jnp.logical_not(suppressed) & valid)[:n_orig]


def nms_mask_dispatch(boxes, thresh, valid=None, use_pallas: bool = True):
    """Pick the Pallas kernel on TPU, the blocked jnp version elsewhere."""
    if use_pallas and boxes.shape[0] >= 128:
        try:
            backend = jax.default_backend()
        except Exception:  # pragma: no cover
            backend = "cpu"
        if backend == "tpu":
            from frcnn_tpu.ops.pallas.nms_kernel import nms_mask_pallas

            return nms_mask_pallas(boxes, thresh, valid)
    return nms_mask(boxes, thresh, valid)


def nms_fixed(boxes, scores, thresh, max_out: int, valid=None, use_pallas: bool = True):
    """Sort by score, greedy-NMS, return top ``max_out`` kept indices, padded.

    Returns (indices (max_out,) int32, keep_valid (max_out,) bool).  Padding
    indices point at the highest-scoring box (safe to gather; mask with
    keep_valid).  This is the fixed-shape contract the proposal layer uses in
    place of the reference's dynamic keep list (proposal_layer.py:~20-80).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    s = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-s)
    sboxes = boxes[order]
    svalid = valid[order]
    keep = nms_mask_dispatch(sboxes, thresh, svalid, use_pallas=use_pallas)
    # Compact kept entries to the front, preserving score order: kept entries
    # keep their rank, dropped ones are pushed to the end.
    rank = jnp.where(keep, jnp.arange(n), n)
    take = jnp.argsort(rank)[:max_out]
    out_valid = keep[take]
    out_idx = jnp.where(out_valid, order[take], order[0]).astype(jnp.int32)
    return out_idx, out_valid


def nms_fixed_batched(boxes, scores, thresh, max_out: int, valid=None,
                      use_pallas: bool = True, presorted: bool = False):
    """Batched ``nms_fixed``: boxes (B, N, 4), scores (B, N), valid (B, N)
    → (indices (B, max_out) int32, keep_valid (B, max_out)).

    On TPU all B problems run in ONE Pallas launch (the batched kernel uses
    the sublanes the single-problem walk leaves idle); elsewhere the blocked
    jnp reference is vmapped.

    ``presorted=True`` asserts the caller's boxes/scores are already in
    descending score order with every invalid entry after every valid one
    (e.g. straight out of ``lax.top_k``): the score argsort and its (N, 4)
    box gather — measured ~0.5 ms at the proposal shape — are skipped.
    """
    b, n = scores.shape
    if valid is None:
        valid = jnp.ones((b, n), dtype=bool)
    if presorted:
        sboxes, svalid = boxes, valid
        order = None
    else:
        s = jnp.where(valid, scores, NEG_INF)
        order = jnp.argsort(-s, axis=1)                   # (B, N)
        sboxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
        svalid = jnp.take_along_axis(valid, order, axis=1)

    if use_pallas and n >= 128 and jax.default_backend() == "tpu":
        from frcnn_tpu.ops.pallas.nms_kernel import nms_mask_pallas_batched

        # the rank-sort below keeps only the first max_out kept entries, so
        # the kernel may stop early once every problem has max_out kept
        keep = nms_mask_pallas_batched(sboxes, thresh, svalid,
                                       max_keep=max_out)
    else:
        keep = jax.vmap(lambda bx, v: nms_mask(bx, thresh, v))(sboxes, svalid)

    rank = jnp.where(keep, jnp.arange(n)[None, :], n)
    take = jnp.argsort(rank, axis=1)[:, :max_out]
    out_valid = jnp.take_along_axis(keep, take, axis=1)
    if presorted:
        gathered = take
        fallback = jnp.zeros((b, 1), take.dtype)
    else:
        gathered = jnp.take_along_axis(order, take, axis=1)
        fallback = order[:, :1]
    out_idx = jnp.where(out_valid, gathered, fallback).astype(jnp.int32)
    return out_idx, out_valid


def batched_class_nms(boxes, scores, thresh, max_out: int, valid=None,
                      use_pallas: bool = True):
    """Per-class NMS for test time (reference test.py apply per class j).

    boxes: (C, N, 4) class-specific boxes; scores: (C, N); valid: (C, N).
    Returns (indices (C, max_out), keep (C, max_out)).
    """
    return nms_fixed_batched(boxes, scores, thresh, max_out, valid=valid,
                             use_pallas=use_pallas)
