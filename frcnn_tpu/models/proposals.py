"""Proposal generation (RPN post-processing).

Rebuilds of the reference's ``lib/layer_utils/proposal_layer.py:~20-80`` (#13)
and ``proposal_top_layer.py:~15-60`` (#14) as fixed-shape jnp: the dynamic
"sort → take pre_nms_top_n → NMS → take post_nms_top_n keep list" becomes
``lax.top_k`` + fixed-shape NMS returning padded indices + a validity mask.

All functions are single-image; callers vmap over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from frcnn_tpu.ops.boxes import bbox_transform_inv, clip_boxes
from frcnn_tpu.ops.nms import nms_fixed, nms_fixed_batched, NEG_INF

# single definition in select_kernel.py; module bindings kept so tests
# monkeypatch per site
from frcnn_tpu.ops.pallas.select_kernel import (THRESHOLD_SELECT_MIN_RATIO,
                                               THRESHOLD_SELECT_MIN_S)


def _anchor_validity(anchors, im_info):
    """Anchors whose centre lies inside the *actual* image (not the padded
    bucket).  The reference never pads, so it has no such mask; with padded
    fixed-shape images, proposals hallucinated over padding must be dropped.
    """
    cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    return (cx >= 0) & (cx < im_info[1]) & (cy >= 0) & (cy < im_info[0])


def proposal_layer(scores, deltas, anchors, im_info, *, pre_nms_top_n: int,
                   post_nms_top_n: int, nms_thresh: float, use_pallas: bool = True):
    """TRAIN/TEST proposal path (reference proposal_layer).

    scores: (K,) RPN foreground probabilities (anchor-order flattened);
    deltas: (K, 4); anchors: (K, 4); im_info: (3,) [h, w, scale].
    Returns (rois (P, 4), roi_scores (P,), valid (P,)) with P = post_nms_top_n.
    """
    k = scores.shape[0]
    proposals = bbox_transform_inv(anchors, deltas)
    proposals = clip_boxes(proposals, im_info[:2])

    scores = jnp.where(_anchor_validity(anchors, im_info), scores, NEG_INF)
    pre_n = min(pre_nms_top_n, k)
    top_scores, top_idx = jax.lax.top_k(scores, pre_n)
    top_boxes = proposals[top_idx]
    top_valid = top_scores > NEG_INF / 2

    keep_idx, keep_valid = nms_fixed(top_boxes, top_scores, nms_thresh,
                                     post_nms_top_n, valid=top_valid,
                                     use_pallas=use_pallas)
    rois = top_boxes[keep_idx]
    roi_scores = jnp.where(keep_valid, top_scores[keep_idx], 0.0)
    # neutralize padding rois: degenerate zero box (gathered features unused)
    rois = jnp.where(keep_valid[:, None], rois, 0.0)
    return rois, roi_scores, keep_valid


def proposal_layer_batch(scores, deltas, anchors, im_info, *, pre_nms_top_n: int,
                         post_nms_top_n: int, nms_thresh: float,
                         use_pallas: bool = True, use_threshold: bool = False):
    """Batched proposal path: scores (B, K), deltas (B, K, 4), anchors (K, 4),
    im_info (B, 3) → (rois (B, P, 4), scores (B, P), valid (B, P)).

    Same semantics as vmapped ``proposal_layer``, but all images' NMS runs in
    ONE Pallas launch (see ops.nms.nms_fixed_batched).

    use_threshold (TPU + cfg.TPU.THRESHOLD_SELECT): the pre-NMS top-k runs
    as the exact threshold Pallas kernel + a small single-key
    ``lax.top_k`` re-rank of the pre_n winners (position tie-break on the
    kernel's index-ascending row = the lowest-index rule; a two-key
    pair-sort measured ~3x the cost and erased the win — PROFILE_r04 §6).
    XLA TopK costs ~a full K-row sort here (C4 at 800×1216: K=34200 →
    ~1.5 ms of the 4.2 ms RPN stage, PROFILE_r02 §2) while the re-rank
    touches only pre_n rows.  Bit-identical output incl. the NEG_INF-tie
    order of masked padding anchors; gated to a ≥3x shrink (the C4 train
    shape 12000-of-21888 would pay more in the re-rank than the kernel
    saves)."""
    b, k = scores.shape
    proposals = bbox_transform_inv(anchors, deltas)        # (B, K, 4)
    proposals = clip_boxes(proposals, im_info[:, :2])

    av = jax.vmap(lambda i: _anchor_validity(anchors, i))(im_info)  # (B, K)
    scores = jnp.where(av, scores, NEG_INF)
    pre_n = min(pre_nms_top_n, k)
    if (use_threshold and k >= THRESHOLD_SELECT_MIN_S
            and k >= THRESHOLD_SELECT_MIN_RATIO * pre_n):
        from frcnn_tpu.ops.pallas.select_kernel import topk_threshold

        tv, ti = topk_threshold(scores, pre_n)             # exact set
        # small single-key top_k re-rank: position tie-break on the index-
        # ascending tv = the lowest-index rule — bit-identical to
        # lax.top_k(scores, pre_n) at ~1/3 the two-key pair-sort cost
        top_scores, pos = jax.lax.top_k(tv, pre_n)
        top_idx = jnp.take_along_axis(ti, pos, axis=1)
    else:
        top_scores, top_idx = jax.lax.top_k(scores, pre_n)  # (B, pre_n)
    top_boxes = jnp.take_along_axis(proposals, top_idx[..., None], axis=1)
    top_valid = top_scores > NEG_INF / 2

    # top_k output is descending with invalid (NEG_INF) entries last — the
    # re-sort inside nms_fixed_batched would be an identity permutation
    keep_idx, keep_valid = nms_fixed_batched(
        top_boxes, top_scores, nms_thresh, post_nms_top_n, valid=top_valid,
        use_pallas=use_pallas, presorted=True)             # (B, P)
    rois = jnp.take_along_axis(top_boxes, keep_idx[..., None], axis=1)
    roi_scores = jnp.where(keep_valid,
                           jnp.take_along_axis(top_scores, keep_idx, axis=1),
                           0.0)
    rois = jnp.where(keep_valid[..., None], rois, 0.0)
    return rois, roi_scores, keep_valid


def proposal_top_layer(scores, deltas, anchors, im_info, *, rpn_top_n: int):
    """NMS-free TEST variant (reference proposal_top_layer, cfg.TEST.MODE
    'top'): top RPN_TOP_N anchors by score, decode, clip.  The reference
    random-pads when fewer anchors than RPN_TOP_N exist; with fixed shapes we
    return a validity mask instead."""
    k = scores.shape[0]
    scores = jnp.where(_anchor_validity(anchors, im_info), scores, NEG_INF)
    n = min(rpn_top_n, k)
    top_scores, top_idx = jax.lax.top_k(scores, n)
    valid = top_scores > NEG_INF / 2
    boxes = bbox_transform_inv(anchors[top_idx], deltas[top_idx])
    boxes = clip_boxes(boxes, im_info[:2])
    boxes = jnp.where(valid[:, None], boxes, 0.0)
    return boxes, jnp.where(valid, top_scores, 0.0), valid
