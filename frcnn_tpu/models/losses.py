"""Detection losses: the reference's 4-loss joint objective.

Rebuild of ``Network._smooth_l1_loss`` / ``_add_losses`` (reference
``lib/nets/network.py:~L300-L360``, SURVEY.md #8): RPN cross-entropy over the
sampled 256 anchors, RPN smooth-L1 (σ=3) with inside/outside weights, RoI
cross-entropy over the sampled 128 rois, RoI smooth-L1 (σ=1).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def smooth_l1_loss(pred, targets, inside_w, outside_w, sigma: float = 1.0):
    """sum over last dims of outside_w * huber(inside_w * (pred - target)).

    Reference semantics: smooth-L1 with transition point 1/sigma^2:
    0.5*(sigma*d)^2 if |d| < 1/sigma^2 else |d| - 0.5/sigma^2.
    Returns a scalar: summed over all elements (outside weights carry the
    1/N normalization, as in the reference).
    """
    sigma2 = sigma * sigma
    diff = inside_w * (pred - targets)
    abs_diff = jnp.abs(diff)
    flag = abs_diff < 1.0 / sigma2
    per_elem = jnp.where(flag, 0.5 * sigma2 * diff * diff, abs_diff - 0.5 / sigma2)
    return jnp.sum(outside_w * per_elem)


def softmax_ce(logits, labels, weight=None):
    """Mean cross-entropy with optional per-example weights (ignored rows get
    weight 0 — the reference indexes selected rows instead)."""
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, jnp.maximum(labels, 0)
    )
    if weight is None:
        return jnp.mean(ce)
    w = weight.astype(ce.dtype)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


def _roi_losses(cls_logits, bbox_pred, pt):
    """RoI-head pair of the 4-loss objective (shared by both RPN layouts)."""
    cross_entropy = softmax_ce(cls_logits, pt.labels)
    # reference dim=[1]: sum over the 4C columns, mean over rois
    sigma2 = 1.0
    diff = pt.bbox_inside_weights * (bbox_pred - pt.bbox_targets)
    abs_diff = jnp.abs(diff)
    per = jnp.where(abs_diff < 1.0 / sigma2, 0.5 * sigma2 * diff * diff,
                    abs_diff - 0.5 / sigma2)
    loss_box = jnp.mean(jnp.sum(pt.bbox_outside_weights * per, axis=-1))
    return cross_entropy, loss_box


def _pack_losses(rpn_cross_entropy, rpn_loss_box, cross_entropy, loss_box):
    total = rpn_cross_entropy + rpn_loss_box + cross_entropy + loss_box
    return {
        "rpn_cross_entropy": rpn_cross_entropy,
        "rpn_loss_box": rpn_loss_box,
        "cross_entropy": cross_entropy,
        "loss_box": loss_box,
        "total_loss": total,
    }


def detection_losses(rpn_cls_logits, rpn_bbox_pred, anchor_targets,
                     cls_logits, bbox_pred, proposal_targets):
    """The 4-loss sum (reference _add_losses), dense-RPN layout.

    rpn_cls_logits: (K, 2); rpn_bbox_pred: (K, 4); cls_logits: (B, C);
    bbox_pred: (B, 4C).  All single-image (callers vmap + mean over batch).
    """
    at, pt = anchor_targets, proposal_targets

    rpn_select = (at.labels >= 0).astype(jnp.float32)
    rpn_cross_entropy = softmax_ce(rpn_cls_logits, at.labels, rpn_select)
    rpn_loss_box = smooth_l1_loss(rpn_bbox_pred, at.bbox_targets,
                                  at.bbox_inside_weights, at.bbox_outside_weights,
                                  sigma=3.0)
    return _pack_losses(rpn_cross_entropy, rpn_loss_box,
                        *_roi_losses(cls_logits, bbox_pred, pt))


def detection_losses_compact(rpn_cls_rows, rpn_box_rows, compact_targets,
                             cls_logits, bbox_pred, proposal_targets):
    """The 4-loss sum with the RPN terms over SAMPLED rows only.

    rpn_cls_rows: (S, 2) / rpn_box_rows: (S, 4) — the head outputs gathered
    at ``compact_targets.sel`` (see targets.anchor_target_compact).  Value-
    identical to ``detection_losses`` on the dense layout: unsampled anchors
    contribute exactly 0 there (CE weight 0; smooth-L1 inside weight 0 for
    bg, outside weight 0 for unsampled), so restricting the sums to the
    sampled slots changes only float summation order.  The dense layout's
    O(K) loss work and O(K) head-row materialization (FPN: (B, 117k, 2)+
    (B, 117k, 4) f32 Mosaic relayouts) drop to O(S)=O(384).
    """
    cat, pt = compact_targets, proposal_targets
    rpn_select = (cat.labels >= 0).astype(jnp.float32)
    rpn_cross_entropy = softmax_ce(rpn_cls_rows, cat.labels, rpn_select)
    rpn_loss_box = smooth_l1_loss(rpn_box_rows, cat.bbox_targets,
                                  cat.bbox_inside_weights,
                                  cat.bbox_outside_weights, sigma=3.0)
    return _pack_losses(rpn_cross_entropy, rpn_loss_box,
                        *_roi_losses(cls_logits, bbox_pred, pt))
