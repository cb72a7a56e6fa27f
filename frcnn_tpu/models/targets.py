"""Training-target layers: RPN anchor targets and RoI proposal targets.

Rebuilds of the reference's host/numpy mid-forward layers
(``lib/layer_utils/anchor_target_layer.py:~20-180`` #15 and
``proposal_target_layer.py:~20-180`` #16) as masked, fixed-shape, in-graph
jnp with ``jax.random`` sampling — the single biggest structural change vs
the reference (its ``.cpu().numpy()`` round-trips dominate step latency,
SURVEY.md §3.1).

Semantics preserved exactly where they matter for mAP (SURVEY.md hard part
#2): inside-image anchor filtering, IoU thresholds and clobber ordering,
argmax-per-gt fg guarantee (with ties), fixed-count fg/bg subsampling
(uniform without replacement via random-priority top-k), bbox-target
normalization, class-specific target expansion, inside/outside weights.
Deviation: when fewer than BATCH_SIZE rois are sampleable the reference
samples *with replacement*; we tile the selected set cyclically — both
duplicate entries uniformly.

All functions are single-image; callers vmap over the batch (each image gets
its own PRNG key).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from frcnn_tpu.ops.boxes import bbox_overlaps, bbox_transform


def _rank_by_random_priority(mask, key):
    """Uniform-without-replacement subsampling: rank of each True entry of
    ``mask`` in a random permutation of the True entries (False → big rank).
    Keeping entries with rank < quota == npr.choice(inds, quota, replace=False).
    """
    n = mask.shape[0]
    pri = jnp.where(mask, jax.random.uniform(key, (n,)), -1.0)
    order = jnp.argsort(-pri)  # True entries first, randomly permuted
    rank = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return jnp.where(mask, rank, n)


# single definition in select_kernel.py; module-level bindings kept so tests
# can monkeypatch this site's gate independently
from frcnn_tpu.ops.pallas.select_kernel import (THRESHOLD_SELECT_MIN_RATIO,
                                                THRESHOLD_SELECT_MIN_S)


def _subsample_idx(mask, max_quota: int, quota, key, use_threshold=False):
    """Indices of min(quota, sum(mask)) True entries of ``mask`` sampled
    uniformly without replacement: ``idx (max_quota,)`` anchor ids and
    ``take (max_quota,)`` marking the live slots (the rest are top_k filler
    whose consumers must weight them 0).  ``max_quota`` must be a static
    upper bound for the (possibly traced) ``quota``.

    use_threshold (TPU, cfg.TPU.THRESHOLD_SELECT via the anchor_target_*
    callers): select via the exact threshold Pallas kernel — XLA TopK costs
    ~a full row sort regardless of k on this backend (scripts/probe_topk.py)
    and the priorities here are a 155k row at FPN scale, twice per image.
    A small single-key ``lax.top_k`` re-rank of the k winners (position
    tie-break on the kernel's index-ascending row = the lowest-index rule)
    restores lax.top_k's exact order, so the sampled SLOTS (not just the
    set) are bit-identical.
    (ops/select.topk_strided was the earlier, XLA-level attempt; the axon
    backend mis-executes its strided graphs — PROFILE_r04 §2.)"""
    n = mask.shape[0]
    ramp = jnp.arange(n, dtype=jnp.float32) * jnp.float32(2.0 ** -17)
    pri = jnp.where(mask, 1.0 + jax.random.uniform(key, (n,)), -1.0 - ramp)
    if (use_threshold and n >= THRESHOLD_SELECT_MIN_S
            and n >= THRESHOLD_SELECT_MIN_RATIO * max_quota):
        from frcnn_tpu.ops.pallas.select_kernel import topk_threshold

        tv, ti = topk_threshold(pri[None], max_quota)
        # small top_k re-rank (position tie-break on the index-ascending
        # row = the lowest-index rule): slots bit-identical to lax.top_k
        vals, pos = jax.lax.top_k(tv[0], max_quota)
        idx = jnp.take(ti[0], pos)
    else:
        vals, idx = jax.lax.top_k(pri, max_quota)
    take = (jnp.arange(max_quota) < quota) & (vals > 0.0)
    return idx, take


def _subsample_mask(mask, max_quota: int, quota, key):
    """Keep min(quota, sum(mask)) True entries of ``mask`` uniformly without
    replacement.  Selection-identical to ``_rank_by_random_priority(mask,
    key) < quota`` (both keep the top-``quota`` entries by the same iid
    uniform priority) but via a static-k ``top_k`` instead of a full argsort
    — at RPN scale (155k anchors for FPN) the two argsorts were most of
    anchor_target_layer's 15.6 ms."""
    idx, take = _subsample_idx(mask, max_quota, quota, key)
    return jnp.zeros(mask.shape[0], bool).at[idx].set(take, mode="drop")


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray          # (K,) int32: 1 fg, 0 bg, -1 ignore
    bbox_targets: jnp.ndarray    # (K, 4)
    bbox_inside_weights: jnp.ndarray   # (K, 4)
    bbox_outside_weights: jnp.ndarray  # (K, 4)


def _anchor_pre_labels(anchors, gt_boxes, gt_valid, im_info, cfg):
    """Steps 1-2 of the anchor target layer: inside-image filtering, IoU
    stats, and threshold/argmax-per-gt labels BEFORE fg/bg subsampling.
    Returns (labels (K,) in {1, 0, -1}, argmax_overlaps (K,)).  Shared by the
    dense ``anchor_target_layer`` (reference layout) and the compact
    ``anchor_target_compact`` (sampled-rows layout for the train loss)."""
    t = cfg.TRAIN
    k = anchors.shape[0]

    # 1. inside-image anchors, border 0 (reference keeps only these; we mask)
    inside = (
        (anchors[:, 0] >= 0)
        & (anchors[:, 1] >= 0)
        & (anchors[:, 2] < im_info[1])
        & (anchors[:, 3] < im_info[0])
    )

    # 2. IoU vs gt; invalid gt and outside anchors masked to -1; per-anchor
    # max/argmax and argmax-per-gt tie membership (every anchor achieving a
    # gt's max overlap is fg, ties included, requiring a real overlap).
    # On TPU at RPN scale the Pallas kernel computes the reductions without
    # materializing the (K, G) matrix (ops/pallas/overlap_kernel.py); the
    # dense form (several (K, G) HBM intermediates) is the reference
    # numerics and the small-shape / CPU path.  (A transposed (G, K) dense
    # layout and a chunked lax.scan both measured NEUTRAL-to-worse at FPN's
    # 155k-anchor scale — don't retry; see NEXT.md.)
    use_kernel = (cfg.TPU.USE_PALLAS and jax.default_backend() == "tpu"
                  and k >= 8192 and gt_boxes.shape[0] <= 64)
    if use_kernel:
        from frcnn_tpu.ops.pallas.overlap_kernel import anchor_overlap_stats

        max_overlaps, argmax_overlaps, is_gt_argmax = anchor_overlap_stats(
            anchors, gt_boxes, gt_valid, inside)
    else:
        overlaps = bbox_overlaps(anchors, gt_boxes)           # (K, G)
        overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
        overlaps = jnp.where(inside[:, None], overlaps, -1.0)

        argmax_overlaps = jnp.argmax(overlaps, axis=1)        # (K,)
        max_overlaps = jnp.max(overlaps, axis=1)              # (K,)
        gt_max_overlaps = jnp.max(overlaps, axis=0)           # (G,)
        is_gt_argmax = jnp.any(
            (overlaps == gt_max_overlaps[None, :])
            & (gt_max_overlaps[None, :] > 0) & gt_valid[None, :],
            axis=1,
        )

    neg = max_overlaps < t.RPN_NEGATIVE_OVERLAP
    pos = is_gt_argmax | (max_overlaps >= t.RPN_POSITIVE_OVERLAP)

    labels = jnp.full((k,), -1, jnp.int32)
    if not t.RPN_CLOBBER_POSITIVES:
        labels = jnp.where(inside & neg, 0, labels)
        labels = jnp.where(inside & pos, 1, labels)
    else:
        labels = jnp.where(inside & pos, 1, labels)
        labels = jnp.where(inside & neg, 0, labels)
    return labels, argmax_overlaps


def anchor_target_layer(anchors, gt_boxes, gt_valid, im_info, key, cfg) -> AnchorTargets:
    """RPN training targets (reference anchor_target_layer).

    anchors: (K, 4); gt_boxes: (G, 4) padded; gt_valid: (G,) bool;
    im_info: (3,) [h, w, scale]; key: PRNG key.
    """
    t = cfg.TRAIN
    k = anchors.shape[0]
    labels, argmax_overlaps = _anchor_pre_labels(
        anchors, gt_boxes, gt_valid, im_info, cfg)

    # 3. subsample: at most RPN_FG_FRACTION*RPN_BATCHSIZE fg, fill with bg
    kf, kb = jax.random.split(key)
    num_fg = int(t.RPN_FG_FRACTION * t.RPN_BATCHSIZE)
    fg_mask = labels == 1
    fg_keep = _subsample_mask(fg_mask, num_fg, num_fg, kf)
    labels = jnp.where(fg_mask & ~fg_keep, -1, labels)

    n_fg = jnp.minimum(jnp.sum(fg_mask), num_fg)
    bg_quota = t.RPN_BATCHSIZE - n_fg
    bg_mask = labels == 0
    bg_keep = _subsample_mask(bg_mask, t.RPN_BATCHSIZE, bg_quota, kb)
    labels = jnp.where(bg_mask & ~bg_keep, -1, labels)

    # 4. regression targets toward each anchor's argmax gt.  The gt-row
    # fetch is a one-hot matmul, not a gather: (K,) indices into a tiny
    # (G, 4) table lower to a 5.2 ms row gather on TPU at FPN's 155k-anchor
    # scale, while (K, G) one-hot @ (G, 4) runs on the MXU in 0.08 ms
    # (scripts/probe_anchor_target.py --parts).  Precision.HIGHEST is
    # MANDATORY for exactness: this is data movement (each row sums one
    # 1.0-weighted gt row and G-1 zeros), and default MXU precision
    # truncates the gt coordinates to bf16 — measured up to 3.8 px error
    # per gathered coordinate on chip (round-4 VERDICT Weak #2).  The
    # reference gathers gt rows exactly
    # (lib/layer_utils/anchor_target_layer.py:~L120-L150 _compute_targets).
    # See docs/ARCHITECTURE.md "Matmul precision policy".
    one_hot = (argmax_overlaps[:, None]
               == jnp.arange(gt_boxes.shape[0])[None, :])
    matched_gt = jnp.matmul(one_hot.astype(gt_boxes.dtype), gt_boxes,
                            precision=jax.lax.Precision.HIGHEST)
    targets = bbox_transform(anchors, matched_gt)
    targets = jnp.where((labels == 1)[:, None], targets, 0.0)

    inside_w = jnp.where((labels == 1)[:, None],
                         jnp.asarray(t.BBOX_INSIDE_WEIGHTS, targets.dtype), 0.0)
    num_examples = jnp.maximum(jnp.sum(labels >= 0), 1).astype(targets.dtype)
    if t.RPN_POSITIVE_WEIGHT < 0:
        # uniform weighting of ones (reference RPN_POSITIVE_WEIGHT == -1)
        w = 1.0 / num_examples
        outside_w = jnp.where((labels >= 0)[:, None], w, 0.0)
    else:
        pw = t.RPN_POSITIVE_WEIGHT / jnp.maximum(jnp.sum(labels == 1), 1)
        nw = (1.0 - t.RPN_POSITIVE_WEIGHT) / jnp.maximum(jnp.sum(labels == 0), 1)
        outside_w = jnp.where((labels == 1)[:, None], pw, 0.0)
        outside_w = jnp.where((labels == 0)[:, None], nw, outside_w)

    return AnchorTargets(labels, targets, inside_w, outside_w.astype(targets.dtype))


class CompactAnchorTargets(NamedTuple):
    """anchor_target_layer output restricted to the sampled rows.

    S = num_fg_quota + RPN_BATCHSIZE slots (static): the fg top-k slots
    first, then the bg top-k slots.  Dead slots carry label -1 and zero
    weights, so every loss consumer weights them out — exactly like the
    dense layout's unsampled anchors."""

    sel: jnp.ndarray             # (S,) int32 anchor ids (filler on dead slots)
    labels: jnp.ndarray          # (S,) int32: 1 fg, 0 bg, -1 dead slot
    bbox_targets: jnp.ndarray    # (S, 4)
    bbox_inside_weights: jnp.ndarray   # (S, 4)
    bbox_outside_weights: jnp.ndarray  # (S, 4)


def anchor_target_compact(anchors, gt_boxes, gt_valid, im_info, key,
                          cfg) -> CompactAnchorTargets:
    """``anchor_target_layer`` in sampled-rows form: instead of dense (K,)
    labels and (K, 4) targets/weights over all anchors (FPN: K ≈ 117k at
    608×1024 — the dense layout makes the RPN losses and their backward
    O(K) for ≤256 live rows), emit only the S = fg_quota + RPN_BATCHSIZE
    sampled slots plus the anchor ids to fetch head rows for.

    Selection-identical to the dense layer for the same ``key``: both draw
    the same iid priorities and keep the same top-k (tests/test_targets.py
    asserts the equivalence), so the loss values match the reference
    semantics bit-for-bit up to summation order.
    """
    t = cfg.TRAIN
    labels0, argmax_overlaps = _anchor_pre_labels(
        anchors, gt_boxes, gt_valid, im_info, cfg)

    kf, kb = jax.random.split(key)
    num_fg = int(t.RPN_FG_FRACTION * t.RPN_BATCHSIZE)
    fg_mask = labels0 == 1
    bg_mask = labels0 == 0
    use_th = (cfg.TPU.USE_PALLAS and cfg.TPU.THRESHOLD_SELECT
              and jax.default_backend() == "tpu")
    fg_idx, fg_take = _subsample_idx(fg_mask, num_fg, num_fg, kf,
                                     use_threshold=use_th)
    n_fg = jnp.minimum(jnp.sum(fg_mask), num_fg)
    bg_idx, bg_take = _subsample_idx(bg_mask, t.RPN_BATCHSIZE,
                                     t.RPN_BATCHSIZE - n_fg, kb,
                                     use_threshold=use_th)

    sel = jnp.concatenate([fg_idx, bg_idx])                 # (S,)
    valid = jnp.concatenate([fg_take, bg_take])             # (S,)
    s = sel.shape[0]
    is_fg_slot = jnp.arange(s) < num_fg
    labels = jnp.where(valid, jnp.where(is_fg_slot, 1, 0), -1)

    # regression targets toward each selected anchor's argmax gt (tiny
    # (S, G) one-hot matmul — the dense layer needs (K, G)).  HIGHEST for
    # the same reason as the dense layer above: exact gt-row movement, not
    # model math (default MXU precision rounds coords to bf16 on chip).
    one_hot = (argmax_overlaps[sel][:, None]
               == jnp.arange(gt_boxes.shape[0])[None, :])
    matched_gt = jnp.matmul(one_hot.astype(gt_boxes.dtype), gt_boxes,
                            precision=jax.lax.Precision.HIGHEST)
    targets = bbox_transform(anchors[sel], matched_gt)
    fg_rows = (labels == 1)[:, None]
    targets = jnp.where(fg_rows, targets, 0.0)

    inside_w = jnp.where(fg_rows,
                         jnp.asarray(t.BBOX_INSIDE_WEIGHTS, targets.dtype), 0.0)
    num_examples = jnp.maximum(jnp.sum(valid), 1).astype(targets.dtype)
    if t.RPN_POSITIVE_WEIGHT < 0:
        outside_w = jnp.where((labels >= 0)[:, None], 1.0 / num_examples, 0.0)
    else:
        pw = t.RPN_POSITIVE_WEIGHT / jnp.maximum(jnp.sum(labels == 1), 1)
        nw = (1.0 - t.RPN_POSITIVE_WEIGHT) / jnp.maximum(jnp.sum(labels == 0), 1)
        outside_w = jnp.where((labels == 1)[:, None], pw, 0.0)
        outside_w = jnp.where((labels == 0)[:, None], nw, outside_w)

    return CompactAnchorTargets(sel, labels, targets, inside_w,
                                outside_w.astype(targets.dtype))


class ProposalTargets(NamedTuple):
    rois: jnp.ndarray            # (B, 4) sampled rois (fg first)
    labels: jnp.ndarray          # (B,) int32 class labels (0 = bg)
    bbox_targets: jnp.ndarray    # (B, 4*num_classes)
    bbox_inside_weights: jnp.ndarray   # (B, 4*num_classes)
    bbox_outside_weights: jnp.ndarray  # (B, 4*num_classes)


def proposal_target_layer(rois, roi_valid, gt_boxes, gt_labels, gt_valid, key,
                          cfg, num_classes: int) -> ProposalTargets:
    """RoI-head training targets (reference proposal_target_layer).

    rois: (R, 4) from the proposal layer; roi_valid: (R,); gt_boxes: (G, 4);
    gt_labels: (G,) int class ids (1..C-1); gt_valid: (G,).
    Returns fixed (cfg.TRAIN.BATCH_SIZE, ...) tensors.
    """
    t = cfg.TRAIN
    batch = t.BATCH_SIZE

    # append gt boxes to the proposal set (reference all_rois = cat(rois, gt))
    all_rois = jnp.concatenate([rois, gt_boxes], axis=0)
    all_valid = jnp.concatenate([roi_valid, gt_valid], axis=0)
    n = all_rois.shape[0]

    overlaps = bbox_overlaps(all_rois, gt_boxes)
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
    overlaps = jnp.where(all_valid[:, None], overlaps, -1.0)
    max_ov = jnp.max(overlaps, axis=1)
    argmax = jnp.argmax(overlaps, axis=1)
    roi_label = gt_labels[argmax].astype(jnp.int32)

    fg = all_valid & (max_ov >= t.FG_THRESH)
    bg = all_valid & (max_ov < t.BG_THRESH_HI) & (max_ov >= t.BG_THRESH_LO)
    # DOCUMENTED DEVIATION (COVERAGE.md): degenerate-image fallback.  The
    # reference asserts and crashes here (proposal_target_layer.py:~L60);
    # a fixed-shape jitted graph cannot branch to an error, so if neither
    # fg nor bg exists every valid roi becomes bg.  filter_roidb keeps
    # well-formed data from ever hitting this; if it fires anyway the image
    # contributes an all-bg roi-head loss (symptom of broken data or a
    # dead RPN — check rpn_cross_entropy, not just total loss).
    none_found = ~jnp.any(fg | bg)
    bg = bg | (none_found & all_valid)

    kf, kb = jax.random.split(key)
    fg_quota = int(round(t.FG_FRACTION * batch))
    fg_rank = _rank_by_random_priority(fg, kf)
    fg_sel = fg & (fg_rank < fg_quota)
    n_fg = jnp.sum(fg_sel)
    bg_rank = _rank_by_random_priority(bg, kb)
    bg_sel = bg & (bg_rank < batch - n_fg)

    # order: fg first then bg (reference keeps that order), each randomly
    # permuted; unselected entries last.  Slots beyond the selected count are
    # filled cyclically (≈ sampling with replacement).
    sort_key = jnp.where(fg_sel, fg_rank, n + bg_rank)
    sort_key = jnp.where(fg_sel | bg_sel, sort_key, 2 * n + jnp.arange(n))
    order = jnp.argsort(sort_key)
    n_sel = jnp.maximum(n_fg + jnp.sum(bg_sel), 1)
    slots = jnp.arange(batch) % n_sel
    sel = order[slots]  # (batch,)

    out_rois = all_rois[sel]
    is_fg = fg_sel[sel]
    labels = jnp.where(is_fg, roi_label[sel], 0)

    # normalized regression targets toward each sampled roi's argmax gt
    targets = bbox_transform(out_rois, gt_boxes[argmax[sel]])
    if t.BBOX_NORMALIZE_TARGETS_PRECOMPUTED:
        means = jnp.asarray(t.BBOX_NORMALIZE_MEANS, targets.dtype)
        stds = jnp.asarray(t.BBOX_NORMALIZE_STDS, targets.dtype)
        targets = (targets - means) / stds
    targets = jnp.where(is_fg[:, None], targets, 0.0)

    # expand to class-specific (B, 4*num_classes) with one-hot placement
    onehot = jax.nn.one_hot(labels, num_classes, dtype=targets.dtype)  # (B, C)
    expanded = (onehot[:, :, None] * targets[:, None, :]).reshape(batch, 4 * num_classes)
    inside = jnp.asarray(t.BBOX_INSIDE_WEIGHTS, targets.dtype)
    in_w = (onehot[:, :, None] * (is_fg[:, None, None] * inside[None, None, :])).reshape(
        batch, 4 * num_classes
    )
    out_w = (in_w > 0).astype(targets.dtype)

    return ProposalTargets(out_rois, labels, expanded, in_w, out_w)
