"""Reference-semantics detection pipeline in torch + numpy.

An independent transcription of the reference's full TEST path
(``lib/model/test.py:~L100-L250``: ``_get_blobs`` → ``test_image`` →
delta un-normalize → ``bbox_transform_inv`` → clip → rescale →
per-class threshold/NMS/cap) used as the oracle for the end-to-end
pipeline-parity test (tests/test_pipeline_parity.py).  Every stage here is
host numpy/torch with the reference's dynamic shapes — none of the
fixed-shape/TPU machinery — so a detection match is evidence the
conventions (channel orders, delta ordering, un-normalization, NMS
semantics, coordinate rescale) agree end to end.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from tests.oracles import (bbox_overlaps_np, bbox_transform_inv_np,
                           bbox_transform_np, nms_np, roi_align_np)


def _clip_np(boxes, hw):
    out = boxes.copy().reshape(boxes.shape[0], -1, 4)
    out[..., 0] = np.clip(out[..., 0], 0, hw[1] - 1)
    out[..., 1] = np.clip(out[..., 1], 0, hw[0] - 1)
    out[..., 2] = np.clip(out[..., 2], 0, hw[1] - 1)
    out[..., 3] = np.clip(out[..., 3], 0, hw[0] - 1)
    return out.reshape(boxes.shape)


def ref_get_blob(im_bgr, cfg):
    """Reference _get_blobs/prep_im_for_blob: mean-subtract THEN resize
    shorter side to TEST.SCALES[0] capped at MAX_SIZE.  No padding."""
    import cv2

    im = im_bgr.astype(np.float32) - np.asarray(cfg.PIXEL_MEANS, np.float32)
    h0, w0 = im.shape[:2]
    scale = float(cfg.TEST.SCALES[0]) / min(h0, w0)
    if np.round(scale * max(h0, w0)) > cfg.TEST.MAX_SIZE:
        scale = float(cfg.TEST.MAX_SIZE) / max(h0, w0)
    im = cv2.resize(im, None, None, fx=scale, fy=scale,
                    interpolation=cv2.INTER_LINEAR)
    return im, scale


def ref_im_detect(sd, trunk_fn, tail_fn, im_bgr, cfg, num_classes,
                  num_anchors=9):
    """Reference im_detect: returns (scores (R, C), boxes (R, 4C) in
    ORIGINAL image coordinates).  sd: torch state_dict holding the backbone
    (whatever trunk_fn/tail_fn read) plus rpn_net / rpn_cls_score /
    rpn_bbox_pred / cls_score / bbox_pred in the reference's layouts."""
    from frcnn_tpu.ops.anchors import generate_anchors_pre

    a = num_anchors
    im, scale = ref_get_blob(im_bgr, cfg)
    h, w = im.shape[:2]
    blob = torch.from_numpy(im.transpose(2, 0, 1)[None])

    with torch.no_grad():
        feat = trunk_fn(blob, sd)                        # (1, 1024, fh, fw)
        r = F.relu(F.conv2d(feat, sd["rpn_net.weight"],
                            sd["rpn_net.bias"], padding=1))
        cls = F.conv2d(r, sd["rpn_cls_score.weight"], sd["rpn_cls_score.bias"])
        box = F.conv2d(r, sd["rpn_bbox_pred.weight"], sd["rpn_bbox_pred.bias"])
    fh, fw = cls.shape[2:]
    # the reference's softmax trick: view (1, 2A, fh, fw) as (1, 2, A*fh, fw)
    # so channel a (bg) pairs with channel A+a (fg)
    prob = torch.softmax(cls.view(1, 2, a * fh, fw), dim=1).view_as(cls)
    # scores/deltas flattened (0,2,3,1)-major: row = (y*fw + x)*A + a
    fg = prob[0, a:].permute(1, 2, 0).reshape(-1).numpy()
    deltas = box[0].permute(1, 2, 0).reshape(-1, 4).numpy().astype(np.float64)

    anchors = np.asarray(generate_anchors_pre(
        fh, fw, cfg.FEAT_STRIDE[0], ratios=cfg.ANCHOR_RATIOS,
        scales=cfg.ANCHOR_SCALES)[0], np.float64)

    # proposal_layer (TEST): decode all, clip, top-k presort, NMS 0.7, cap
    props = _clip_np(bbox_transform_inv_np(anchors, deltas), (h, w))
    order = np.argsort(-fg)[: cfg.TEST.RPN_PRE_NMS_TOP_N]
    dets = np.concatenate([props[order], fg[order, None]], axis=1)
    keep = nms_np(dets.astype(np.float32), cfg.TEST.RPN_NMS_THRESH)
    keep = keep[: cfg.TEST.RPN_POST_NMS_TOP_N]
    rois = props[order][keep]                            # (R, 4) blob coords

    # RoI head: RoIAlign oracle (HWC) → torch tail → linear heads
    feat_hwc = feat[0].permute(1, 2, 0).numpy()
    pooled = roi_align_np(feat_hwc, rois, output_size=cfg.POOLING_SIZE,
                          spatial_scale=1.0 / cfg.FEAT_STRIDE[0],
                          sampling_ratio=cfg.TPU.ROI_SAMPLING_RATIO)
    pooled_t = torch.from_numpy(
        pooled.transpose(0, 3, 1, 2).astype(np.float32))
    with torch.no_grad():
        fc = tail_fn(pooled_t, sd)                       # (R, tail_dim)
        cls_logits = F.linear(fc, sd["cls_score.weight"], sd["cls_score.bias"])
        scores = torch.softmax(cls_logits, dim=1).numpy()
        box_deltas = F.linear(fc, sd["bbox_pred.weight"],
                              sd["bbox_pred.bias"]).numpy().astype(np.float64)

    # un-normalize deltas, decode per class, clip in blob coords, rescale
    stds = np.tile(np.asarray(cfg.TRAIN.BBOX_NORMALIZE_STDS), num_classes)
    means = np.tile(np.asarray(cfg.TRAIN.BBOX_NORMALIZE_MEANS), num_classes)
    pred = bbox_transform_inv_np(rois, box_deltas * stds + means)
    pred = _clip_np(pred, (h, w)) / scale                # original coords
    return scores, pred


def _huber(diff, sigma):
    """Reference _smooth_l1_loss elementwise (network.py:~L300-L320)."""
    s2 = sigma * sigma
    a = np.abs(diff)
    return np.where(a < 1.0 / s2, 0.5 * s2 * diff * diff, a - 0.5 / s2)


def ref_anchor_targets_full(anchors, gt, im_hw, cfg):
    """Reference anchor_target_layer (lib/layer_utils/anchor_target_layer.py:
    ~L20-L180) WITHOUT the random fg/bg subsampling step — callers configure
    quotas large enough that the reference would keep everything, making the
    layer deterministic.  Reference-style: filter to inside anchors, label,
    build targets/weights, _unmap back to the full set.

    Returns (labels (K,), targets (K,4), inside_w (K,4), outside_w (K,4))."""
    t = cfg.TRAIN
    k = len(anchors)
    inds_inside = np.where(
        (anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
        & (anchors[:, 2] < im_hw[1]) & (anchors[:, 3] < im_hw[0]))[0]
    a_in = anchors[inds_inside]
    ov = bbox_overlaps_np(a_in.astype(np.float32), gt.astype(np.float32))
    argmax = ov.argmax(axis=1)
    max_ov = ov[np.arange(len(a_in)), argmax]
    gt_argmax = ov.argmax(axis=0)
    gt_max = ov[gt_argmax, np.arange(gt.shape[0])]
    # ties: every anchor achieving a gt's max overlap (the reference's
    # np.where(overlaps == gt_max_overlaps)[0]); requires a real overlap —
    # gt boxes in tests must overlap >=1 anchor (the reference's gt_max==0
    # quirk would mark zero-overlap anchors fg; our build requires > 0)
    assert (gt_max > 0).all(), "test gt must overlap the anchor set"
    is_gt_argmax = (ov == gt_max[None, :]).any(axis=1)

    labels = np.full(len(a_in), -1, np.int64)
    if not t.RPN_CLOBBER_POSITIVES:
        labels[max_ov < t.RPN_NEGATIVE_OVERLAP] = 0
        labels[is_gt_argmax] = 1
        labels[max_ov >= t.RPN_POSITIVE_OVERLAP] = 1
    else:
        labels[is_gt_argmax] = 1
        labels[max_ov >= t.RPN_POSITIVE_OVERLAP] = 1
        labels[max_ov < t.RPN_NEGATIVE_OVERLAP] = 0
    n_fg = int((labels == 1).sum())
    n_bg = int((labels == 0).sum())
    assert n_fg <= t.RPN_FG_FRACTION * t.RPN_BATCHSIZE, (
        "subsampling would trigger — raise RPN_BATCHSIZE in the test cfg")
    assert n_bg <= t.RPN_BATCHSIZE - n_fg, "bg subsampling would trigger"

    targets = bbox_transform_np(a_in.astype(np.float32),
                                gt[argmax, :4].astype(np.float32))
    in_w = np.zeros((len(a_in), 4), np.float32)
    in_w[labels == 1] = np.asarray(t.BBOX_INSIDE_WEIGHTS, np.float32)
    out_w = np.zeros((len(a_in), 4), np.float32)
    assert t.RPN_POSITIVE_WEIGHT < 0
    out_w[labels >= 0] = 1.0 / max(n_fg + n_bg, 1)

    def unmap(data, fill):
        shape = (k,) + data.shape[1:]
        full = np.full(shape, fill, data.dtype)
        full[inds_inside] = data
        return full

    return (unmap(labels, -1), unmap(targets, 0.0), unmap(in_w, 0.0),
            unmap(out_w, 0.0))


def ref_rpn_losses(rpn_logits, rpn_deltas, anchors, gt, im_hw, cfg):
    """RPN CE + smooth-L1(σ=3) from dense per-anchor rows (K, 2)/(K, 4)
    aligned with `anchors` (K, 4), via the deterministic anchor-target
    oracle (quotas must cover every label — see ref_anchor_targets_full).
    Backbone-independent: the same composition protects the C4 stack
    (test_train_parity) and the FPN per-level concat
    (test_fpn_train_parity)."""
    labels, tgt, in_w, out_w = ref_anchor_targets_full(
        anchors, gt, im_hw, cfg)
    sel = labels >= 0
    z = rpn_logits[sel] - rpn_logits[sel].max(axis=1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))
    rpn_ce = -logp[np.arange(sel.sum()), labels[sel]].mean()
    rpn_box = (out_w * _huber(in_w * (rpn_deltas - tgt), 3.0)).sum()
    return float(rpn_ce), float(rpn_box)


def ref_roi_targets(sampled_rois, gt, gt_labels, cfg, num_classes):
    """proposal_target_layer math per sampled roi (proposal_target_layer.py:
    ~L100-L180 minus the sampling): label from max-IoU gt, normalized
    class-expanded regression targets + inside/outside weights."""
    t = cfg.TRAIN
    ov = bbox_overlaps_np(sampled_rois.astype(np.float32),
                          gt.astype(np.float32))
    argmax = ov.argmax(axis=1)
    max_ov = ov[np.arange(len(sampled_rois)), argmax]
    is_fg = max_ov >= t.FG_THRESH
    roi_labels = np.where(is_fg, gt_labels[argmax], 0).astype(np.int64)
    rt = bbox_transform_np(sampled_rois.astype(np.float32),
                           gt[argmax].astype(np.float32))
    if t.BBOX_NORMALIZE_TARGETS_PRECOMPUTED:
        rt = (rt - np.asarray(t.BBOX_NORMALIZE_MEANS, np.float32)) / np.asarray(
            t.BBOX_NORMALIZE_STDS, np.float32)
    n = len(sampled_rois)
    tgt_c = np.zeros((n, 4 * num_classes), np.float32)
    in_c = np.zeros((n, 4 * num_classes), np.float32)
    for i in np.where(is_fg)[0]:
        s = 4 * roi_labels[i]
        tgt_c[i, s:s + 4] = rt[i]
        in_c[i, s:s + 4] = np.asarray(t.BBOX_INSIDE_WEIGHTS, np.float32)
    out_c = (in_c > 0).astype(np.float32)
    return roi_labels, tgt_c, in_c, out_c


def ref_roi_losses(sampled_rois, gt, gt_labels, cls_logits, bbox_pred, cfg,
                   num_classes):
    """RoI CE + smooth-L1(σ=1) for head outputs (n, C)/(n, 4C) computed at
    the SAME sampled rois, with independently recomputed per-roi
    labels/targets.  Returns (ce, box_loss, roi_labels)."""
    roi_labels, tgt_c, in_c, out_c = ref_roi_targets(
        sampled_rois, gt, gt_labels, cfg, num_classes)
    n = len(sampled_rois)
    z = cls_logits - cls_logits.max(axis=1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))
    ce = -logp[np.arange(n), roi_labels].mean()
    # reference dim=[1]: sum over the 4C columns, mean over rois
    box_loss = (out_c * _huber(in_c * (bbox_pred - tgt_c), 1.0)
                ).sum(axis=1).mean()
    return float(ce), float(box_loss), roi_labels


def ref_train_losses(sd, trunk_fn, tail_fn, im_bgr, gt, gt_labels, cfg,
                     num_classes, sampled_rois, num_anchors=9):
    """Reference-semantics TRAIN composition → the 4 loss values.

    Transcribes forward(mode='TRAIN') + _add_losses (lib/nets/network.py:
    ~L150-L220, ~L300-L360): backbone → RPN head → anchor_target_layer
    (deterministic, see ref_anchor_targets_full) → RoI head on
    ``sampled_rois`` → proposal-target math (labels/normalized targets per
    roi — deterministic given the roi) → RPN CE + RPN smooth-L1 σ=3 +
    RoI CE + RoI smooth-L1 σ=1.  The RNG-driven roi *selection* is injected
    (both stacks score the same sampled rois); everything downstream of the
    selection is computed independently here.

    im_bgr must already be blob-sized (scale 1, no resize); gt (G, 4) and
    sampled_rois (N, 4) in the same coordinates; gt_labels (G,) 1..C-1."""
    from frcnn_tpu.ops.anchors import generate_anchors_pre

    a = num_anchors
    im = im_bgr.astype(np.float32) - np.asarray(cfg.PIXEL_MEANS, np.float32)
    h, w = im.shape[:2]
    blob = torch.from_numpy(im.transpose(2, 0, 1)[None])
    with torch.no_grad():
        feat = trunk_fn(blob, sd)
        r = F.relu(F.conv2d(feat, sd["rpn_net.weight"],
                            sd["rpn_net.bias"], padding=1))
        cls = F.conv2d(r, sd["rpn_cls_score.weight"], sd["rpn_cls_score.bias"])
        box = F.conv2d(r, sd["rpn_bbox_pred.weight"], sd["rpn_bbox_pred.bias"])
    fh, fw = cls.shape[2:]
    # rows (y*fw + x)*A + a_idx; reference channel layout [bg_0..bg_A-1,
    # fg_0..fg_A-1] (the view(1, 2, A*fh, fw) softmax trick)
    cls_hwc = cls[0].permute(1, 2, 0).numpy()                # (fh, fw, 2A)
    rpn_logits = np.stack([cls_hwc[:, :, :a].reshape(-1),
                           cls_hwc[:, :, a:].reshape(-1)], axis=1)  # (K, 2)
    rpn_deltas = box[0].permute(1, 2, 0).reshape(-1, 4).numpy()

    anchors = np.asarray(generate_anchors_pre(
        fh, fw, cfg.FEAT_STRIDE[0], ratios=cfg.ANCHOR_RATIOS,
        scales=cfg.ANCHOR_SCALES)[0], np.float32)

    # proposal_layer at the TRAIN Ns (proposal_layer.py:~L20-L80): decode
    # all anchors, clip, presort, NMS 0.7, cap POST_NMS_TOP_N
    fg = np.exp(rpn_logits[:, 1]) / np.exp(rpn_logits).sum(axis=1)
    props = _clip_np(bbox_transform_inv_np(
        anchors.astype(np.float64), rpn_deltas.astype(np.float64)), (h, w))
    order = np.argsort(-fg)[: cfg.TRAIN.RPN_PRE_NMS_TOP_N]
    dets = np.concatenate([props[order], fg[order, None]], axis=1)
    keep = nms_np(dets.astype(np.float32), cfg.TRAIN.RPN_NMS_THRESH)
    keep = keep[: cfg.TRAIN.RPN_POST_NMS_TOP_N]
    train_proposals = np.concatenate(
        [props[order][keep], fg[order][keep, None]], axis=1)  # (R, 5) +score

    rpn_ce, rpn_box = ref_rpn_losses(rpn_logits, rpn_deltas, anchors,
                                     gt, (h, w), cfg)

    feat_hwc = feat[0].permute(1, 2, 0).numpy()
    pooled = roi_align_np(feat_hwc, sampled_rois,
                          output_size=cfg.POOLING_SIZE,
                          spatial_scale=1.0 / cfg.FEAT_STRIDE[0],
                          sampling_ratio=cfg.TPU.ROI_SAMPLING_RATIO)
    pooled_t = torch.from_numpy(pooled.transpose(0, 3, 1, 2).astype(np.float32))
    with torch.no_grad():
        fc = tail_fn(pooled_t, sd)
        cls_logits = F.linear(fc, sd["cls_score.weight"],
                              sd["cls_score.bias"]).numpy()
        bbox_pred = F.linear(fc, sd["bbox_pred.weight"],
                             sd["bbox_pred.bias"]).numpy()

    ce, box_loss, _ = ref_roi_losses(sampled_rois, gt, gt_labels,
                                     cls_logits, bbox_pred, cfg, num_classes)

    losses = {"rpn_cross_entropy": float(rpn_ce),
              "rpn_loss_box": float(rpn_box),
              "cross_entropy": float(ce), "loss_box": float(box_loss),
              "total_loss": float(rpn_ce + rpn_box + ce + box_loss)}
    return losses, train_proposals


def ref_postprocess(scores, boxes, num_classes, cfg, max_per_image=None):
    """Reference test_net per-image loop: per-class score threshold + NMS +
    optional global score cap.  Returns list[class] of (k, 5) arrays."""
    per_class = [np.zeros((0, 5), np.float32)]           # background empty
    for j in range(1, num_classes):
        inds = np.where(scores[:, j] > cfg.TEST.SCORE_THRESH)[0]
        cls_dets = np.concatenate(
            [boxes[inds, 4 * j:4 * j + 4], scores[inds, j:j + 1]],
            axis=1).astype(np.float32)
        keep = nms_np(cls_dets, cfg.TEST.NMS)
        per_class.append(cls_dets[keep])
    if max_per_image:
        all_scores = np.concatenate([d[:, 4] for d in per_class])
        if len(all_scores) > max_per_image:
            thresh = np.sort(all_scores)[-max_per_image]
            per_class = [d[d[:, 4] >= thresh] for d in per_class]
    return per_class
