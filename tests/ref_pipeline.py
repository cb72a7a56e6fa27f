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

from tests.oracles import bbox_transform_inv_np, nms_np, roi_align_np


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
