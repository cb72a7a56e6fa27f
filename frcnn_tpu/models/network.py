"""Detector assembly: the whole two-stage Faster R-CNN as one fixed-shape,
jittable flax module.

Rebuild of the reference's ``Network`` base class (``lib/nets/network.py:
~1-600``, SURVEY.md #8).  The reference's forward crosses host↔device four
times per step (anchor grid, NMS dispatch, two numpy target layers —
SURVEY.md §3.1); here the entire train/test graph — preprocessing to final
per-class NMS — is pure jnp/Pallas under one ``jit``:

  * ``predict``        ≙ reference ``test_image``: backbone → RPN → proposal
                         layer → RoI features → box head; raw outputs.
  * ``detect``         ≙ reference ``im_detect`` + per-class NMS (test.py):
                         adds delta un-normalization, decode, clip, rescale
                         to original coords, per-class score threshold + NMS,
                         top max_per_image — fixed (B, D, 6) output.
  * ``train_forward``  ≙ reference ``forward(mode='TRAIN')`` + ``_add_losses``:
                         proposal layer (train Ns) → anchor & proposal target
                         layers (in-graph, jax.random) → RoI head → 4 losses.

Anchors are compile-time constants per feature-grid shape (the reference
recomputes them on host per forward, ``_anchor_component``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from frcnn_tpu.config import Config
from frcnn_tpu.models.losses import detection_losses_compact
from frcnn_tpu.models.proposals import (proposal_layer,  # noqa: F401
                                         proposal_layer_batch,
                                         proposal_top_layer)
from frcnn_tpu.models.targets import (anchor_target_compact,
                                      proposal_target_layer)
from frcnn_tpu.ops.anchors import generate_anchors_pre
from frcnn_tpu.ops.boxes import bbox_transform_inv, clip_boxes
from frcnn_tpu.ops.nms import batched_class_nms
from frcnn_tpu.ops.roi_align import extract_roi_features


def decode_boxes(out, im_info, cfg, num_classes: int):
    """im_detect delta decode (reference test.py:~L100-L160): un-normalize by
    BBOX_NORMALIZE_STDS/MEANS, decode per class, clip, rescale to ORIGINAL
    image coords.  out: predict() dict; returns (B, N, 4C)."""
    rois, bbox_pred = out["rois"], out["bbox_pred"]
    c = num_classes
    if cfg.TEST.BBOX_REG:
        stds = jnp.tile(jnp.asarray(cfg.TRAIN.BBOX_NORMALIZE_STDS, jnp.float32), c)
        means = jnp.tile(jnp.asarray(cfg.TRAIN.BBOX_NORMALIZE_MEANS, jnp.float32), c)
        deltas = bbox_pred * stds + means
        boxes = jax.vmap(bbox_transform_inv)(rois, deltas)
        boxes = jax.vmap(clip_boxes)(boxes, im_info[:, :2])
    else:
        boxes = jnp.tile(rois, (1, 1, c))
    return boxes / im_info[:, 2][:, None, None]


def postprocess_detections(out, im_info, cfg, num_classes: int,
                           max_per_image: int):
    """Fused test-time post-processing (reference test.py per-image loop):
    per-class score threshold + NMS + global top-k, batched in-graph.

    Returns (detections (B, D, 6) [x1,y1,x2,y2,score,class], valid (B, D))."""
    d = max_per_image
    boxes = decode_boxes(out, im_info, cfg, num_classes)       # (B, N, 4C)
    scores = out["cls_prob"]                                   # (B, N, C)
    roi_valid = out["roi_valid"]                               # (B, N)
    b, n, c = scores.shape

    cls_boxes = boxes.reshape(b, n, c, 4).transpose(0, 2, 1, 3)  # (B, C, N, 4)
    cls_scores = scores.transpose(0, 2, 1)                       # (B, C, N)
    valid = roi_valid[:, None, :] & (cls_scores > cfg.TEST.SCORE_THRESH)
    per_cls = min(d, n)

    # all B*C per-class NMS problems in one batched call (one Pallas launch)
    idx, keep = batched_class_nms(
        cls_boxes.reshape(b * c, n, 4), cls_scores.reshape(b * c, n),
        cfg.TEST.NMS, per_cls, valid=valid.reshape(b * c, n),
        use_pallas=cfg.TPU.USE_PALLAS)
    g_boxes = jnp.take_along_axis(
        cls_boxes.reshape(b * c, n, 4), idx[..., None], axis=1)  # (BC, per, 4)
    g_scores = jnp.take_along_axis(cls_scores.reshape(b * c, n), idx, axis=1)
    g_scores = jnp.where(keep, g_scores, -1.0).reshape(b, c, per_cls)
    cls_ids = jnp.broadcast_to(
        jnp.arange(c, dtype=jnp.float32)[None, :, None], g_scores.shape)
    g_scores = jnp.where(cls_ids > 0, g_scores, -1.0)  # drop background
    flat_scores = g_scores.reshape(b, c * per_cls)
    top_scores, top_idx = jax.lax.top_k(flat_scores, d)           # (B, D)
    det_valid = top_scores > 0
    g_boxes = g_boxes.reshape(b, c * per_cls, 4)
    det = jnp.concatenate(
        [jnp.take_along_axis(g_boxes, top_idx[..., None], axis=1),
         top_scores[..., None],
         jnp.take_along_axis(cls_ids.reshape(b, -1), top_idx, axis=1)[..., None]],
        axis=2)
    det = jnp.where(det_valid[..., None], det, 0.0)
    return det, det_valid


def gather_anchor_rows(cells, sel, a_n: int, d: int):
    """Fetch per-anchor head rows for global A-minor anchor ids straight from
    the (B, ΣHW, d·A) conv-cell layout: a row gather on the cell axis + an
    A-way lane select.  Avoids materializing the (B, K, d) per-anchor rows —
    a lane-padded Mosaic relayout costing ~3.7 ms at FPN's 800×1216 B8 scale
    (scripts/probe_fpn_rpn.py) — when only S ≪ K sampled rows are consumed.

    cells: (B, ΣHW, d·A) level-concatenated conv output, last axis split
    (A, d) a-major; sel: (B, S) global anchor ids.  id = cell · A + a holds
    across level boundaries because every level's anchor-count offset is
    divisible by A.  Returns (B, S, d) f32.
    """
    b, s = sel.shape
    cell = sel // a_n
    a = sel % a_n
    rows = jnp.take_along_axis(cells, cell[..., None], axis=1)  # (B, S, dA)
    rows = rows.reshape(b, s, a_n, d)
    pick = (a[..., None] == jnp.arange(a_n))[..., None]         # (B, S, A, 1)
    return jnp.sum(jnp.where(pick, rows, 0.0), axis=2).astype(jnp.float32)


class FasterRCNN(nn.Module):
    backbone: nn.Module
    num_classes: int
    config: Config
    dtype: Any = jnp.float32

    @property
    def _A(self) -> int:
        return self.config.num_anchors

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal
        # RPN head (reference _region_proposal): 3x3x512 + two 1x1 convs,
        # weight init sigma=0.01
        self.rpn_net = nn.Conv(512, (3, 3), padding="SAME", dtype=self.dtype,
                               kernel_init=init(0.01), name="rpn_net")
        self.rpn_cls_score = nn.Conv(self._A * 2, (1, 1), dtype=self.dtype,
                                     kernel_init=init(0.01), name="rpn_cls_score")
        self.rpn_bbox_pred = nn.Conv(self._A * 4, (1, 1), dtype=self.dtype,
                                     kernel_init=init(0.01), name="rpn_bbox_pred")
        # RoI classification head (reference _region_classification):
        # sigma=0.01 for cls_score, 0.001 for bbox_pred
        self.cls_score = nn.Dense(self.num_classes, kernel_init=init(0.01),
                                  name="cls_score")
        self.bbox_pred = nn.Dense(self.num_classes * 4, kernel_init=init(0.001),
                                  name="bbox_pred")
        del cfg

    # -- stages -------------------------------------------------------------

    @property
    def input_block(self) -> int:
        """Host-packing factor the backbone prefers (see backbones.pack_images)."""
        return getattr(self.backbone, "input_block", 1)

    def _preprocess(self, images):
        """Mean-subtract in-graph (reference does it on host in blob prep;
        BASELINE.json wants preprocessing fused into the XLA graph).
        images: (B, H, W, 3) BGR (Caffe convention), or the host-blocked
        (B, H, W/4, 12) layout from backbones.pack_images."""
        from frcnn_tpu.models.backbones import preprocess_images

        return preprocess_images(images, self.config, self.dtype)

    def _rpn(self, feat):
        """RPN conv head → (cls_logits (B,K,2), fg_prob (B,K), deltas (B,K,4),
        cls_cells (B,HW,2A)) in anchor order (row-major cells, A contiguous
        per cell).

        fg_prob is computed straight off the (B,H,W,2A) conv map as
        sigmoid(fg_logit − bg_logit) — identical to softmax(...)[..., 1] but
        without the (…, 2A) → (K, 2) relayout, which Mosaic handles badly
        (measured 0.56 ms vs 0.003 ms at the detect shape).  The (B,K,2)
        logits reshape exists only for oracle tests/probes; both production
        paths leave it unconsumed (detect doesn't need it, the train loss
        gathers sampled rows from cls_cells) so XLA removes it."""
        b, h, w, _ = feat.shape
        x = nn.relu(self.rpn_net(feat))
        cls_map = self.rpn_cls_score(x).astype(jnp.float32)  # (B,H,W,2A)
        box = self.rpn_bbox_pred(x).reshape(b, h * w * self._A, 4).astype(jnp.float32)
        prob = jax.nn.sigmoid(
            cls_map[..., 1::2] - cls_map[..., 0::2]).reshape(b, h * w * self._A)
        cls = cls_map.reshape(b, h * w * self._A, 2)
        return cls, prob, box, cls_map.reshape(b, h * w, 2 * self._A)

    def _anchors(self, feat_shape):
        h, w = feat_shape[1], feat_shape[2]
        anchors, _ = generate_anchors_pre(
            h, w, self.config.FEAT_STRIDE[0],
            ratios=self.config.ANCHOR_RATIOS, scales=self.config.ANCHOR_SCALES)
        return anchors  # (K, 4) compile-time constant

    def _pool(self, feat, rois):
        """Per-image RoI feature extraction, vmapped over batch.
        feat: (B, h, w, C); rois: (B, N, 4) image coords.

        NOT padded-rows (unlike the FPN pool): running the C4 head on the
        roi-tile-padded rows to skip the pallas output's R_pad→R slice
        copy FAILED the on-chip bit-identity gate
        (scripts/probe_pool_pad_identity.py --only c4): layer4's convs
        recompile at B·N_pad=608 rows with different tiling than at 600,
        so cls/bbox differ at accumulation-order level — benign but not
        certifiable, unlike the FPN box head (pure row-tiled matmuls,
        bit-identical).  The slice copy stays."""
        cfg = self.config
        return jax.vmap(
            lambda f, r: extract_roi_features(
                f, r, mode=cfg.POOLING_MODE, output_size=cfg.POOLING_SIZE,
                spatial_scale=1.0 / cfg.FEAT_STRIDE[0],
                sampling_ratio=cfg.TPU.ROI_SAMPLING_RATIO,
                use_pallas=cfg.TPU.USE_PALLAS)
        )(feat, rois)

    def _classify(self, pooled, train: bool):
        """RoI head: (B, N, p, p, C) → cls logits/probs + bbox deltas."""
        b, n = pooled.shape[:2]
        flat = pooled.reshape((b * n,) + pooled.shape[2:]).astype(self.dtype)
        fc = self.backbone.head_to_tail(flat, train=train)
        cls_logits = self.cls_score(fc).astype(jnp.float32)
        bbox = self.bbox_pred(fc).astype(jnp.float32)
        return (cls_logits.reshape(b, n, -1),
                jax.nn.softmax(cls_logits, axis=-1).reshape(b, n, -1),
                bbox.reshape(b, n, -1))

    # -- modes --------------------------------------------------------------

    def predict(self, images, im_info):
        """TEST forward (reference test_image): raw rois + class probs + deltas.

        images: (B, H, W, 3); im_info: (B, 3) [h, w, scale] actual sizes.
        """
        cfg = self.config
        x = self._preprocess(images)
        feat = self.backbone.extract_features(x)
        _, fg_prob, deltas, _ = self._rpn(feat)
        anchors = self._anchors(feat.shape)

        if cfg.TEST.MODE == "top":
            rois, roi_scores, roi_valid = jax.vmap(
                lambda s, d, i: proposal_top_layer(
                    s, d, anchors, i, rpn_top_n=cfg.TEST.RPN_TOP_N)
            )(fg_prob, deltas, im_info)
        else:
            rois, roi_scores, roi_valid = proposal_layer_batch(
                fg_prob, deltas, anchors, im_info,
                pre_nms_top_n=cfg.TEST.RPN_PRE_NMS_TOP_N,
                post_nms_top_n=cfg.TEST.RPN_POST_NMS_TOP_N,
                nms_thresh=cfg.TEST.RPN_NMS_THRESH,
                use_pallas=cfg.TPU.USE_PALLAS,
                use_threshold=(cfg.TPU.USE_PALLAS and cfg.TPU.THRESHOLD_SELECT
                               and jax.default_backend() == "tpu"))

        pooled = self._pool(feat, rois)
        _, cls_prob, bbox_pred = self._classify(pooled, train=False)
        return {"rois": rois, "roi_scores": roi_scores, "roi_valid": roi_valid,
                "cls_prob": cls_prob, "bbox_pred": bbox_pred}

    def decode_detections(self, out, im_info):
        """im_detect delta decode (see decode_boxes)."""
        return decode_boxes(out, im_info, self.config, self.num_classes)

    def detect(self, images, im_info, max_per_image: int | None = None):
        """Fused end-to-end serving path: predict + decode + per-class NMS +
        global top-k (reference test.py per-image loop, in-graph, batched).

        Returns (detections (B, D, 6) [x1,y1,x2,y2,score,class], valid (B, D)).
        """
        out = self.predict(images, im_info)
        return postprocess_detections(out, im_info, self.config,
                                      self.num_classes,
                                      max_per_image or self.config.TEST.MAX_PER_IMAGE)

    def train_forward(self, images, im_info, gt_boxes, gt_labels, gt_valid, key):
        """TRAIN forward (reference forward(TRAIN) + _add_losses).

        gt_boxes: (B, G, 4) padded; gt_labels: (B, G); gt_valid: (B, G).
        key: PRNG key for target sampling.  Returns (losses dict, aux dict);
        losses averaged over the batch.
        """
        cfg = self.config
        b = images.shape[0]
        x = self._preprocess(images)
        feat = self.backbone.extract_features(x)
        _, fg_prob, deltas, cls_cells = self._rpn(feat)
        anchors = self._anchors(feat.shape)

        rois, roi_scores, roi_valid = proposal_layer_batch(
            jax.lax.stop_gradient(fg_prob), jax.lax.stop_gradient(deltas),
            anchors, im_info,
            pre_nms_top_n=cfg.TRAIN.RPN_PRE_NMS_TOP_N,
            post_nms_top_n=cfg.TRAIN.RPN_POST_NMS_TOP_N,
            nms_thresh=cfg.TRAIN.RPN_NMS_THRESH,
            use_pallas=cfg.TPU.USE_PALLAS,
            use_threshold=(cfg.TPU.USE_PALLAS and cfg.TPU.THRESHOLD_SELECT
                           and jax.default_backend() == "tpu"))

        keys = jax.random.split(key, 2 * b)
        at = jax.vmap(
            lambda g, gv, i, k: anchor_target_compact(anchors, g, gv, i, k, cfg)
        )(gt_boxes, gt_valid, im_info, keys[:b])
        pt = jax.vmap(
            lambda r, rv, g, gl, gv, k: proposal_target_layer(
                r, rv, g, gl, gv, k, cfg, self.num_classes)
        )(rois, roi_valid, gt_boxes, gt_labels, gt_valid, keys[b:])

        pooled = self._pool(feat, pt.rois)
        cls_logits, cls_prob, bbox_pred = self._classify(pooled, train=True)

        # RPN loss terms over the sampled rows only (see anchor_target_compact
        # / detection_losses_compact): head rows fetched at at.sel, the dense
        # (B, K, 2) logits rows never enter the train graph.
        cls_rows = gather_anchor_rows(cls_cells, at.sel, self._A, 2)
        box_rows = jnp.take_along_axis(deltas, at.sel[..., None], axis=1)
        losses = jax.vmap(detection_losses_compact)(cls_rows, box_rows, at,
                                                    cls_logits, bbox_pred, pt)
        losses = jax.tree.map(jnp.mean, losses)
        aux = {"rois": pt.rois, "roi_labels": pt.labels, "cls_prob": cls_prob,
               "n_fg": jnp.sum(pt.labels > 0), "n_proposals": jnp.sum(roi_valid),
               "proposals": rois, "proposal_scores": roi_scores,
               "proposal_valid": roi_valid}
        return losses, aux

    def __call__(self, images, im_info):
        """Init convenience: touches every parameter (backbone trunk+tail,
        RPN, classification heads)."""
        return self.predict(images, im_info)

    def frozen_param(self, path: tuple, cfg=None) -> bool:
        """Optimizer freezing policy over full param paths."""
        if path and str(path[0]) == "backbone":
            return self.backbone.frozen_param(tuple(path[1:]),
                                              cfg or self.config)
        return False


def build_model(net: str, num_classes: int, cfg: Config, dtype=jnp.float32):
    """Model factory (reference trainval_net.py --net + create_architecture).

    net: vgg16 | res50 | res101 | res152 | mobile, or res{50,101,152}_fpn
    for the FPN variant (capability beyond the reference).
    """
    if "_fpn" in net:
        from frcnn_tpu.models.fpn import build_fpn_model

        return build_fpn_model(net, num_classes, cfg, dtype=dtype)
    from frcnn_tpu.models.backbones import build_backbone

    backbone = build_backbone(net, cfg, dtype=dtype)
    return FasterRCNN(backbone=backbone, num_classes=num_classes, config=cfg,
                      dtype=dtype)
