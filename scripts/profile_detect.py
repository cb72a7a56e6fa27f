#!/usr/bin/env python
"""Stage budget for the fused detect pipeline (bench.py's exact config).

Slope-times each stage of FasterRCNN.detect separately on the real TPU:
preprocess+backbone, RPN head + proposal layer (top-k + Pallas NMS),
RoIAlign, classification head (res5 tail + fc), and final postprocess
(decode + per-class NMS + top-k).  Stage inputs are realistic tensors of
the shapes the full pipeline produces; same in-graph fori_loop slope
methodology as bench.py (the axon tunnel's block_until_ready is unreliable
and each dispatch pays ~25 ms RPC).

Usage: python scripts/profile_detect.py [--batch 8] [--net res50]
"""

import argparse
import dataclasses
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_backbone import slope_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--net", default="res50")
    args = ap.parse_args()

    from frcnn_tpu.config import default_config
    from frcnn_tpu.models import build_model
    from frcnn_tpu.models.backbones import pack_images

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        TEST=dataclasses.replace(cfg.TEST, SCALES=(800,), MAX_SIZE=1333),
        TPU=dataclasses.replace(cfg.TPU, BUCKETS=((800, 1216),)),
    )
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    B = args.batch
    model = build_model(args.net, 21, cfg, dtype=dtype)
    h, w = cfg.TPU.BUCKETS[0]
    rng = np.random.RandomState(0)
    images = jnp.asarray(pack_images(
        rng.uniform(0, 255, (B, h, w, 3)).astype(np.float32),
        getattr(model, "input_block", 1)))
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (B, 1))
    variables = model.init(jax.random.PRNGKey(0), images[:1], im_info[:1])

    print(f"backend={jax.default_backend()} net={args.net} batch={B} "
          f"bucket={h}x{w} dtype={dtype.__name__}")

    # ---- full pipeline ------------------------------------------------------
    def full(im):
        det, _ = model.apply(variables, im, im_info, method="detect")
        return det
    dt_full = slope_time(full, (images,))
    print(f"full detect        : {dt_full*1e3:7.2f} ms   "
          f"({B/dt_full:6.1f} img/s)")

    # ---- stage 1: preprocess + backbone ------------------------------------
    def bb(im):
        def run(mdl, x):
            return mdl.backbone.extract_features(mdl._preprocess(x))
        return model.apply(variables, im, method=run)
    dt = slope_time(bb, (images,))
    feat = jax.eval_shape(bb, images)
    print(f"backbone -> C4     : {dt*1e3:7.2f} ms   feat={feat.shape}")

    fh, fw, fc = feat.shape[1:]
    featv = jnp.asarray(rng.randn(B, fh, fw, fc), dtype)

    # ---- stage 2: RPN head + proposal layer ---------------------------------
    from frcnn_tpu.models.proposals import proposal_layer_batch

    def rpn_prop(f):
        def run(mdl, f):
            _, fg_prob, deltas, _ = mdl._rpn(f)
            anchors = mdl._anchors(f.shape)
            rois, scores, valid = proposal_layer_batch(
                fg_prob, deltas, anchors, im_info,
                pre_nms_top_n=cfg.TEST.RPN_PRE_NMS_TOP_N,
                post_nms_top_n=cfg.TEST.RPN_POST_NMS_TOP_N,
                nms_thresh=cfg.TEST.RPN_NMS_THRESH,
                use_pallas=cfg.TPU.USE_PALLAS)
            return rois
        return model.apply(variables, f, method=run)
    dt = slope_time(rpn_prop, (featv,))
    n_roi = cfg.TEST.RPN_POST_NMS_TOP_N
    print(f"RPN + proposal     : {dt*1e3:7.2f} ms   rois={B}x{n_roi}")

    # plausible rois for the pooling/head stages
    r0 = np.stack([rng.uniform(0, w - 64, (B, n_roi)),
                   rng.uniform(0, h - 64, (B, n_roi))], -1)
    wh_ = rng.uniform(32, 400, (B, n_roi, 2))
    roisv = jnp.asarray(np.concatenate(
        [r0, np.minimum(r0 + wh_, [w - 1, h - 1])], -1).astype(np.float32))

    # ---- stage 3: RoIAlign ---------------------------------------------------
    def pool(f):
        return model.apply(variables, f, roisv,
                           method=lambda mdl, f, r: mdl._pool(f, r))
    dt = slope_time(pool, (featv,))
    print(f"RoIAlign (Pallas)  : {dt*1e3:7.2f} ms   {B*n_roi} rois")

    pooledv = jnp.asarray(
        rng.randn(B, n_roi, cfg.POOLING_SIZE, cfg.POOLING_SIZE, fc), dtype)

    # ---- stage 4: classification head ---------------------------------------
    def head(p):
        return model.apply(variables, p,
                           method=lambda mdl, p: mdl._classify(p, False))[1]
    dt = slope_time(head, (pooledv,))
    print(f"head (tail + fc)   : {dt*1e3:7.2f} ms   {B*n_roi} rois")

    # ---- stage 5: decode + per-class NMS + top-k -----------------------------
    from frcnn_tpu.models.network import postprocess_detections

    out = {"rois": roisv, "roi_scores": jnp.ones((B, n_roi), jnp.float32),
           "roi_valid": jnp.ones((B, n_roi), bool),
           "cls_prob": jax.nn.softmax(
               jnp.asarray(rng.randn(B, n_roi, 21), jnp.float32), -1),
           "bbox_pred": jnp.asarray(
               0.1 * rng.randn(B, n_roi, 84), jnp.float32)}

    def post(cls_prob):
        det, _ = postprocess_detections(dict(out, cls_prob=cls_prob), im_info,
                                        cfg, 21, cfg.TEST.MAX_PER_IMAGE)
        return det
    dt = slope_time(post, (out["cls_prob"],))
    print(f"postprocess (NMS)  : {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
