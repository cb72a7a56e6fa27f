#!/usr/bin/env python
"""Cumulative-prefix timing of the C4 detect pipeline (bench.py's config).

Same methodology as scripts/profile_fpn_cumulative.py: slope-time growing
prefixes of the REAL pipeline so each increment carries its true in-situ
layouts (isolated stage feeds understate cost ~1.3x — layouts differ in
context).

Usage: python scripts/profile_detect_cumulative.py [--batch 8] [--net res50]
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
    ap.add_argument("--bucket", default="800x1216")
    args = ap.parse_args()

    from frcnn_tpu.config import default_config
    from frcnn_tpu.models import build_model
    from frcnn_tpu.models.backbones import pack_images
    from frcnn_tpu.models.proposals import proposal_layer_batch

    h, w = (int(x) for x in args.bucket.split("x"))
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        TEST=dataclasses.replace(cfg.TEST, SCALES=(800,), MAX_SIZE=1333),
        TPU=dataclasses.replace(cfg.TPU, BUCKETS=((h, w),)),
    )
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    B = args.batch
    model = build_model(args.net, 21, cfg, dtype=dtype)
    rng = np.random.RandomState(0)
    images = jnp.asarray(pack_images(
        rng.uniform(0, 255, (B, h, w, 3)).astype(np.float32),
        getattr(model, "input_block", 1)))
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (B, 1))
    variables = model.init(jax.random.PRNGKey(0), images[:1], im_info[:1])

    print(f"backend={jax.default_backend()} net={args.net} batch={B} "
          f"bucket={h}x{w} dtype={dtype.__name__}")

    def scalarize(outs):
        leaves = jax.tree.leaves(outs)
        return sum(jnp.asarray(o, jnp.float32).ravel()[0] for o in leaves)

    def prefix(upto):
        def run(mdl, im):
            feat = mdl.backbone.extract_features(mdl._preprocess(im))
            if upto == "backbone":
                return feat
            _, fg_prob, deltas, _ = mdl._rpn(feat)
            if upto == "rpn":
                return (fg_prob, deltas)
            anchors = mdl._anchors(feat.shape)
            rois, scores, valid = proposal_layer_batch(
                fg_prob, deltas, anchors, im_info,
                pre_nms_top_n=cfg.TEST.RPN_PRE_NMS_TOP_N,
                post_nms_top_n=cfg.TEST.RPN_POST_NMS_TOP_N,
                nms_thresh=cfg.TEST.RPN_NMS_THRESH,
                use_pallas=cfg.TPU.USE_PALLAS)
            if upto == "propose":
                return (rois, scores)
            pooled = mdl._pool(feat, rois)
            if upto == "pool":
                return pooled
            _, cls_prob, bbox_pred = mdl._classify(pooled, train=False)
            return {"rois": rois, "roi_scores": scores, "roi_valid": valid,
                    "cls_prob": cls_prob, "bbox_pred": bbox_pred}
        return run

    prev = 0.0
    for name in ("backbone", "rpn", "propose", "pool", "predict"):
        def fn(im, name=name):
            return scalarize(model.apply(variables, im, method=prefix(name)))
        dt = slope_time(fn, (images,)) * 1e3
        print(f"prefix +{name:9s}: {dt:7.2f} ms   (+{dt - prev:6.2f})")
        prev = dt

    def full(im):
        det, _ = model.apply(variables, im, im_info, method="detect")
        return det
    dt = slope_time(full, (images,)) * 1e3
    print(f"prefix +detect   : {dt:7.2f} ms   (+{dt - prev:6.2f})   "
          f"({B/dt*1e3:6.1f} img/s)")


if __name__ == "__main__":
    main()
