#!/usr/bin/env python
"""Cumulative-prefix timing of the FPN detect pipeline (one process).

The isolated stage budget (scripts/profile_fpn.py) sums to ~51 ms while the
full detect measures ~58 — this attributes the gap by slope-timing growing
prefixes of the REAL pipeline (each prefix includes all upstream stages and
their true in-situ layouts/co-scheduling):

  P1 trunk+neck  ->  P2 +RPN  ->  P3 +propose  ->  P4 +pool  ->
  P5 +head (predict)  ->  P6 +postprocess (detect)

Usage: python scripts/profile_fpn_cumulative.py [--batch 8] [--bucket 800x1216]
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
    ap.add_argument("--net", default="res50_fpn")
    ap.add_argument("--bucket", default="800x1216")
    args = ap.parse_args()

    from frcnn_tpu.config import default_config
    from frcnn_tpu.models import build_model
    from frcnn_tpu.models.backbones import pack_images

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
        # jnp.sum, NOT ravel()[0]: ravel of a (B, H, W, C) output is a full
        # Mosaic relayout — measured +11 ms on the 332 MB pyramid alone
        # (PROFILE_r05 §4), which silently inflated every prefix of the
        # round-4 table by a different amount.  A full-array sum forces the
        # same computation but reads it in layout (~0.1 ms/GB).
        leaves = jax.tree.leaves(outs)
        return sum(jnp.sum(jnp.asarray(o, jnp.float32)) for o in leaves)

    def prefix(upto):
        def run(mdl, im):
            pyr = mdl._pyramid(im)
            if upto == "pyramid":
                return pyr
            _, prob, _, cells, _ = mdl._rpn_all_levels(pyr)
            if upto == "rpn":
                return [prob] + list(cells)
            anchors = mdl._anchors(pyr)
            rois, scores, valid = mdl._propose(
                pyr, prob, cells, anchors, im_info, train=False)
            if upto == "propose":
                return (rois, scores)
            pooled = mdl._pool(pyr, rois)
            if upto == "pool":
                return pooled
            _, cls_prob, bbox_pred = mdl._classify(pooled, train=False)
            return {"rois": rois, "roi_scores": scores, "roi_valid": valid,
                    "cls_prob": cls_prob, "bbox_pred": bbox_pred}
        return run

    prev = 0.0
    for name in ("pyramid", "rpn", "propose", "pool", "predict"):
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
