#!/usr/bin/env python
"""Stage budget for the FPN detect pipeline (res50_fpn).

Same slope methodology as scripts/profile_detect.py, but staged for the
pyramid pipeline: trunk C2-C5, FPN neck, shared RPN over P2-P6, per-level
top-k + joint NMS proposal, every-level RoIAlign + level-mask select,
2-fc box head, and postprocess.  FPN measured 60 img/s at 608x1024 B8
(PROFILE_r02 section 7) vs res50 C4's 282 — this finds the gap.

Usage: python scripts/profile_fpn.py [--batch 8] [--net res50_fpn]
       [--bucket 800x1216]
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

    # ---- full pipeline ------------------------------------------------------
    def full(im):
        det, _ = model.apply(variables, im, im_info, method="detect")
        return det
    dt_full = slope_time(full, (images,))
    print(f"full detect        : {dt_full*1e3:7.2f} ms   "
          f"({B/dt_full:6.1f} img/s)")

    def scalarize(fn):
        # reduce a list-of-arrays output to one scalar that depends on every
        # element (so slope_time can serialize it and XLA can't DCE a branch)
        def wrapped(*a):
            outs = fn(*a)
            return sum(jnp.asarray(o, jnp.float32).ravel()[0] for o in outs)
        return wrapped

    # ---- stage 1: trunk C2..C5 ----------------------------------------------
    def trunk(im):
        def run(mdl, x):
            return mdl.stages(mdl._preprocess(x))
        return model.apply(variables, im, method=run)
    dt = slope_time(scalarize(trunk), (images,))
    feats = jax.eval_shape(trunk, images)
    print(f"trunk C2..C5       : {dt*1e3:7.2f} ms   "
          f"{[tuple(f.shape[1:3]) for f in feats]}")

    featv = [jnp.asarray(rng.randn(*f.shape), dtype) for f in feats]

    # ---- stage 2: FPN neck ----------------------------------------------------
    def neck(*fs):
        return model.apply(variables, list(fs),
                           method=lambda mdl, fs: mdl.neck(fs))
    dt = slope_time(scalarize(neck), tuple(featv))
    pyr = jax.eval_shape(neck, *featv)
    print(f"neck P2..P6        : {dt*1e3:7.2f} ms   "
          f"{[tuple(p.shape[1:3]) for p in pyr]}")

    pyrv = [jnp.asarray(rng.randn(*p.shape), dtype) for p in pyr]

    # ---- stage 3: shared RPN over levels --------------------------------------
    def rpn_detect(*ps):
        # the detect-path consumption: prob + box_cells (cls/box rows DCE'd)
        def run(mdl, ps):
            _, prob, _, cells = mdl._rpn_all_levels(ps)
            return [prob] + list(cells)
        return model.apply(variables, list(ps), method=run)
    dt = slope_time(scalarize(rpn_detect), tuple(pyrv))
    k_tot = jax.eval_shape(rpn_detect, *pyrv)[0].shape[1]
    print(f"RPN (detect path)  : {dt*1e3:7.2f} ms   K={k_tot}")

    def rpn_train(*ps):
        def run(mdl, ps):
            cls, prob, rows, cells = mdl._rpn_all_levels(ps)
            return [cls, prob, rows] + list(cells)
        return model.apply(variables, list(ps), method=run)
    dt = slope_time(scalarize(rpn_train), tuple(pyrv))
    print(f"RPN (train path)   : {dt*1e3:7.2f} ms   (+ per-anchor rows)")

    # ---- stage 4: propose (per-level topk + joint NMS) -------------------------
    fgv = jax.nn.sigmoid(jnp.asarray(rng.randn(B, k_tot), jnp.float32))
    a_n = len(cfg.ANCHOR_RATIOS)
    cellsv = [jnp.asarray(0.1 * rng.randn(B, p.shape[1] * p.shape[2],
                                          4 * a_n), dtype) for p in pyr]

    def propose(fg, *cells):
        def run(mdl, fg, cells):
            anchors = mdl._anchors(pyrv)
            return mdl._propose(pyrv, fg, list(cells), anchors, im_info,
                                train=False)[0]
        return model.apply(variables, fg, cells, method=run)
    dt = slope_time(propose, (fgv,) + tuple(cellsv))
    n_roi = cfg.TEST.RPN_POST_NMS_TOP_N
    print(f"propose (topk+NMS) : {dt*1e3:7.2f} ms   rois={B}x{n_roi}")

    # plausible rois for pooling/head
    r0 = np.stack([rng.uniform(0, w - 64, (B, n_roi)),
                   rng.uniform(0, h - 64, (B, n_roi))], -1)
    wh_ = rng.uniform(16, 400, (B, n_roi, 2))
    roisv = jnp.asarray(np.concatenate(
        [r0, np.minimum(r0 + wh_, [w - 1, h - 1])], -1).astype(np.float32))

    # ---- stage 5: every-level RoIAlign + select --------------------------------
    def pool(*ps):
        return model.apply(variables, list(ps), roisv,
                           method=lambda mdl, ps, r: mdl._pool(ps, r))
    dt = slope_time(pool, tuple(pyrv))
    print(f"RoIAlign (4 levels): {dt*1e3:7.2f} ms   {B*n_roi} rois")

    pooledv = jnp.asarray(rng.randn(
        B, n_roi, cfg.POOLING_SIZE, cfg.POOLING_SIZE,
        cfg.FPN.OUT_CHANNELS), dtype)

    # ---- stage 6: box head ------------------------------------------------------
    def head(p):
        return model.apply(variables, p,
                           method=lambda mdl, p: mdl._classify(p, False))
    dt = slope_time(scalarize(head), (pooledv,))
    print(f"head (2fc)         : {dt*1e3:7.2f} ms   {B*n_roi} rois")

    # ---- stage 7: postprocess ----------------------------------------------------
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
