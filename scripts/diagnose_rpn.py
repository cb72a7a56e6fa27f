#!/usr/bin/env python
"""RPN diagnostic: proposal recall vs ground truth on a trained snapshot.

Usage: python scripts/diagnose_rpn.py --model <ckpt> [--net mobile] [--set ...]
Reports, over the trainval split: RPN proposal recall@0.5 (does any proposal
cover each gt?), mean top-proposal IoU, and RPN score separation between
anchors near gt and far from gt — isolates "RPN not localizing" from
"box head not classifying".
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--net", default="mobile")
    parser.add_argument("--imdb", default="voc_2007_trainval")
    parser.add_argument("--n-images", type=int, default=8)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER,
                        default=None)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import cv2
    import numpy as np

    from frcnn_tpu.config import default_config, cfg_from_list
    from frcnn_tpu.data.factory import get_imdb
    from frcnn_tpu.engine.checkpoint import load_params
    from frcnn_tpu.engine.test import _prep
    from frcnn_tpu.models import build_model
    from frcnn_tpu.native.host_ops import bbox_overlaps_cpu

    cfg = default_config()
    if args.set_cfgs:
        cfg = cfg_from_list(cfg, args.set_cfgs)
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = build_model(args.net, 21, cfg, dtype=dtype)
    params = load_params(args.model, model, cfg)
    imdb = get_imdb(args.imdb)
    roidb = imdb.roidb

    predict = jax.jit(lambda v, im, ii: model.apply(v, im, ii, method="predict"))
    recalls, top_ious, seps = [], [], []
    for i in range(min(args.n_images, imdb.num_images)):
        im = cv2.imread(imdb.image_path_at(i))
        blob, info = _prep(im, cfg)
        out = predict({"params": params}, blob[None], info[None])
        rois = np.asarray(out["rois"][0]) / info[2]  # back to image coords
        valid = np.asarray(out["roi_valid"][0])
        scores = np.asarray(out["roi_scores"][0])
        gt = roidb[i]["boxes"].astype(np.float32)
        if len(gt) == 0:
            continue
        ious = bbox_overlaps_cpu(rois[valid], gt)  # (R, G)
        best = ious.max(axis=0)
        recalls.append((best >= 0.5).mean())
        top_ious.append(best.mean())
        # score separation: rois overlapping gt vs not
        roi_max = ious.max(axis=1)
        s = scores[valid]
        pos, neg = s[roi_max >= 0.5], s[roi_max < 0.3]
        if len(pos) and len(neg):
            seps.append(pos.mean() - neg.mean())
    print(f"images: {len(recalls)}")
    print(f"proposal recall@0.5: {np.mean(recalls):.3f}")
    print(f"mean best-IoU per gt: {np.mean(top_ious):.3f}")
    if seps:
        print(f"RPN score separation (pos-neg): {np.mean(seps):+.4f}")
    else:
        print("RPN score separation: no positive proposals found")


if __name__ == "__main__":
    main()
