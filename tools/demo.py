#!/usr/bin/env python
"""Single-image detection demo (reference ``tools/demo.py:~1-150``):
run detection on image files, draw boxes above CONF_THRESH, save/show."""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

CONF_THRESH = 0.8
NMS_THRESH = 0.3


def parse_args():
    parser = argparse.ArgumentParser(description="Faster R-CNN demo")
    parser.add_argument("--net", dest="net", default="res50",
                        choices=["vgg16", "res50", "res101", "res152", "mobile",
                                 "res50_fpn", "res101_fpn", "res152_fpn",
                                 "res50_fpn_gn", "res101_fpn_gn",
                                 "res152_fpn_gn"])
    parser.add_argument("--model", dest="model_ckpt", required=True)
    parser.add_argument("--cfg", dest="cfg_file", default=None)
    parser.add_argument("--images", nargs="+", required=True)
    parser.add_argument("--out-dir", default="output/demo")
    parser.add_argument("--conf", type=float, default=CONF_THRESH)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER,
                        default=None)
    return parser.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import cv2
    import dataclasses
    import numpy as np
    import os
    from frcnn_tpu.config import default_config, cfg_from_file, cfg_from_list
    from frcnn_tpu.data.pascal_voc import VOC_CLASSES
    from frcnn_tpu.engine.checkpoint import load_params
    from frcnn_tpu.engine.test import _prep
    from frcnn_tpu.models import build_model
    from frcnn_tpu.utils.visualization import draw_bounding_boxes

    cfg = default_config()
    if args.cfg_file:
        cfg = cfg_from_file(cfg, args.cfg_file)
    if args.set_cfgs:
        cfg = cfg_from_list(cfg, args.set_cfgs)
    # demo uses NMS 0.3 like the reference
    cfg = dataclasses.replace(cfg, TEST=dataclasses.replace(cfg.TEST, NMS=NMS_THRESH))

    model = build_model(args.net, len(VOC_CLASSES), cfg)
    params = load_params(args.model_ckpt, model, cfg)
    os.makedirs(args.out_dir, exist_ok=True)

    for path in args.images:
        im = cv2.imread(path)
        assert im is not None, path
        blob, info = _prep(im, cfg)
        dets, valid = model.apply({"params": params}, blob[None], info[None],
                                  method="detect")
        dets = np.asarray(dets[0])[np.asarray(valid[0])]
        dets = dets[dets[:, 4] >= args.conf]
        print(f"{path}: {len(dets)} detections ≥ {args.conf}")
        for d in dets:
            print(f"  {VOC_CLASSES[int(d[5])]:>12s} {d[4]:.3f} "
                  f"[{d[0]:.0f}, {d[1]:.0f}, {d[2]:.0f}, {d[3]:.0f}]")
        vis = draw_bounding_boxes(im[:, :, ::-1], dets[:, :4],
                                  dets[:, 5].astype(int), dets[:, 4],
                                  VOC_CLASSES)
        out = osp.join(args.out_dir, osp.basename(path))
        cv2.imwrite(out, vis[:, :, ::-1])
        print(f"  wrote {out}")


if __name__ == "__main__":
    main()
