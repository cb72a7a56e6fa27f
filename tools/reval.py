#!/usr/bin/env python
"""Re-evaluate saved detections without re-running the network
(reference ``tools/reval.py:~1-100``): reads detections.pkl, optionally
re-applies NMS (via the native C++ host op), calls imdb.evaluate_detections."""

from __future__ import annotations

import argparse
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def parse_args():
    parser = argparse.ArgumentParser(description="Re-evaluate results")
    parser.add_argument("output_dir", help="directory containing detections.pkl")
    parser.add_argument("--imdb", dest="imdb_name", default="voc_2007_test")
    parser.add_argument("--comp", dest="comp_mode", action="store_true")
    parser.add_argument("--nms", dest="apply_nms", action="store_true",
                        help="re-apply per-class NMS before evaluating")
    parser.add_argument("--nms-thresh", type=float, default=0.3)
    parser.add_argument("--data-dir", default=None,
                        help="dataset root (defaults to cfg.DATA_DIR)")
    return parser.parse_args()


def from_dets(imdb_name, output_dir, args):
    from frcnn_tpu.data.factory import get_imdb
    from frcnn_tpu.engine.test import apply_nms

    imdb = get_imdb(imdb_name, data_dir=args.data_dir)
    imdb.competition_mode(args.comp_mode)
    with open(osp.join(output_dir, "detections.pkl"), "rb") as f:
        dets = pickle.load(f)
    if args.apply_nms:
        print(f"Applying NMS to all detections (thresh {args.nms_thresh})")
        dets = apply_nms(dets, args.nms_thresh)
    print("Evaluating detections")
    imdb.evaluate_detections(dets, output_dir)


if __name__ == "__main__":
    args = parse_args()
    from_dets(args.imdb_name, osp.abspath(args.output_dir), args)
