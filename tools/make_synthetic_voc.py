#!/usr/bin/env python
"""Generate a tiny synthetic VOC2007-format dataset (colored rectangles on
noise) for smoke-training and pipeline verification without real data.

Usage: python tools/make_synthetic_voc.py [--root data] [--images 20]
Creates <root>/VOCdevkit2007/VOC2007/{Annotations,ImageSets/Main,JPEGImages}.
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import cv2

    from frcnn_tpu.data.pascal_voc import VOC_CLASSES

    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="data")
    parser.add_argument("--images", type=int, default=20)
    parser.add_argument("--classes", nargs="+",
                        default=["dog", "cat", "car", "person"])
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    for c in args.classes:
        assert c in VOC_CLASSES, f"not a VOC class: {c}"

    d = osp.join(args.root, "VOCdevkit2007", "VOC2007")
    import os

    os.makedirs(osp.join(d, "Annotations"), exist_ok=True)
    os.makedirs(osp.join(d, "ImageSets", "Main"), exist_ok=True)
    os.makedirs(osp.join(d, "JPEGImages"), exist_ok=True)

    rng = np.random.RandomState(args.seed)
    index = []
    # fixed color per class so a trained net CAN learn to detect them
    colors = {c: rng.randint(40, 255, 3) for c in args.classes}
    for i in range(args.images):
        name = f"{i:06d}"
        index.append(name)
        h = int(rng.choice([240, 320, 360]))
        w = int(rng.choice([320, 400, 480]))
        im = rng.randint(0, 80, (h, w, 3)).astype(np.uint8)
        objs = []
        for _ in range(rng.randint(1, 4)):
            bw, bh = rng.randint(40, 100, 2)
            x1 = rng.randint(0, w - bw - 1)
            y1 = rng.randint(0, h - bh - 1)
            cls = args.classes[rng.randint(len(args.classes))]
            im[y1:y1 + bh, x1:x1 + bw] = colors[cls]
            objs.append((cls, x1, y1, x1 + bw, y1 + bh))
        cv2.imwrite(osp.join(d, "JPEGImages", name + ".jpg"), im)
        xml_objs = "".join(
            f"""  <object><name>{c}</name><pose>Left</pose><truncated>0</truncated>
    <difficult>0</difficult>
    <bndbox><xmin>{x1+1}</xmin><ymin>{y1+1}</ymin><xmax>{x2+1}</xmax><ymax>{y2+1}</ymax></bndbox>
  </object>\n""" for c, x1, y1, x2, y2 in objs)
        with open(osp.join(d, "Annotations", name + ".xml"), "w") as f:
            f.write(f"""<annotation><folder>VOC2007</folder><filename>{name}.jpg</filename>
<size><width>{w}</width><height>{h}</height><depth>3</depth></size>
{xml_objs}</annotation>""")

    split = max(2, args.images * 3 // 4)
    with open(osp.join(d, "ImageSets", "Main", "trainval.txt"), "w") as f:
        f.write("\n".join(index[:split]) + "\n")
    with open(osp.join(d, "ImageSets", "Main", "test.txt"), "w") as f:
        f.write("\n".join(index[split:]) + "\n")
    print(f"wrote {args.images} synthetic images to {d} "
          f"(trainval {split}, test {args.images - split})")


if __name__ == "__main__":
    main()
