#!/usr/bin/env python
"""Measure the reference's CPU inference throughput (the north-star
denominator: BASELINE.md "images/sec ... reference CPU, to be measured").

The reference mount is empty (SURVEY.md provenance note), so this is a
minimal torch reimplementation of the reference's test-time pipeline at the
north-star config (ResNet-50 C4, 800px short side, batch 1, TEST.RPN_*
= 6000/300, per-class NMS) — torch 2.13 CPU is installed; torchvision is
not, so ResNet-50 and RoIAlign are built from torch.nn primitives (RoIAlign
via the same separable-matmul math we use on TPU, which if anything flatters
the CPU baseline).  Random weights — throughput doesn't depend on weight
values.

Usage: python scripts/torch_cpu_baseline.py [n_images]
Prints one JSON line: {"torch_cpu_images_per_sec": X, ...}
"""

import json
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, ".")
torch.set_grad_enabled(False)


def bottleneck(cin, width, stride=1):
    cout = width * 4
    layers = nn.Sequential(
        nn.Conv2d(cin, width, 1, bias=False), nn.BatchNorm2d(width), nn.ReLU(True),
        nn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False),
        nn.BatchNorm2d(width), nn.ReLU(True),
        nn.Conv2d(width, cout, 1, bias=False), nn.BatchNorm2d(cout),
    )
    down = nn.Sequential(nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                         nn.BatchNorm2d(cout)) if (cin != cout or stride != 1) else None

    def f(x):
        idt = x if down is None else down(x)
        return F.relu(layers(x) + idt)

    mods = nn.ModuleList([layers] + ([down] if down else []))
    return f, mods


class Res50C4(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
            nn.BatchNorm2d(64), nn.ReLU(True), nn.MaxPool2d(3, 2, 1))
        self.fns, mods = [], nn.ModuleList()
        cin = 64
        for width, n, stride in ((64, 3, 1), (128, 4, 2), (256, 6, 2)):
            for i in range(n):
                f, m = bottleneck(cin, width, stride if i == 0 else 1)
                self.fns.append(f)
                mods.append(m)
                cin = width * 4
        self.blocks = mods
        self.tail_fns, tail_mods = [], nn.ModuleList()
        cin = 1024
        for i in range(3):
            f, m = bottleneck(cin, 512, 2 if i == 0 else 1)
            self.tail_fns.append(f)
            tail_mods.append(m)
            cin = 2048
        self.tail_blocks = tail_mods
        self.rpn = nn.Conv2d(1024, 512, 3, padding=1)
        self.rpn_cls = nn.Conv2d(512, 18, 1)
        self.rpn_box = nn.Conv2d(512, 36, 1)
        self.cls_score = nn.Linear(2048, 21)
        self.bbox_pred = nn.Linear(2048, 84)

    def features(self, x):
        x = self.stem(x)
        for f in self.fns:
            x = f(x)
        return x

    def tail(self, x):
        for f in self.tail_fns:
            x = f(x)
        return x.mean(dim=(2, 3))


def roi_align_torch(feat, rois, p=7, scale=1 / 16.0, sr=2):
    """Separable-matmul RoIAlign (same math as the TPU path)."""
    _, c, h, w = feat.shape
    outs = []
    t = (torch.arange(p * sr, dtype=torch.float32) + 0.5) / sr
    for roi in rois:
        x1, y1, x2, y2 = (roi * scale).tolist()
        bw = max(x2 - x1, 1.0) / p
        bh = max(y2 - y1, 1.0) / p
        ys = y1 + t * bh
        xs = x1 + t * bw

        def interp(cs, size):
            m = torch.zeros(p * sr, size)
            cc = cs.clamp(0, size - 1)
            lo = cc.floor().long()
            hi = (lo + 1).clamp(max=size - 1)
            ly = cc - lo.float()
            m.scatter_(1, lo[:, None], (1 - ly)[:, None])
            m.scatter_add_(1, hi[:, None], ly[:, None])
            bad = (cs < -1) | (cs > size)
            m[bad] = 0
            return m

        wy = interp(ys, h)
        wx = interp(xs, w)
        g = torch.einsum("ph,chw->cpw", wy, feat[0])
        s = torch.einsum("qw,cpw->cpq", wx, g)
        outs.append(s.reshape(c, p, sr, p, sr).mean(dim=(2, 4)))
    return torch.stack(outs)


def nms_np(dets, thresh):
    from frcnn_tpu.native.host_ops import nms_cpu

    return nms_cpu(dets, thresh)


def decode(anchors, deltas):
    w = anchors[:, 2] - anchors[:, 0] + 1
    h = anchors[:, 3] - anchors[:, 1] + 1
    cx = anchors[:, 0] + 0.5 * w
    cy = anchors[:, 1] + 0.5 * h
    pcx = deltas[:, 0] * w + cx
    pcy = deltas[:, 1] * h + cy
    pw = np.exp(deltas[:, 2]) * w
    ph = np.exp(deltas[:, 3]) * h
    return np.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                     pcx + 0.5 * pw - 1, pcy + 0.5 * ph - 1], axis=1)


def main(n_images=5):
    from frcnn_tpu.ops.anchors import generate_anchors_pre

    model = Res50C4().eval()
    h, w = 800, 1216
    fh, fw = h // 16, w // 16
    anchors = np.asarray(generate_anchors_pre(fh, fw, 16)[0])

    times = []
    for i in range(n_images + 1):
        im = torch.randn(1, 3, h, w)
        t0 = time.perf_counter()
        feat = model.features(im)
        r = F.relu(model.rpn(feat))
        cls = model.rpn_cls(r)
        box = model.rpn_box(r)
        # (1, 2A, H, W) -> per-anchor fg prob, row-major (H, W, A)
        prob = torch.softmax(cls.view(1, 2, 9, fh, fw), dim=1)[0, 1]
        scores = prob.permute(1, 2, 0).reshape(-1).numpy()
        deltas = box[0].view(9, 4, fh, fw).permute(2, 3, 0, 1).reshape(-1, 4).numpy()
        boxes = decode(anchors, deltas)
        np.clip(boxes[:, 0::2], 0, w - 1, out=boxes[:, 0::2])
        np.clip(boxes[:, 1::2], 0, h - 1, out=boxes[:, 1::2])
        order = np.argsort(-scores)[:6000]
        dets = np.concatenate([boxes[order], scores[order, None]],
                              axis=1).astype(np.float32)
        keep = nms_np(dets, 0.7)[:300]
        rois = torch.from_numpy(dets[keep, :4])
        pooled = roi_align_torch(feat, rois)
        fc = model.tail(pooled)
        probs = torch.softmax(model.cls_score(fc), dim=1).numpy()
        bpred = model.bbox_pred(fc).numpy()
        # per-class NMS @ 0.3
        for j in range(1, 21):
            cdets = np.concatenate(
                [decode(rois.numpy(), bpred[:, 4 * j:4 * j + 4] * [0.1, 0.1, 0.2, 0.2]),
                 probs[:, j:j + 1]], axis=1).astype(np.float32)
            cdets = cdets[cdets[:, 4] > 0.05]
            if len(cdets):
                nms_np(cdets, 0.3)
        dt = time.perf_counter() - t0
        if i > 0:  # skip warmup
            times.append(dt)
        print(f"image {i}: {dt:.2f}s", file=sys.stderr)
    ips = 1.0 / float(np.mean(times))
    print(json.dumps({"torch_cpu_images_per_sec": round(ips, 4),
                      "config": "resnet50-c4 800x1216 batch1",
                      "n_images": n_images,
                      "sec_per_image": round(float(np.mean(times)), 3)}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
