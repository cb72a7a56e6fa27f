"""Evaluation driver.

Rebuild of reference ``lib/model/test.py:~1-250`` (SURVEY.md #4):
``im_detect`` (single image → per-class scores + decoded boxes in original
coords) and ``test_net`` (dataset loop → per-class NMS → capped detections →
detections.pkl → imdb.evaluate_detections).

TPU-native differences: images are batched into fixed-shape buckets and the
entire per-image pipeline — preprocessing, backbone, proposals, RoI head,
delta decode, per-class NMS, global top-k — runs inside ONE jitted call
(``FasterRCNN.detect``); the reference does per-class NMS in a Python loop
on the host.  One compilation per (bucket, batch) shape.
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
from functools import partial

import jax
import numpy as np

from frcnn_tpu.config import Config
from frcnn_tpu.data.loader import prep_im_for_blob
from frcnn_tpu.models.backbones import pack_images
from frcnn_tpu.utils.timer import Timer


def _prep(im, cfg: Config):
    blob, scale = prep_im_for_blob(im, cfg.TEST.SCALES[0], cfg.TEST.MAX_SIZE,
                                   cfg.TPU.BUCKETS)
    h, w = im.shape[:2]
    info = np.array([np.round(h * scale), np.round(w * scale), scale],
                    np.float32)
    return blob, info


def im_detect(model, variables, im, cfg: Config | None = None):
    """Single-image detection (reference im_detect): returns
    (scores (N, C), boxes (N, 4C) in ORIGINAL image coords, valid (N,))."""
    cfg = cfg or model.config
    blob, info = _prep(im, cfg)
    packed = pack_images(blob[None], getattr(model, "input_block", 1))
    out = model.apply(variables, packed, info[None], method="predict")
    boxes = model.apply(variables, out, info[None], method="decode_detections")
    return (np.asarray(out["cls_prob"][0]), np.asarray(boxes[0]),
            np.asarray(out["roi_valid"][0]))


def _prep_stream(imdb, cfg: Config, batch: int):
    """Yield (bucket_hw, [(image_idx, blob, info), ...]) detect-ready groups.

    Fast path: when the dataset's roidb carries stored image sizes, the
    scale/bucket decision (pick_scale_and_bucket) needs no pixels — images
    are grouped by bucket up front and each batch decodes + resizes + pads
    inside the native C++ thread pool (data_prep.cc), releasing the GIL so
    the producer thread truly overlaps the device step.  Fallback: per-image
    cv2 decode (the reference's _get_blobs path, lib/model/test.py:~L40)."""
    import cv2

    from frcnn_tpu.data.loader import pick_scale_and_bucket

    t = cfg.TEST
    buckets = cfg.TPU.BUCKETS
    try:
        entries = imdb.roidb
    except Exception:
        entries = None
    use_native = False
    if (entries is not None and len(entries) >= imdb.num_images
            and all("width" in e and "height" in e
                    for e in entries[:imdb.num_images])):
        from frcnn_tpu.native import data_prep

        use_native = data_prep.have_native()

    if use_native:
        groups: dict = {}
        for i in range(imdb.num_images):
            e = entries[i]
            scale, bkt = pick_scale_and_bucket(
                e["height"], e["width"], t.SCALES[0], t.MAX_SIZE, buckets)
            groups.setdefault(bkt, []).append((i, scale, e["height"], e["width"]))
        for bkt, items in groups.items():
            for s in range(0, len(items), batch):
                part = items[s:s + batch]
                blob, _ = data_prep.prep_batch(
                    [imdb.image_path_at(i) for i, _, _, _ in part],
                    [0] * len(part), [sc for _, sc, _, _ in part], bkt)
                yield bkt, [
                    (i, blob[j], np.array(
                        [np.round(h * sc), np.round(w * sc), sc], np.float32))
                    for j, (i, sc, h, w) in enumerate(part)]
        return

    pending: dict = {}  # bucket (h, w) -> [(image_idx, blob, info), ...]
    for i in range(imdb.num_images):
        im = cv2.imread(imdb.image_path_at(i))
        assert im is not None, imdb.image_path_at(i)
        blob, info = _prep(im, cfg)
        group = pending.setdefault(blob.shape[:2], [])
        group.append((i, blob, info))
        if len(group) == batch:
            yield blob.shape[:2], group
            pending[blob.shape[:2]] = []
    for bucket_hw, group in pending.items():
        if group:
            yield bucket_hw, group


def test_net(model, variables, imdb, cfg: Config | None = None,
             output_dir: str = "output", max_per_image: int = 100,
             batch: int = 8, verbose: bool = True):
    """Dataset evaluation (reference test_net): returns the eval results dict
    (per-class AP + mAP for VOC; COCO stats for COCO)."""
    cfg = cfg or model.config
    num_images = imdb.num_images
    all_boxes = [[np.zeros((0, 5), np.float32) for _ in range(num_images)]
                 for _ in range(imdb.num_classes)]

    detect = jax.jit(partial(model.apply, method="detect"),
                     static_argnames=("max_per_image",))

    _t = {"im_detect": Timer(), "misc": Timer()}
    done = [0]

    def flush(bucket_hw, items):
        """Run one fixed-shape detect over `items` [(image_idx, blob, info)].
        Images are grouped by assigned bucket so one batch never mixes
        shapes (multi-bucket configs, e.g. landscape + portrait, would
        otherwise break np.stack); only final partial groups pay for
        zero-image pad slots."""
        pad = batch - len(items)
        blobs = [b for _, b, _ in items] + \
            [np.zeros((*bucket_hw, 3), np.float32)] * pad
        infos = [f for _, _, f in items] + \
            [np.array([1.0, 1.0, 1.0], np.float32)] * pad
        _t["im_detect"].tic()
        packed = pack_images(np.stack(blobs), getattr(model, "input_block", 1))
        dets, valid = detect(variables, packed, np.stack(infos),
                             max_per_image=max_per_image)
        dets, valid = np.asarray(dets), np.asarray(valid)
        detect_time = _t["im_detect"].toc(average=False)

        _t["misc"].tic()
        for bi, (i, _, _) in enumerate(items):
            d = dets[bi][valid[bi]]
            for cls_ind in range(1, imdb.num_classes):
                rows = d[d[:, 5] == cls_ind]
                if len(rows):
                    all_boxes[cls_ind][i] = rows[:, :5].astype(np.float32)
        misc_time = _t["misc"].toc(average=False)
        done[0] += len(items)
        if verbose:
            print(f"im_detect: {done[0]}/{num_images} "
                  f"{detect_time / len(items):.3f}s "
                  f"{misc_time / len(items):.3f}s")

    # Host preprocessing (decode + resize + pad) runs in a producer thread so
    # it overlaps the device's detect step — the reference's test loop
    # (lib/model/test.py:~L190) serializes cv2 decode with the net forward.
    # When the dataset exposes stored image sizes, the scale/bucket choice
    # needs no pixels and whole batches decode in the native C++ thread pool
    # (native/data_prep.cc) off the GIL.
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=4)

    def produce():
        try:
            for item in _prep_stream(imdb, cfg, batch):
                q.put(item)
            q.put(None)
        except BaseException as e:  # re-raised in the consumer
            q.put(e)

    threading.Thread(target=produce, daemon=True).start()
    while True:
        item = q.get()
        if item is None:
            break
        if isinstance(item, BaseException):
            raise item
        flush(*item)

    os.makedirs(output_dir, exist_ok=True)
    det_file = osp.join(output_dir, "detections.pkl")
    with open(det_file, "wb") as f:
        pickle.dump(all_boxes, f, pickle.HIGHEST_PROTOCOL)

    print("Evaluating detections")
    return imdb.evaluate_detections(all_boxes, output_dir)


def apply_nms(all_boxes, thresh: float):
    """Host-side per-class NMS over saved detections (reference apply_nms,
    used by tools/reval.py on detections.pkl)."""
    from frcnn_tpu.native.host_ops import nms_cpu

    num_classes = len(all_boxes)
    num_images = len(all_boxes[0])
    nms_boxes = [[np.zeros((0, 5), np.float32) for _ in range(num_images)]
                 for _ in range(num_classes)]
    for cls_ind in range(num_classes):
        for im_ind in range(num_images):
            dets = all_boxes[cls_ind][im_ind]
            if len(dets) == 0:
                continue
            keep = nms_cpu(dets, thresh)
            nms_boxes[cls_ind][im_ind] = dets[keep, :]
    return nms_boxes
