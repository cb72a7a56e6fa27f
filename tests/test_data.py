"""Data pipeline: synthetic VOC devkit, loader, evaluators."""

import dataclasses
import json
import os
import os.path as osp

import numpy as np
import pytest

from frcnn_tpu.config import default_config


from tests.conftest import make_voc as _make_voc_shared


def _make_voc(voc_root, split="test"):
    return _make_voc_shared(voc_root, split)


def test_voc_loading(voc_root):
    ds, gt = _make_voc(voc_root)
    assert ds.num_classes == 21
    assert ds.num_images == 6
    roidb = ds.roidb
    # difficult box of image 0 is skipped; coords are 0-based
    name0 = ds.image_index[0]
    non_diff = [b for b in gt[name0] if not b[5]]
    assert roidb[0]["boxes"].shape[0] == len(non_diff)
    for (cls, x1, y1, x2, y2, _), row, c in zip(
            non_diff, roidb[0]["boxes"], roidb[0]["gt_classes"]):
        assert list(row) == [x1, y1, x2, y2]
        assert ds.classes[c] == cls


def test_voc_flip_augmentation(voc_root):
    ds, _ = _make_voc(voc_root, split="trainval")
    from frcnn_tpu.data.roidb import prepare_roidb

    n = ds.num_images
    _ = ds.roidb
    prepare_roidb(ds)
    ds.append_flipped_images()
    assert len(ds.roidb) == 2 * n
    for i in range(n):
        w = ds.roidb[i]["width"]
        orig = ds.roidb[i]["boxes"]
        flip = ds.roidb[i + n]["boxes"]
        np.testing.assert_array_equal(flip[:, 0], w - orig[:, 2] - 1)
        np.testing.assert_array_equal(flip[:, 2], w - orig[:, 0] - 1)
        assert ds.roidb[i + n]["flipped"]


def test_voc_eval_perfect_detections(voc_root, tmp_path):
    """Feeding the ground truth back as detections → mAP exactly 1."""
    ds, gt = _make_voc(voc_root)
    ds.competition_mode(True)
    all_boxes = [[np.zeros((0, 5), np.float32) for _ in range(ds.num_images)]
                 for _ in range(ds.num_classes)]
    for i in range(ds.num_images):
        entry = ds.roidb[i]
        for box, cls in zip(entry["boxes"], entry["gt_classes"]):
            det = np.array([[box[0], box[1], box[2], box[3], 0.9]], np.float32)
            all_boxes[cls][i] = np.vstack([all_boxes[cls][i], det])
    results = ds.evaluate_detections(all_boxes, str(tmp_path))
    present = {c for e in ds.roidb for c in e["gt_classes"]}
    for ci in present:
        assert results[ds.classes[ci]] > 0.99
    assert results["mAP"] > 0.0  # absent classes score 0, mAP still positive


def test_voc_eval_misses_lower_ap(voc_root, tmp_path):
    ds, _ = _make_voc(voc_root)
    ds.competition_mode(True)
    # detect only the first gt box of each image → recall < 1 for some class
    all_boxes = [[np.zeros((0, 5), np.float32) for _ in range(ds.num_images)]
                 for _ in range(ds.num_classes)]
    total = dict()
    for i in range(ds.num_images):
        entry = ds.roidb[i]
        for k, (box, cls) in enumerate(zip(entry["boxes"], entry["gt_classes"])):
            total[cls] = total.get(cls, 0) + 1
            if k == 0:
                det = np.array([[box[0], box[1], box[2], box[3], 0.9]], np.float32)
                all_boxes[cls][i] = np.vstack([all_boxes[cls][i], det])
    results = ds.evaluate_detections(all_boxes, str(tmp_path))
    assert 0.0 < results["mAP"] <= 1.0


def test_minibatch_shapes(voc_root):
    from frcnn_tpu.data.loader import RoIDataLayer
    from frcnn_tpu.data.roidb import prepare_roidb

    ds, _ = _make_voc(voc_root, split="trainval")
    _ = ds.roidb
    prepare_roidb(ds)
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, TPU=dataclasses.replace(cfg.TPU, BUCKETS=((256, 320), (320, 448)),
                                     MAX_GT=8),
        TRAIN=dataclasses.replace(cfg.TRAIN, SCALES=(200,), MAX_SIZE=400,
                                  IMS_PER_BATCH=2))
    layer = RoIDataLayer(ds.roidb, cfg)
    blobs = layer.forward()
    b, h, w, c = blobs["data"].shape
    assert b == 2 and c == 3 and (h, w) in cfg.TPU.BUCKETS
    assert blobs["gt_boxes"].shape == (2, 8, 4)
    assert blobs["im_info"].shape == (2, 3)
    # scaled gt stays inside the scaled image (an image whose boxes are all
    # difficult legitimately has no valid gt)
    assert blobs["gt_valid"].any()
    for i in range(2):
        ih, iw, s = blobs["im_info"][i]
        gtv = blobs["gt_valid"][i]
        gb = blobs["gt_boxes"][i][gtv]
        assert (gb[:, 2] <= iw + 1).all() and (gb[:, 3] <= ih + 1).all()
        assert (blobs["gt_labels"][i][gtv] > 0).all()


def test_data_layer_state_roundtrip(voc_root):
    from frcnn_tpu.data.loader import RoIDataLayer
    from frcnn_tpu.data.roidb import prepare_roidb

    ds, _ = _make_voc(voc_root, split="trainval")
    _ = ds.roidb
    prepare_roidb(ds)
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, TPU=dataclasses.replace(cfg.TPU, BUCKETS=((256, 320), (320, 448))),
        TRAIN=dataclasses.replace(cfg.TRAIN, SCALES=(200,), MAX_SIZE=400))
    layer = RoIDataLayer(ds.roidb, cfg)
    layer.forward()
    state = layer.get_state()
    a = layer.forward()
    layer2 = RoIDataLayer(ds.roidb, cfg)
    layer2.set_state(state)
    b = layer2.forward()
    np.testing.assert_array_equal(a["data"], b["data"])
    np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])


def test_coco_eval_perfect():
    from frcnn_tpu.data.coco_eval import COCOEval

    rng = np.random.RandomState(1)
    cats = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    gts, dts = [], []
    aid = 1
    for img in range(4):
        for _ in range(3):
            x, y = rng.uniform(0, 200, 2)
            w, h = rng.uniform(20, 80, 2)
            cat = int(rng.randint(1, 3))
            gts.append({"id": aid, "image_id": img, "category_id": cat,
                        "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0})
            dts.append({"image_id": img, "category_id": cat,
                        "bbox": [x, y, w, h], "score": 0.9})
            aid += 1
    ev = COCOEval(gts, dts, cats)
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize(verbose=False)
    assert stats["AP"] > 0.99 and stats["AP50"] > 0.99 and stats["AR100"] > 0.99


def test_coco_eval_half_detections():
    from frcnn_tpu.data.coco_eval import COCOEval

    cats = [{"id": 1, "name": "a"}]
    gts, dts = [], []
    for img in range(10):
        gts.append({"id": img + 1, "image_id": img, "category_id": 1,
                    "bbox": [10, 10, 50, 50], "area": 2500, "iscrowd": 0})
        if img < 5:  # only half detected, perfectly
            dts.append({"image_id": img, "category_id": 1,
                        "bbox": [10, 10, 50, 50], "score": 0.9})
    ev = COCOEval(gts, dts, cats)
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize(verbose=False)
    assert abs(stats["AP"] - 0.5) < 0.02
    assert abs(stats["AR100"] - 0.5) < 0.02


def test_coco_eval_crowd_ignore():
    from frcnn_tpu.data.coco_eval import COCOEval

    cats = [{"id": 1, "name": "a"}]
    # one real gt + one crowd region; a det inside the crowd must not be FP
    gts = [
        {"id": 1, "image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40],
         "area": 1600, "iscrowd": 0},
        {"id": 2, "image_id": 0, "category_id": 1, "bbox": [100, 100, 80, 80],
         "area": 6400, "iscrowd": 1},
    ]
    dts = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40], "score": 0.9},
        {"image_id": 0, "category_id": 1, "bbox": [110, 110, 30, 30], "score": 0.8},
    ]
    ev = COCOEval(gts, dts, cats)
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize(verbose=False)
    assert stats["AP"] > 0.99  # crowd-matched det ignored, not a false positive


# ---------------------------------------------------------------------------
# bucket selection (portrait handling + mixed-orientation batches)
# ---------------------------------------------------------------------------


def test_portrait_and_landscape_keep_full_scale():
    """Reference prep_im_for_blob scales shorter side to 600 regardless of
    orientation (lib/utils/blob.py:~L20-L40); with the default two-orientation
    BUCKETS neither a 500x375 nor a 375x500 image may silently shrink."""
    from frcnn_tpu.data.loader import pick_scale_and_bucket

    cfg = default_config()
    for h, w in ((375, 500), (500, 375)):
        scale, bucket = pick_scale_and_bucket(
            h, w, cfg.TRAIN.SCALES[0], cfg.TRAIN.MAX_SIZE, cfg.TPU.BUCKETS)
        assert abs(min(h, w) * scale - 600) < 1.0, (h, w, scale)
        assert bucket in cfg.TPU.BUCKETS
        # the chosen bucket matches the image orientation
        assert (bucket[0] >= bucket[1]) == (h >= w)


def test_snap_to_bucket():
    from frcnn_tpu.data.loader import snap_to_bucket

    buckets = ((608, 1024), (1024, 608))
    assert snap_to_bucket([(608, 1024)], buckets) == (608, 1024)
    assert snap_to_bucket([(1024, 608)], buckets) == (1024, 608)
    assert snap_to_bucket([(300, 500), (400, 200)], buckets) == (608, 1024)
    # mixed orientations: no single bucket covers -> union bucket
    assert snap_to_bucket([(608, 1024), (1024, 608)], buckets) == (1024, 1024)


def test_minibatch_mixed_orientation(tmp_path):
    """A batch mixing portrait and landscape images must stack (round-1 bug:
    lexicographic-max bucket -> np broadcast error)."""
    import cv2
    from frcnn_tpu.data.loader import get_minibatch

    paths = []
    for name, (h, w) in (("land", (240, 400)), ("port", (400, 240))):
        p = str(tmp_path / f"{name}.jpg")
        cv2.imwrite(p, np.random.RandomState(0).randint(
            0, 255, (h, w, 3), np.uint8))
        paths.append(p)
    roidb = [{"image": p, "boxes": np.array([[10, 10, 60, 60]], np.float32),
              "gt_classes": np.array([1]), "flipped": False} for p in paths]
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, TPU=dataclasses.replace(cfg.TPU, BUCKETS=((256, 448), (448, 256)),
                                     MAX_GT=4),
        TRAIN=dataclasses.replace(cfg.TRAIN, SCALES=(240,), MAX_SIZE=420,
                                  IMS_PER_BATCH=2))
    blobs = get_minibatch(roidb, cfg)
    assert blobs["data"].shape == (2, 448, 448, 3)  # union bucket
    # both images keep their full resize scale (no shrink-to-fit)
    assert np.allclose(blobs["im_info"][:, 2], 1.0)

def test_decoded_image_cache(voc_root, tmp_path):
    """Cache-backed batches must be bit-identical to cv2.imread batches
    (including flipped entries), and the cache must reload from disk."""
    from frcnn_tpu.data.cache import DecodedImageCache
    from frcnn_tpu.data.loader import RoIDataLayer
    from frcnn_tpu.data.roidb import prepare_roidb

    ds, _ = _make_voc(voc_root, split="trainval")
    _ = ds.roidb
    prepare_roidb(ds)
    ds.append_flipped_images()  # flip path reads through the cache view
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, TPU=dataclasses.replace(cfg.TPU, BUCKETS=((256, 320), (320, 448))),
        TRAIN=dataclasses.replace(cfg.TRAIN, SCALES=(200,), MAX_SIZE=400))

    prefix = str(tmp_path / "cache" / "image_cache")
    cache = DecodedImageCache.build([r["image"] for r in ds.roidb], prefix,
                                    verbose=False)
    # cache-backed batches use the python path; compare against it (the
    # native C++ path differs by <=1e-4 — covered by its own parity test)
    cfg = dataclasses.replace(
        cfg, TRAIN=dataclasses.replace(cfg.TRAIN, NATIVE_PREP=False))
    plain = RoIDataLayer(ds.roidb, cfg)
    cached = RoIDataLayer(ds.roidb, cfg, reader=cache.reader)
    for _ in range(4):  # cycles through flipped entries too
        a, b = plain.forward(), cached.forward()
        np.testing.assert_array_equal(a["data"], b["data"])
        np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])

    # reopen from disk; build() on an existing complete cache must reuse it
    reopened = DecodedImageCache.open(prefix)
    p0 = ds.roidb[0]["image"]
    np.testing.assert_array_equal(cache.reader(p0), reopened.reader(p0))
    again = DecodedImageCache.build([p0], prefix, verbose=False)
    assert p0 in again

def test_resized_image_cache(voc_root, tmp_path):
    """Resized-cache batches must match the python decode path within uint8
    rounding (the cache resizes uint8 where the python path resizes f32, and
    flipped entries flip the *resized* view — bilinear resize and horizontal
    flip commute up to cv2 fixed-point LSBs).  Scales, im_info and gt boxes
    must be identical; data dtype is uint8 (cast is in-graph)."""
    from frcnn_tpu.data.cache import ResizedImageCache
    from frcnn_tpu.data.loader import RoIDataLayer
    from frcnn_tpu.data.roidb import prepare_roidb

    ds, _ = _make_voc(voc_root, split="trainval")
    _ = ds.roidb
    prepare_roidb(ds)
    ds.append_flipped_images()
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, TPU=dataclasses.replace(cfg.TPU, BUCKETS=((256, 320), (320, 448))),
        TRAIN=dataclasses.replace(cfg.TRAIN, SCALES=(200,), MAX_SIZE=400,
                                  NATIVE_PREP=False))

    prefix = str(tmp_path / "cache" / "resized_cache")
    cache = ResizedImageCache.build(
        [r["image"] for r in ds.roidb], prefix, targets=cfg.TRAIN.SCALES,
        max_size=cfg.TRAIN.MAX_SIZE, buckets=cfg.TPU.BUCKETS, verbose=False)
    plain = RoIDataLayer(ds.roidb, cfg)
    cached = RoIDataLayer(ds.roidb, cfg, reader=cache)
    for _ in range(4):  # cycles through flipped entries too
        a, b = plain.forward(), cached.forward()
        assert b["data"].dtype == np.uint8
        assert a["data"].shape == b["data"].shape
        np.testing.assert_allclose(a["data"], b["data"].astype(np.float32),
                                   atol=2.0)
        np.testing.assert_array_equal(a["im_info"], b["im_info"])
        np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])

    # reuse an up-to-date cache; rebuild (= miss at get) under changed config
    again = ResizedImageCache.build(
        [ds.roidb[0]["image"]], prefix, targets=cfg.TRAIN.SCALES,
        max_size=cfg.TRAIN.MAX_SIZE, buckets=cfg.TPU.BUCKETS, verbose=False)
    assert again.get(ds.roidb[0]["image"], cfg.TRAIN.SCALES[0],
                     cfg.TRAIN.MAX_SIZE, cfg.TPU.BUCKETS) is not None
    # a different MAX_SIZE changes the resize scale → get must refuse
    # (150 < target 200 always caps the scale on these images)
    assert ResizedImageCache.open(prefix).get(
        ds.roidb[0]["image"], cfg.TRAIN.SCALES[0], 150,
        cfg.TPU.BUCKETS) is None

def test_orientation_homogeneous_batches():
    """With multi-image batches and both bucket orientations, every full
    batch must be orientation-pure (else it would snap to the oversized
    union bucket); partial tail groups sit at the end of the permutation."""
    from frcnn_tpu.data.loader import RoIDataLayer

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, TRAIN=dataclasses.replace(cfg.TRAIN, IMS_PER_BATCH=4))
    assert len(cfg.TPU.BUCKETS) > 1  # both orientations configured
    rng = np.random.RandomState(0)
    roidb = []
    for i in range(37):
        h, w = (480, 640) if rng.rand() < 0.6 else (640, 480)
        roidb.append({"width": w, "height": h, "image": f"im{i}.jpg"})
    layer = RoIDataLayer(roidb, cfg)
    horz = np.array([r["width"] >= r["height"] for r in roidb])
    n_full = len(roidb) // 4
    perm = layer._perm
    seen = set()
    n_pure = 0
    for bi in range(n_full):
        batch = perm[bi * 4:(bi + 1) * 4]
        seen.update(batch.tolist())
        if len(set(horz[batch])) == 1:
            n_pure += 1
    # every batch made only of full groups is pure; at most 2 partial
    # groups can form one mixed boundary batch
    assert n_pure >= n_full - 1
    assert len(set(perm.tolist())) == len(roidb)  # permutation intact


def test_bucket_fallback_keeps_orientation():
    """When no bucket fits, pick the bucket losing the least resolution —
    a portrait image must fall back to the portrait bucket, not shrink
    ~2x into the landscape one."""
    from frcnn_tpu.data.loader import pick_scale_and_bucket

    buckets = ((608, 1024), (1024, 608))
    # portrait 1100x660 after scaling (COCO-style 800/1333 resize)
    scale, bucket = pick_scale_and_bucket(1100, 660, 800, 1333, buckets)
    assert bucket == (1024, 608)
    assert scale > 0.55  # old largest-area fallback gave ~0.55x

def test_native_prep_parity(voc_root):
    """The C++ threaded prep worker must match the python cv2 path within
    float rounding (<=1e-4 rel: the cv2 wheel bundles its own OpenCV whose
    INTER_LINEAR tables differ slightly from the system build), including
    flipped entries and mixed per-image buckets; im_info and gt are exact.
    Skips when the native lib can't build (no OpenCV dev files)."""
    from frcnn_tpu.native import data_prep
    from frcnn_tpu.data.loader import RoIDataLayer
    from frcnn_tpu.data.roidb import prepare_roidb

    if not data_prep.have_native():
        pytest.skip("native data_prep unavailable")
    ds, _ = _make_voc(voc_root, split="trainval")
    _ = ds.roidb
    prepare_roidb(ds)
    ds.append_flipped_images()
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, TPU=dataclasses.replace(cfg.TPU, BUCKETS=((256, 320), (320, 448))),
        TRAIN=dataclasses.replace(cfg.TRAIN, SCALES=(200,), MAX_SIZE=400,
                                  IMS_PER_BATCH=2))
    cfg_py = dataclasses.replace(
        cfg, TRAIN=dataclasses.replace(cfg.TRAIN, NATIVE_PREP=False))
    nat = RoIDataLayer(ds.roidb, cfg)
    py = RoIDataLayer(ds.roidb, cfg_py)
    for _ in range(4):  # covers flipped entries across the epoch
        a, b = nat.forward(), py.forward()
        assert a["data"].shape == b["data"].shape
        np.testing.assert_allclose(a["data"], b["data"], rtol=1e-4, atol=0.05)
        np.testing.assert_array_equal(a["im_info"], b["im_info"])
        np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])
