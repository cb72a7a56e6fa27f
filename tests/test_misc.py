"""Coverage for remaining components: batched NMS, COCO dataset, config
layers, recall evaluation, visualization, summaries, ds_utils."""

import dataclasses
import json
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.config import default_config, cfg_from_file
from tests.conftest import random_boxes


# -- batched NMS --------------------------------------------------------------

def _clustered_sorted(rng, n):
    centers = random_boxes(rng, max(n // 20, 2))
    boxes = centers[rng.randint(0, len(centers), n)] + \
        rng.randn(n, 4).astype(np.float32) * 8
    boxes[:, 2] = np.maximum(boxes[:, 2], boxes[:, 0] + 1)
    boxes[:, 3] = np.maximum(boxes[:, 3], boxes[:, 1] + 1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes[np.argsort(-scores)]


def test_nms_batched_kernel_matches_reference(rng):
    from frcnn_tpu.ops.nms import nms_mask
    from frcnn_tpu.ops.pallas.nms_kernel import nms_mask_pallas_batched

    interpret = jax.default_backend() != "tpu"
    b, n = 3, 256
    boxes = np.stack([_clustered_sorted(rng, n) for _ in range(b)])
    valid = np.ones((b, n), bool)
    valid[1, 200:] = False
    got = np.asarray(nms_mask_pallas_batched(
        jnp.asarray(boxes), 0.5, jnp.asarray(valid), interpret=interpret))
    for i in range(b):
        ref = np.asarray(nms_mask(jnp.asarray(boxes[i]), 0.5,
                                  jnp.asarray(valid[i])))
        np.testing.assert_array_equal(got[i], ref)


def test_nms_batched_kernel_capped_prefix_exact(rng):
    """The early-exit cap (max_keep) must leave the first max_keep kept
    entries per problem bit-identical to uncapped greedy — the contract
    nms_fixed_batched relies on to skip tiles once every problem is
    settled.  Three regimes: b=8 (no padding → the block can actually go
    'done' mid-grid), b=2 (B-padding rows must count as settled, not stall
    the exit), and sparse validity (problems with fewer than cap valid
    boxes settle by exhaustion, not by count)."""
    from frcnn_tpu.ops.nms import nms_mask
    from frcnn_tpu.ops.pallas.nms_kernel import nms_mask_pallas_batched

    interpret = jax.default_backend() != "tpu"
    n, cap = 512, 20
    for b, sparse in ((8, False), (2, False), (8, True)):
        boxes = np.stack([_clustered_sorted(rng, n) for _ in range(b)])
        valid = np.ones((b, n), bool)
        if sparse:
            valid[0, 10:] = False   # settles by exhaustion (10 < cap)
            valid[3, 300:] = False
        got = np.asarray(nms_mask_pallas_batched(
            jnp.asarray(boxes), 0.5, valid=jnp.asarray(valid),
            interpret=interpret, max_keep=cap))
        for i in range(b):
            ref = np.asarray(nms_mask(jnp.asarray(boxes[i]), 0.5,
                                      valid=jnp.asarray(valid[i])))
            if not (sparse and i == 0):
                assert ref.sum() > cap  # cap binds except by construction
            np.testing.assert_array_equal(np.where(got[i])[0][:cap],
                                          np.where(ref)[0][:cap])


def test_nms_fixed_batched_matches_unbatched(rng):
    from frcnn_tpu.ops.nms import nms_fixed, nms_fixed_batched

    b, n = 4, 200
    boxes = np.stack([_clustered_sorted(rng, n) for _ in range(b)])
    scores = rng.uniform(0, 1, (b, n)).astype(np.float32)
    bi, bv = nms_fixed_batched(jnp.asarray(boxes), jnp.asarray(scores), 0.4,
                               32, use_pallas=False)
    for i in range(b):
        si, sv = nms_fixed(jnp.asarray(boxes[i]), jnp.asarray(scores[i]), 0.4,
                           32, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(bv[i]), np.asarray(sv))
        np.testing.assert_array_equal(np.asarray(bi[i])[np.asarray(bv[i])],
                                      np.asarray(si)[np.asarray(sv)])


# -- COCO dataset --------------------------------------------------------------

@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("coco_data")
    d = root / "coco"
    (d / "annotations").mkdir(parents=True)
    (d / "images" / "val2014").mkdir(parents=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for img_id in range(4):
        h, w = 200, 300
        fname = f"COCO_val2014_{img_id:012d}.jpg"
        cv2.imwrite(str(d / "images" / "val2014" / fname),
                    rng.randint(0, 255, (h, w, 3), np.uint8))
        images.append({"id": img_id, "file_name": fname, "width": w, "height": h})
        for _ in range(2):
            x, y = rng.randint(0, 150), rng.randint(0, 100)
            bw, bh = rng.randint(30, 80), rng.randint(30, 80)
            annotations.append({
                "id": aid, "image_id": img_id,
                "category_id": int(rng.choice([1, 3])),
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0})
            aid += 1
    dataset = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}, {"id": 3, "name": "car"}],
    }
    with open(d / "annotations" / "instances_minival2014.json", "w") as f:
        json.dump(dataset, f)
    return str(root)


def test_coco_dataset_loading(coco_root):
    from frcnn_tpu.data.coco import coco

    ds = coco("minival", "2014", data_path=osp.join(coco_root, "coco"))
    ds.cache_path  # property exists
    type(ds).cache_path = property(lambda self: coco_root)
    assert ds.num_classes == 3  # bg + person + car
    assert ds.num_images == 4
    roidb = ds.gt_roidb()
    assert len(roidb) == 4
    e = roidb[0]
    assert e["boxes"].shape[1] == 4 and (e["gt_classes"] > 0).all()
    assert e["width"] == 300 and e["height"] == 200
    assert osp.exists(ds.image_path_at(0))


def test_coco_evaluate_perfect(coco_root, tmp_path):
    from frcnn_tpu.data.coco import coco

    ds = coco("minival", "2014", data_path=osp.join(coco_root, "coco"))
    type(ds).cache_path = property(lambda self: str(tmp_path))
    roidb = ds.gt_roidb()
    all_boxes = [[np.zeros((0, 5), np.float32) for _ in range(ds.num_images)]
                 for _ in range(ds.num_classes)]
    for i, e in enumerate(roidb):
        for box, cls in zip(e["boxes"], e["gt_classes"]):
            det = np.array([[box[0], box[1], box[2], box[3], 0.95]], np.float32)
            all_boxes[cls][i] = np.vstack([all_boxes[cls][i], det])
    stats = ds.evaluate_detections(all_boxes, str(tmp_path))
    assert stats["AP"] > 0.95 and stats["AP50"] > 0.95


# -- config layering -----------------------------------------------------------

def test_cfg_from_file_experiment_yaml():
    cfg = cfg_from_file(default_config(), "experiments/cfgs/res101-lg.yml")
    assert cfg.EXP_DIR == "res101-lg"
    assert cfg.TRAIN.SCALES == (800,)
    assert cfg.TEST.MAX_SIZE == 1333
    assert cfg.TPU.BUCKETS == ((800, 1344),)
    assert cfg.POOLING_MODE == "align"


def test_cfg_hashable_and_static():
    cfg = default_config()
    assert hash(cfg) == hash(default_config())
    d = {cfg: 1}
    assert d[default_config()] == 1


# -- recall eval / utils --------------------------------------------------------

def test_evaluate_recall(voc_root):
    from tests.conftest import make_voc

    ds, _ = make_voc(voc_root, split="test")
    _ = ds.roidb
    # perfect candidates = the gt boxes themselves
    cands = [e["boxes"].astype(np.float32) for e in ds.roidb]
    out = ds.evaluate_recall(candidate_boxes=cands)
    assert out["ar"] > 0.99
    assert (out["recalls"] > 0.99).all()


def test_draw_bounding_boxes():
    from frcnn_tpu.utils.visualization import draw_bounding_boxes

    im = np.zeros((60, 80, 3), np.uint8)
    out = draw_bounding_boxes(im, np.array([[5, 5, 40, 40], [10, 20, 70, 50]]),
                              labels=[1, 2], scores=[0.9, 0.5],
                              class_names=["bg", "dog", "cat"])
    assert out.shape == im.shape
    assert out.sum() > 0  # something was drawn


@pytest.mark.slow
def test_summary_writer(tmp_path):
    from frcnn_tpu.utils.summary import SummaryWriter

    w = SummaryWriter(str(tmp_path))
    w.scalars({"loss": 1.5, "lr": 0.01}, step=1)
    w.scalar("loss", 1.2, step=2)
    w.image("gt", np.zeros((32, 32, 3), np.uint8), step=1)
    w.close()
    lines = [json.loads(line) for line in open(tmp_path / "events.jsonl")]
    assert lines[0]["loss"] == 1.5 and lines[1]["loss"] == 1.2


def test_ds_utils(rng):
    from frcnn_tpu.data import ds_utils

    boxes = np.array([[1, 2, 10, 12], [1, 2, 10, 12], [3, 4, 8, 9]], float)
    uniq = ds_utils.unique_boxes(boxes)
    assert len(uniq) == 2
    xywh = ds_utils.xyxy_to_xywh(boxes)
    back = ds_utils.xywh_to_xyxy(xywh)
    np.testing.assert_array_equal(back, boxes)
    keep = ds_utils.filter_small_boxes(boxes, min_size=6)
    assert list(keep) == [0, 1]
    ds_utils.validate_boxes(boxes, width=20, height=20)
    with pytest.raises(AssertionError):
        ds_utils.validate_boxes(np.array([[5, 5, 3, 8]], float), 20, 20)

def test_cli_accepts_all_model_variants(monkeypatch):
    """Every build_model name — including the FPN variants — must be reachable
    from the three CLIs' --net flag (regression: FPN nets existed in the
    factory but the argparse choices lists didn't offer them)."""
    import importlib

    nets = ["vgg16", "res50", "res101", "res152", "mobile",
            "res50_fpn", "res101_fpn", "res50_fpn_gn", "res101_fpn_gn"]
    for mod_name, extra in (("tools.trainval_net", []),
                            ("tools.test_net", ["--model", "x.ckpt"]),
                            ("tools.demo",
                             ["--model", "x.ckpt", "--images", "a.jpg"])):
        mod = importlib.import_module(mod_name)
        for net in nets:
            monkeypatch.setattr("sys.argv", [mod_name, "--net", net] + extra)
            assert mod.parse_args().net == net
