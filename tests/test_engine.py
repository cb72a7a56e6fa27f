"""End-to-end engine tests: smoke-train on synthetic VOC, snapshot/resume,
test_net → detections.pkl → mAP (SURVEY.md §7 steps 4/8)."""

import dataclasses
import os.path as osp
import pickle

import numpy as np
import jax
import pytest

from frcnn_tpu.config import default_config
from tests.conftest import make_voc


def tiny_cfg(root):
    cfg = default_config()
    return dataclasses.replace(
        cfg,
        DATA_DIR=root,
        # quarter-width MobileNet: these are engine-contract tests (snapshot
        # files, resume, detections.pkl, eval plumbing), not quality tests
        MOBILENET=dataclasses.replace(cfg.MOBILENET, DEPTH_MULTIPLIER=0.25),
        TRAIN=dataclasses.replace(
            cfg.TRAIN, SCALES=(160,), MAX_SIZE=320, IMS_PER_BATCH=2,
            BATCH_SIZE=32, RPN_BATCHSIZE=64, RPN_PRE_NMS_TOP_N=512,
            RPN_POST_NMS_TOP_N=64, SNAPSHOT_ITERS=4, DISPLAY=2,
            STEPSIZE=(6,), LEARNING_RATE=0.01, SNAPSHOT_KEPT=2,
            USE_FLIPPED=False, SUMMARY_INTERVAL=0),
        TEST=dataclasses.replace(
            cfg.TEST, SCALES=(160,), MAX_SIZE=320, RPN_PRE_NMS_TOP_N=256,
            RPN_POST_NMS_TOP_N=32, MAX_PER_IMAGE=10, SCORE_THRESH=0.01),
        TPU=dataclasses.replace(cfg.TPU, BUCKETS=((160, 256),), MAX_GT=8),
        ANCHOR_SCALES=(2.0, 4.0),
        ANCHOR_RATIOS=(0.5, 1.0, 2.0),
    )


@pytest.fixture(scope="module")
def trained(voc_root, tmp_path_factory):
    """Train 8 iters on the synthetic VOC; shared by the tests below."""
    from frcnn_tpu.engine.train import train_net, get_training_roidb
    from frcnn_tpu.models import build_model

    root, _ = voc_root
    cfg = tiny_cfg(root)
    ds, _ = make_voc(voc_root, split="trainval")
    ds.set_proposal_method("gt")
    roidb = get_training_roidb(ds, cfg)
    out_dir = str(tmp_path_factory.mktemp("train_out"))
    model = build_model("mobile", ds.num_classes, cfg)
    state = train_net(model, ds, roidb, None, out_dir,
                      tb_dir=osp.join(out_dir, "tb"), cfg=cfg, max_iters=8)
    return model, state, out_dir, cfg


@pytest.mark.slow
def test_training_reduces_loss(trained, voc_root):
    _, _, out_dir, _ = trained
    lines = [eval(line.replace("true", "True")) for line in
             open(osp.join(out_dir, "train_log.jsonl"))]
    assert len(lines) >= 2
    # loss moves (training is happening); with 8 iters demand no blow-up
    assert lines[-1]["total_loss"] < lines[0]["total_loss"] * 2
    assert np.isfinite(lines[-1]["total_loss"])


@pytest.mark.slow
def test_snapshot_files_and_pruning(trained):
    _, _, out_dir, cfg = trained
    import glob

    pkls = glob.glob(osp.join(out_dir, "*_iter_*.pkl"))
    ckpts = glob.glob(osp.join(out_dir, "*_iter_*.ckpt"))
    assert len(pkls) == 2 and len(ckpts) == 2  # iters 4 and 8, KEPT=2
    with open(sorted(pkls)[-1], "rb") as f:
        meta = pickle.load(f)
    assert meta["iter"] == 8
    assert "layer_state" in meta and "np_rng" in meta


@pytest.mark.slow
def test_resume_continues_from_snapshot(trained, voc_root, tmp_path):
    """find_previous + from_snapshot: training resumes at the saved iter and
    the restored params equal the snapshot exactly."""
    from frcnn_tpu.engine.train import SolverWrapper
    from frcnn_tpu.engine.checkpoint import load_params
    from frcnn_tpu.models import build_model
    from frcnn_tpu.data.loader import RoIDataLayer

    model, state, out_dir, cfg = trained
    ds, _ = make_voc(voc_root, split="trainval")
    ds.set_proposal_method("gt")
    from frcnn_tpu.engine.train import get_training_roidb

    roidb = get_training_roidb(ds, cfg)
    sw = SolverWrapper(model, ds, roidb, None, out_dir, cfg=cfg)
    sw.data_layer = RoIDataLayer(roidb, cfg)
    sw.data_layer_val = None
    sw.construct_graph()
    prev = sw.find_previous()
    assert prev and prev.endswith("_iter_8.pkl")
    start = sw.from_snapshot(prev)
    assert start == 8
    final = jax.tree.leaves(state["params"])
    restored = jax.tree.leaves(sw.state["params"])
    for a, b in zip(final, restored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_test_net_end_to_end(trained, voc_root, tmp_path):
    """Full evaluation pipeline: batched jitted detect → detections.pkl →
    VOC mAP table (numbers are meaningless after 8 iters; the contract is
    shape/flow)."""
    from frcnn_tpu.engine.test import test_net

    model, state, _, cfg = trained
    ds, _ = make_voc(voc_root, split="test")
    ds.competition_mode(True)
    out = str(tmp_path)
    results = test_net(model, {"params": state["params"]}, ds, cfg, out,
                       max_per_image=10, batch=2, verbose=False)
    assert "mAP" in results and 0.0 <= results["mAP"] <= 1.0
    det_file = osp.join(out, "detections.pkl")
    assert osp.exists(det_file)
    with open(det_file, "rb") as f:
        all_boxes = pickle.load(f)
    assert len(all_boxes) == ds.num_classes
    assert len(all_boxes[0]) == ds.num_images


@pytest.mark.slow
def test_reval_from_detections(trained, voc_root, tmp_path):
    """tools/reval path: apply_nms (native C++ host op) over detections.pkl."""
    from frcnn_tpu.engine.test import apply_nms

    model, state, _, cfg = trained
    # synthetic all_boxes with duplicates to suppress
    n_img = 2
    all_boxes = [[np.zeros((0, 5), np.float32) for _ in range(n_img)]
                 for _ in range(3)]
    all_boxes[1][0] = np.array([[10, 10, 50, 50, 0.9],
                                [12, 12, 52, 52, 0.8],
                                [100, 100, 150, 150, 0.7]], np.float32)
    out = apply_nms(all_boxes, 0.3)
    assert len(out[1][0]) == 2  # near-duplicate suppressed


def test_lr_schedule_step_decay():
    from frcnn_tpu.engine.train import make_lr_schedule

    cfg = default_config()
    cfg = dataclasses.replace(cfg, TRAIN=dataclasses.replace(
        cfg.TRAIN, LEARNING_RATE=0.01, STEPSIZE=(10, 20), GAMMA=0.1))
    s = make_lr_schedule(cfg)
    assert float(s(0)) == pytest.approx(0.01)
    assert float(s(10)) == pytest.approx(0.001)
    assert float(s(25)) == pytest.approx(0.0001)


def test_optimizer_masks():
    """Frozen params don't move; biases get 2x lr; weights decay."""
    import jax.numpy as jnp
    from frcnn_tpu.engine.train import make_optimizer
    from frcnn_tpu.models import build_model

    cfg = default_config()
    cfg = dataclasses.replace(cfg, TPU=dataclasses.replace(
        cfg.TPU, BUCKETS=((64, 64),)))
    model = build_model("mobile", 3, cfg)
    images = jnp.zeros((1, 64, 64, 3))
    im_info = jnp.asarray([[64.0, 64.0, 1.0]])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images, im_info)
    params = variables["params"]
    tx, _ = make_optimizer(model, params, cfg)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)

    import jax.tree_util as jtu

    for path, u in jtu.tree_flatten_with_path(updates)[0]:
        names = tuple(getattr(p, "key", str(p)) for p in path)
        if names[0] == "backbone" and model.backbone.frozen_param(names[1:], cfg):
            assert float(jnp.abs(u).max()) == 0.0, names
        elif names[-1] == "bias":
            # 2x lr, no decay: update = -2 * lr * grad(=1)
            expect = 2 * cfg.TRAIN.LEARNING_RATE
            np.testing.assert_allclose(np.asarray(u), -expect, rtol=1e-5)


@pytest.mark.slow
def test_summaries_written(trained):
    """SUMMARY_INTERVAL=0 + tb_dir: scalar summaries and the gt-overlay image
    summary path run during training (reference train_step_with_summary)."""
    import glob

    _, _, out_dir, _ = trained
    tb = osp.join(out_dir, "tb")
    assert osp.isdir(tb)
    events = glob.glob(osp.join(tb, "*.jsonl")) + glob.glob(
        osp.join(tb, "events.out.tfevents.*"))
    assert events, "no summary files written"


def test_gt_overlay_image():
    from frcnn_tpu.engine.train import SolverWrapper

    sw = SolverWrapper.__new__(SolverWrapper)  # only _gt_overlay needed

    class _Imdb:
        classes = ["__background__", "a", "b"]

    sw.imdb = _Imdb()
    blobs = {
        "data": np.full((2, 64, 96, 3), 128.0, np.float32),
        "gt_boxes": np.array([[[10, 10, 50, 40], [0, 0, 0, 0]]], np.float32)
        .repeat(2, axis=0),
        "gt_labels": np.array([[1, 0]]).repeat(2, axis=0),
        "gt_valid": np.array([[True, False]]).repeat(2, axis=0),
    }
    im = sw._gt_overlay(blobs)
    assert im.shape == (64, 96, 3) and im.dtype == np.uint8
    assert (im != 128).any(), "no box drawn"


@pytest.mark.slow
def test_train_with_image_cache(voc_root, tmp_path):
    """TRAIN.IMAGE_CACHE=True: the driver builds the memmap cache and the
    short run stays finite; the cache files land in the output dir."""
    from frcnn_tpu.engine.train import train_net, get_training_roidb
    from frcnn_tpu.models import build_model

    root, _ = voc_root
    cfg = tiny_cfg(root)
    cfg = dataclasses.replace(
        cfg, TRAIN=dataclasses.replace(cfg.TRAIN, IMAGE_CACHE=True))
    ds, _ = make_voc(voc_root, split="trainval")
    ds.set_proposal_method("gt")
    roidb = get_training_roidb(ds, cfg)
    out_dir = str(tmp_path / "train_cache_out")
    model = build_model("mobile", ds.num_classes, cfg)
    train_net(model, ds, roidb, None, out_dir,
              tb_dir=osp.join(out_dir, "tb"), cfg=cfg, max_iters=2)
    # cache lives at the dataset level (shared across experiments)
    assert osp.exists(osp.join(ds.cache_path, f"{ds.name}_resized.dat"))
    lines = [eval(line.replace("true", "True")) for line in
             open(osp.join(out_dir, "train_log.jsonl"))]
    assert np.isfinite(lines[-1]["total_loss"])
