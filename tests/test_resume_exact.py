"""Bit-exact resume: interrupted training must reproduce uninterrupted
training exactly — same data order (through the prefetch thread's run-ahead),
same numpy RNG, same per-step jax sampling keys (reference .pth/.pkl
snapshot contract, SURVEY.md §3.4)."""

import dataclasses
import os.path as osp

import numpy as np
import pytest
import jax

from frcnn_tpu.config import default_config

pytestmark = pytest.mark.slow
from tests.conftest import make_voc


def _cfg(root, snapshot_iters):
    cfg = default_config()
    return dataclasses.replace(
        cfg,
        DATA_DIR=root,
        TRAIN=dataclasses.replace(
            cfg.TRAIN, SCALES=(160,), MAX_SIZE=320, IMS_PER_BATCH=2,
            BATCH_SIZE=32, RPN_BATCHSIZE=64, RPN_PRE_NMS_TOP_N=256,
            RPN_POST_NMS_TOP_N=32, SNAPSHOT_ITERS=snapshot_iters, DISPLAY=100,
            STEPSIZE=(100,), LEARNING_RATE=0.005, SNAPSHOT_KEPT=5,
            USE_FLIPPED=False),
        TPU=dataclasses.replace(cfg.TPU, BUCKETS=((160, 256),), MAX_GT=8),
        ANCHOR_SCALES=(2.0, 4.0),
        ANCHOR_RATIOS=(0.5, 1.0, 2.0),
    )


def _train(voc_root, out_dir, iters, snapshot_iters):
    from frcnn_tpu.engine.train import train_net, get_training_roidb
    from frcnn_tpu.models import build_model

    root, _ = voc_root
    cfg = _cfg(root, snapshot_iters)
    np.random.seed(cfg.RNG_SEED)
    ds, _ = make_voc(voc_root, split="trainval")
    ds.set_proposal_method("gt")
    roidb = get_training_roidb(ds, cfg)
    model = build_model("mobile", ds.num_classes, cfg)
    return train_net(model, ds, roidb, None, out_dir, cfg=cfg, max_iters=iters)


def test_interrupted_training_is_bit_exact(voc_root, tmp_path):
    # run A: 6 iters in one go
    state_a = _train(voc_root, str(tmp_path / "a"), 6, snapshot_iters=100)
    # run B: 4 iters (snapshot at 4), then resume the SAME output dir to 6
    _train(voc_root, str(tmp_path / "b"), 4, snapshot_iters=4)
    state_b = _train(voc_root, str(tmp_path / "b"), 6, snapshot_iters=100)

    for pa, pb in zip(jax.tree.leaves(state_a["params"]),
                      jax.tree.leaves(state_b["params"])):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
