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
        # quarter-width MobileNet: resume bit-exactness and mesh/meshless
        # parity are capacity-independent, and the narrow net cuts these
        # 1-core CPU trainings ~3x
        MOBILENET=dataclasses.replace(cfg.MOBILENET, DEPTH_MULTIPLIER=0.25),
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


def _train(voc_root, out_dir, iters, snapshot_iters, mesh=None,
           ims_per_batch=2):
    from frcnn_tpu.engine.train import train_net, get_training_roidb
    from frcnn_tpu.models import build_model

    root, _ = voc_root
    cfg = _cfg(root, snapshot_iters)
    if ims_per_batch != 2:
        cfg = dataclasses.replace(
            cfg, TRAIN=dataclasses.replace(cfg.TRAIN,
                                           IMS_PER_BATCH=ims_per_batch))
    np.random.seed(cfg.RNG_SEED)
    ds, _ = make_voc(voc_root, split="trainval")
    ds.set_proposal_method("gt")
    roidb = get_training_roidb(ds, cfg)
    model = build_model("mobile", ds.num_classes, cfg)
    return train_net(model, ds, roidb, None, out_dir, cfg=cfg,
                     max_iters=iters, mesh=mesh)


def test_interrupted_training_is_bit_exact(voc_root, tmp_path):
    # run A: 6 iters in one go
    state_a = _train(voc_root, str(tmp_path / "a"), 6, snapshot_iters=100)
    # run B: 4 iters (snapshot at 4), then resume the SAME output dir to 6
    _train(voc_root, str(tmp_path / "b"), 4, snapshot_iters=4)
    state_b = _train(voc_root, str(tmp_path / "b"), 6, snapshot_iters=100)

    for pa, pb in zip(jax.tree.leaves(state_a["params"]),
                      jax.tree.leaves(state_b["params"])):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


@pytest.mark.nightly
def test_mesh_driver_resume_and_parity(voc_root, tmp_path):
    """The --data-parallel seam end-to-end (VERDICT r2 Missing #2): train_net
    with an 8-device mesh THROUGH SolverWrapper — snapshot-under-sharding →
    from_snapshot → re-replicate, prefetch + shard_batch interplay, pruning —
    must (a) resume bit-exactly and (b) match the meshless run on the same
    global batches up to reduction-order float noise."""
    from frcnn_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    # A: mesh, 5 iters straight (global batch 8 = 1 image/device)
    state_a = _train(voc_root, str(tmp_path / "ma"), 5, snapshot_iters=100,
                     mesh=mesh, ims_per_batch=8)
    # B: mesh, interrupt at 3 (snapshot), auto-resume same dir to 5
    _train(voc_root, str(tmp_path / "mb"), 3, snapshot_iters=3,
           mesh=mesh, ims_per_batch=8)
    state_b = _train(voc_root, str(tmp_path / "mb"), 5, snapshot_iters=100,
                     mesh=mesh, ims_per_batch=8)
    # C: meshless, same global batch and data order
    state_c = _train(voc_root, str(tmp_path / "mc"), 5, snapshot_iters=100,
                     mesh=None, ims_per_batch=8)

    leaves_a = jax.tree.leaves(state_a["params"])
    for pa, pb in zip(leaves_a, jax.tree.leaves(state_b["params"])):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    # mesh vs meshless: the grad psum reduces in a different order than the
    # single-device batch mean — allclose, not equal
    for pa, pc in zip(leaves_a, jax.tree.leaves(state_c["params"])):
        np.testing.assert_allclose(np.asarray(pa, np.float32),
                                   np.asarray(pc, np.float32),
                                   rtol=2e-4, atol=2e-5)
