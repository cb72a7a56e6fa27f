"""Train-path loss parity: one set of random reference-layout torch weights
through BOTH stacks — the torch/numpy reference-semantics TRAIN composition
(tests/ref_pipeline.py::ref_train_losses, transcribing
``lib/nets/network.py:~L150-L220`` + ``_smooth_l1_loss`` ~L300-L360) and the
fixed-shape frcnn_tpu ``train_forward`` graph — must produce the same
4 loss values (VERDICT r2 Missing #3).

RNG is bypassed exactly where the reference uses it:
  * anchor-target subsampling — the test cfg sets RPN_BATCHSIZE to the full
    anchor count, so neither stack disables anything (deterministic);
  * roi sampling — ours samples, and the oracle independently recomputes
    labels/targets/losses for the SAME sampled rois (the only random part is
    *which* rois, everything downstream is deterministic per roi).

Everything else is computed twice, independently: the train-Ns proposal
layer (asserted set-equal), anchor labels/targets/weights, per-roi
proposal-target math, the RoI head forward, and the 4-loss composition.
The detect-path analogue is tests/test_pipeline_parity.py; this closes the
train side, protecting the mAP-parity claim where per-op tests cannot (a
loss-stack convention drift would silently mistrain).
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from frcnn_tpu.config import default_config  # noqa: E402
from frcnn_tpu.models import build_model  # noqa: E402
from frcnn_tpu.utils.weight_convert import convert_detector  # noqa: E402
from tests.ref_pipeline import ref_train_losses  # noqa: E402
from tests.test_pipeline_parity import (_assert_det_sets_match,  # noqa: E402
                                        _detector_state_dict, _tail_t,
                                        NUM_CLASSES, A)
from tests.test_weight_convert import _resnet50_trunk_t  # noqa: E402

pytestmark = pytest.mark.slow

H, W = 224, 304
K = (H // 16) * (W // 16) * A  # full anchor count at the C4 stride


def _train_parity_cfg():
    cfg = default_config()
    return dataclasses.replace(
        cfg,
        TRAIN=dataclasses.replace(
            cfg.TRAIN,
            RPN_PRE_NMS_TOP_N=1000, RPN_POST_NMS_TOP_N=128,
            # quotas >= every possible fg/bg count -> the reference would
            # subsample nothing and both stacks are deterministic
            RPN_BATCHSIZE=K, RPN_FG_FRACTION=0.5),
        TPU=dataclasses.replace(cfg.TPU, BUCKETS=((H, W),)))


def _scene():
    """Bucket-sized image with blocky objects + gt boxes large enough to
    overlap inside anchors (the oracle asserts gt_max > 0)."""
    import cv2

    rng = np.random.RandomState(21)
    base = rng.randint(0, 255, (H // 16, W // 16, 3)).astype(np.uint8)
    im = cv2.resize(base, (W, H), interpolation=cv2.INTER_LINEAR)
    gt, labels = [], []
    for i, (y, x, bh, bw) in enumerate(
            ((30, 40, 80, 70), (100, 150, 90, 110),
             (40, 200, 70, 60), (130, 30, 60, 90))):
        im[y:y + bh, x:x + bw] = rng.randint(0, 255, 3)
        gt.append((x, y, x + bw - 1, y + bh - 1))
        labels.append(1 + i % (NUM_CLASSES - 1))
    return im, np.asarray(gt, np.float32), np.asarray(labels, np.int32)


def test_train_loss_parity():
    rng = np.random.RandomState(0)
    sd = _detector_state_dict(rng)
    cfg = _train_parity_cfg()
    im, gt, gt_labels = _scene()

    model = build_model("res50", NUM_CLASSES, cfg)
    # jit both graphs: eager op-by-op dispatch costs ~25 s (init) + ~15 s
    # (train_forward) on this 1-core box; jitted + the conftest persistent
    # compile cache they run in seconds
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, H, W, 3)),
                                    jnp.array([[float(H), float(W), 1.0]]))
    converted = convert_detector({k: v.numpy() for k, v in sd.items()},
                                 "res50", num_anchors=A)
    variables = {"params": converted}

    losses, aux = jax.jit(
        lambda v, b, ii, g, gl, gv, k: model.apply(
            v, b, ii, g, gl, gv, k, method="train_forward"))(
        variables,
        jnp.asarray(im, jnp.float32)[None],
        jnp.array([[float(H), float(W), 1.0]]),
        jnp.asarray(gt)[None],
        jnp.asarray(gt_labels)[None],
        jnp.ones((1, len(gt)), bool),
        jax.random.PRNGKey(3))

    sampled_rois = np.asarray(aux["rois"][0], np.float32)
    want, ref_props = ref_train_losses(
        sd, _resnet50_trunk_t, _tail_t, im, gt, gt_labels, cfg,
        NUM_CLASSES, sampled_rois, num_anchors=A)

    # the comparison only means something if both loss branches are live
    assert int(aux["n_fg"]) > 0, "no fg roi sampled — scene too hard"
    assert want["rpn_loss_box"] > 0 and want["loss_box"] > 0

    # 1. train-Ns proposal composition (decode -> clip -> presort -> NMS 0.7
    #    -> cap) agrees set-wise between the stacks
    p_valid = np.asarray(aux["proposal_valid"][0])
    got_props = np.concatenate(
        [np.asarray(aux["proposals"][0]),
         np.asarray(aux["proposal_scores"][0])[:, None]], axis=1)[p_valid]
    _assert_det_sets_match(ref_props, got_props, "train proposals")

    # 2. the 4 loss values match the reference transcription
    for name in ("rpn_cross_entropy", "rpn_loss_box",
                 "cross_entropy", "loss_box", "total_loss"):
        ours = float(losses[name])
        rel = abs(ours - want[name]) / max(abs(want[name]), 1e-6)
        assert rel <= 1e-4, (
            f"{name}: ours {ours:.6f} vs reference-semantics {want[name]:.6f} "
            f"(rel {rel:.2e})")
