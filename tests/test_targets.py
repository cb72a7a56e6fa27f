"""Target layers: reference-semantics invariants + numpy cross-checks.

The reference's sampling uses numpy RNG (not reproducible here), so tests
check the *deterministic* parts exactly (label assignment rules, quotas,
target math) rather than bit-equality of random subsets (SURVEY.md hard
part #2)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from frcnn_tpu.config import default_config
from frcnn_tpu.models.targets import anchor_target_layer, proposal_target_layer
from frcnn_tpu.ops.anchors import generate_anchors_pre
from frcnn_tpu.ops.boxes import bbox_transform_inv
from tests.conftest import random_boxes
from tests import oracles

CFG = default_config()


def _setup_anchor_case(rng, h=20, w=20, stride=8, n_gt=4):
    anchors, _ = generate_anchors_pre(h, w, stride,
                                      ratios=(0.5, 1.0, 2.0), scales=(2.0, 4.0))
    anchors = np.asarray(anchors)
    im_info = np.array([h * stride, w * stride, 1.0], np.float32)
    gt = random_boxes(rng, n_gt, width=w * stride - 1, height=h * stride - 1,
                      min_size=20)
    return anchors, gt, im_info


@pytest.mark.slow
def test_anchor_target_label_rules(rng):
    anchors, gt, im_info = _setup_anchor_case(rng)
    gv = np.ones(len(gt), bool)
    at = anchor_target_layer(jnp.asarray(anchors), jnp.asarray(gt),
                             jnp.asarray(gv), jnp.asarray(im_info),
                             jax.random.PRNGKey(0), CFG)
    labels = np.asarray(at.labels)
    t = CFG.TRAIN

    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < im_info[1]) & (anchors[:, 3] < im_info[0]))
    ov = oracles.bbox_overlaps_np(anchors, gt)
    max_ov = ov.max(axis=1)
    gt_max = np.where(inside[:, None], ov, -1).max(axis=0)
    is_gt_argmax = ((np.where(inside[:, None], ov, -1) == gt_max[None, :])
                    & (gt_max[None, :] > 0)).any(axis=1)

    # every fg label satisfies the fg rule; every bg label satisfies bg rule
    fg = labels == 1
    bg = labels == 0
    assert not (fg & ~inside).any() and not (bg & ~inside).any()
    assert np.all((max_ov[fg] >= t.RPN_POSITIVE_OVERLAP) | is_gt_argmax[fg])
    assert np.all(max_ov[bg] < t.RPN_NEGATIVE_OVERLAP)
    # quotas
    assert fg.sum() <= t.RPN_FG_FRACTION * t.RPN_BATCHSIZE
    assert fg.sum() + bg.sum() == t.RPN_BATCHSIZE  # enough bg in this setup
    # when fg count is under quota, EVERY rule-fg anchor must be labeled 1
    rule_fg = inside & (is_gt_argmax | (max_ov >= t.RPN_POSITIVE_OVERLAP))
    if rule_fg.sum() <= t.RPN_FG_FRACTION * t.RPN_BATCHSIZE:
        assert np.array_equal(fg, rule_fg)

    # bbox targets on fg match the transform toward the argmax gt
    argmax = ov.argmax(axis=1)
    want = oracles.bbox_transform_np(anchors[fg], gt[argmax[fg]])
    np.testing.assert_allclose(np.asarray(at.bbox_targets)[fg], want,
                               rtol=1e-4, atol=1e-4)
    # outside weights: uniform 1/num_examples on sampled anchors
    ow = np.asarray(at.bbox_outside_weights)
    n_ex = (labels >= 0).sum()
    np.testing.assert_allclose(ow[labels >= 0], 1.0 / n_ex, rtol=1e-5)
    assert (ow[labels == -1] == 0).all()


def test_anchor_target_respects_gt_validity(rng):
    anchors, gt, im_info = _setup_anchor_case(rng, n_gt=4)
    gv = np.array([True, True, False, False])
    at = anchor_target_layer(jnp.asarray(anchors), jnp.asarray(gt),
                             jnp.asarray(gv), jnp.asarray(im_info),
                             jax.random.PRNGKey(1), CFG)
    labels = np.asarray(at.labels)
    # no anchor may be fg purely because of an invalid gt
    ov_valid = oracles.bbox_overlaps_np(anchors, gt[:2])
    fg = labels == 1
    t = CFG.TRAIN
    max_valid = ov_valid.max(axis=1)
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < im_info[1]) & (anchors[:, 3] < im_info[0]))
    gt_max = np.where(inside[:, None], ov_valid, -1).max(axis=0)
    is_argmax = ((np.where(inside[:, None], ov_valid, -1) == gt_max[None, :])
                 & (gt_max[None, :] > 0)).any(axis=1)
    assert np.all((max_valid[fg] >= t.RPN_POSITIVE_OVERLAP) | is_argmax[fg])


def test_anchor_target_subsampling_randomness(rng):
    # different keys → different fg/bg subsets, same counts
    anchors, gt, im_info = _setup_anchor_case(rng, n_gt=8)
    gv = np.ones(len(gt), bool)
    args = (jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(gv),
            jnp.asarray(im_info))
    l1 = np.asarray(anchor_target_layer(*args, jax.random.PRNGKey(0), CFG).labels)
    l2 = np.asarray(anchor_target_layer(*args, jax.random.PRNGKey(7), CFG).labels)
    assert (l1 >= 0).sum() == (l2 >= 0).sum() == CFG.TRAIN.RPN_BATCHSIZE
    assert not np.array_equal(l1, l2)


@pytest.mark.slow
def test_proposal_target_sampling(rng):
    n_gt = 3
    gt = random_boxes(rng, n_gt, width=500, height=400, min_size=60)
    gl = np.array([3, 7, 12], np.int32)
    gv = np.ones(n_gt, bool)
    # proposals: jittered gt (fg-ish) + random (mostly bg)
    jit_fg = np.concatenate([gt + rng.randn(n_gt, 4).astype(np.float32) * 4
                             for _ in range(10)])
    rand = random_boxes(rng, 170, width=500, height=400)
    rois = np.concatenate([jit_fg, rand]).astype(np.float32)
    rv = np.ones(len(rois), bool)

    pt = proposal_target_layer(jnp.asarray(rois), jnp.asarray(rv),
                               jnp.asarray(gt), jnp.asarray(gl), jnp.asarray(gv),
                               jax.random.PRNGKey(0), CFG, num_classes=21)
    t = CFG.TRAIN
    labels = np.asarray(pt.labels)
    out_rois = np.asarray(pt.rois)
    assert labels.shape == (t.BATCH_SIZE,)
    fg = labels > 0
    assert fg.sum() <= round(t.FG_FRACTION * t.BATCH_SIZE)
    # every sampled fg roi has IoU >= FG_THRESH with its labeled gt class
    ov = oracles.bbox_overlaps_np(out_rois[fg], gt)
    best = ov.argmax(axis=1)
    assert (ov.max(axis=1) >= t.FG_THRESH - 1e-5).all()
    np.testing.assert_array_equal(labels[fg], gl[best])
    # fg rois come first (reference ordering)
    first_bg = np.argmax(~fg) if not fg.all() else len(fg)
    assert fg[:first_bg].all() and not fg[first_bg:].any()
    # bg rois have IoU in [BG_LO, BG_HI)
    ov_bg = oracles.bbox_overlaps_np(out_rois[~fg], gt).max(axis=1)
    assert (ov_bg < t.BG_THRESH_HI + 1e-5).all()
    assert (ov_bg >= t.BG_THRESH_LO - 1e-5).all()

    # target math: unnormalize + decode recovers the matched gt box exactly
    tgt = np.asarray(pt.bbox_targets).reshape(t.BATCH_SIZE, 21, 4)
    picked = tgt[fg, labels[fg]]
    stds = np.asarray(t.BBOX_NORMALIZE_STDS)
    means = np.asarray(t.BBOX_NORMALIZE_MEANS)
    deltas = picked * stds + means
    rec = np.asarray(bbox_transform_inv(jnp.asarray(out_rois[fg]),
                                        jnp.asarray(deltas.astype(np.float32)),
                                        clip=False))
    np.testing.assert_allclose(rec, gt[best], rtol=1e-3, atol=0.3)
    # inside weights: exactly the labeled class's 4 columns for fg, none for bg
    iw = np.asarray(pt.bbox_inside_weights).reshape(t.BATCH_SIZE, 21, 4)
    assert (iw[~fg] == 0).all()
    for i in np.nonzero(fg)[0][:5]:
        nz = np.nonzero(iw[i].sum(axis=1))[0]
        np.testing.assert_array_equal(nz, [labels[i]])


@pytest.mark.slow
def test_proposal_target_gt_always_fg(rng):
    # gt boxes are appended to the roi set → with room in the quota every
    # valid gt becomes an fg roi (IoU 1 with itself)
    gt = random_boxes(rng, 2, width=300, height=300, min_size=50)
    gl = np.array([5, 9], np.int32)
    gv = np.ones(2, bool)
    rois = random_boxes(rng, 62, width=300, height=300)
    pt = proposal_target_layer(jnp.asarray(rois), jnp.ones(62, bool),
                               jnp.asarray(gt), jnp.asarray(gl), jnp.asarray(gv),
                               jax.random.PRNGKey(3), CFG, num_classes=21)
    labels = np.asarray(pt.labels)
    out_rois = np.asarray(pt.rois)
    for g, lab in zip(gt, gl):
        match = (np.abs(out_rois - g).max(axis=1) < 1e-3)
        assert match.any() and (labels[match] == lab).all()


def test_anchor_target_compact_matches_dense(rng):
    """anchor_target_compact is the dense layer in sampled-rows form: same
    key => same sampled set, same labels/targets/weights at those rows, and
    the RPN loss pair computed on the compact layout equals the dense-layout
    values (unsampled anchors contribute exactly 0 there)."""
    from frcnn_tpu.models.losses import smooth_l1_loss, softmax_ce
    from frcnn_tpu.models.targets import anchor_target_compact

    for trial in range(3):
        anchors, gt, im_info = _setup_anchor_case(rng, n_gt=3 + trial)
        gv = np.ones(len(gt), bool)
        args = (jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(gv),
                jnp.asarray(im_info), jax.random.PRNGKey(100 + trial), CFG)
        at = anchor_target_layer(*args)
        cat = anchor_target_compact(*args)

        labels = np.asarray(at.labels)
        sel = np.asarray(cat.sel)
        clab = np.asarray(cat.labels)

        # same sampled set, same fg/bg split
        dense_sampled = np.nonzero(labels >= 0)[0]
        live = clab >= 0
        np.testing.assert_array_equal(np.sort(sel[live]), dense_sampled)
        np.testing.assert_array_equal(labels[sel[live]], clab[live])

        # same per-row targets/weights on the live slots, zeros on dead ones
        np.testing.assert_allclose(np.asarray(cat.bbox_targets)[live],
                                   np.asarray(at.bbox_targets)[sel[live]],
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(cat.bbox_inside_weights)[live],
            np.asarray(at.bbox_inside_weights)[sel[live]])
        np.testing.assert_allclose(
            np.asarray(cat.bbox_outside_weights)[live],
            np.asarray(at.bbox_outside_weights)[sel[live]])
        assert (np.asarray(cat.bbox_inside_weights)[~live] == 0).all()
        assert (np.asarray(cat.bbox_outside_weights)[~live] == 0).all()

        # loss equality through both layouts on the same random head outputs
        k = anchors.shape[0]
        r = np.random.RandomState(7 + trial)
        cls = jnp.asarray(r.randn(k, 2).astype(np.float32))
        box = jnp.asarray(r.randn(k, 4).astype(np.float32))
        ce_dense = softmax_ce(cls, at.labels,
                              (at.labels >= 0).astype(jnp.float32))
        l1_dense = smooth_l1_loss(box, at.bbox_targets,
                                  at.bbox_inside_weights,
                                  at.bbox_outside_weights, sigma=3.0)
        ce_c = softmax_ce(cls[cat.sel], cat.labels,
                          (cat.labels >= 0).astype(jnp.float32))
        l1_c = smooth_l1_loss(box[cat.sel], cat.bbox_targets,
                              cat.bbox_inside_weights,
                              cat.bbox_outside_weights, sigma=3.0)
        np.testing.assert_allclose(float(ce_c), float(ce_dense), rtol=1e-5)
        np.testing.assert_allclose(float(l1_c), float(l1_dense), rtol=1e-5)
