"""Proposal layer vs a numpy transcription of the reference algorithm."""

import numpy as np
import jax.numpy as jnp

from frcnn_tpu.models.proposals import proposal_layer, proposal_top_layer
from frcnn_tpu.ops.anchors import generate_anchors_pre
from tests import oracles


def _case(rng, h=10, w=12, stride=16):
    anchors, _ = generate_anchors_pre(h, w, stride,
                                      ratios=(0.5, 1.0, 2.0), scales=(4.0, 8.0))
    anchors = np.asarray(anchors)
    k = anchors.shape[0]
    scores = rng.uniform(0, 1, k).astype(np.float32)
    deltas = (rng.randn(k, 4) * 0.1).astype(np.float32)
    im_info = np.array([h * stride, w * stride, 1.0], np.float32)
    return anchors, scores, deltas, im_info


def _oracle_proposals(anchors, scores, deltas, im_info, pre_n, post_n, thresh):
    boxes = oracles.bbox_transform_inv_np(anchors.astype(np.float64),
                                          deltas.astype(np.float64))
    boxes[:, 0] = np.clip(boxes[:, 0], 0, im_info[1] - 1)
    boxes[:, 1] = np.clip(boxes[:, 1], 0, im_info[0] - 1)
    boxes[:, 2] = np.clip(boxes[:, 2], 0, im_info[1] - 1)
    boxes[:, 3] = np.clip(boxes[:, 3], 0, im_info[0] - 1)
    order = scores.argsort()[::-1][:pre_n]
    boxes, s = boxes[order], scores[order]
    keep = oracles.nms_np(np.concatenate([boxes, s[:, None]], 1), thresh)[:post_n]
    return boxes[keep], s[keep]


def test_proposal_layer_matches_oracle(rng):
    anchors, scores, deltas, im_info = _case(rng)
    pre_n, post_n, thresh = 300, 32, 0.7
    rois, rs, valid = proposal_layer(
        jnp.asarray(scores), jnp.asarray(deltas), jnp.asarray(anchors),
        jnp.asarray(im_info), pre_nms_top_n=pre_n, post_nms_top_n=post_n,
        nms_thresh=thresh, use_pallas=False)
    rois, rs, valid = np.asarray(rois), np.asarray(rs), np.asarray(valid)
    want_boxes, want_scores = _oracle_proposals(anchors, scores, deltas, im_info,
                                                pre_n, post_n, thresh)
    n = len(want_boxes)
    assert valid[:n].all()
    np.testing.assert_allclose(rs[:n], want_scores, rtol=1e-5)
    np.testing.assert_allclose(rois[:n], want_boxes, rtol=1e-4, atol=1e-2)


def test_proposal_layer_fixed_shapes(rng):
    anchors, scores, deltas, im_info = _case(rng)
    rois, rs, valid = proposal_layer(
        jnp.asarray(scores), jnp.asarray(deltas), jnp.asarray(anchors),
        jnp.asarray(im_info), pre_nms_top_n=6000, post_nms_top_n=300,
        nms_thresh=0.7, use_pallas=False)
    assert rois.shape == (300, 4) and rs.shape == (300,) and valid.shape == (300,)
    # rois inside image
    rois = np.asarray(rois)[np.asarray(valid)]
    assert (rois[:, 0] >= 0).all() and (rois[:, 2] <= im_info[1] - 1).all()


def test_proposal_top_layer(rng):
    anchors, scores, deltas, im_info = _case(rng)
    boxes, s, valid = proposal_top_layer(
        jnp.asarray(scores), jnp.asarray(deltas), jnp.asarray(anchors),
        jnp.asarray(im_info), rpn_top_n=50)
    boxes, s, valid = np.asarray(boxes), np.asarray(s), np.asarray(valid)
    assert boxes.shape == (50, 4) and valid.all()
    # scores are the true top-50 in descending order
    want = np.sort(scores)[::-1][:50]
    np.testing.assert_allclose(s, want, rtol=1e-6)


def test_proposal_layer_masks_padding_anchors(rng):
    # anchors centred outside the actual image (padded bucket region) must
    # never produce valid proposals, however high their score
    anchors, scores, deltas, im_info = _case(rng)
    im_info = im_info.copy()
    im_info[:2] = [80, 96]  # actual image much smaller than the anchor grid
    scores[:] = 0.1
    outside = ((anchors[:, 0] + anchors[:, 2]) / 2 >= 96) | \
              ((anchors[:, 1] + anchors[:, 3]) / 2 >= 80)
    scores[outside] = 0.99  # bait
    rois, rs, valid = proposal_layer(
        jnp.asarray(scores), jnp.asarray(deltas), jnp.asarray(anchors),
        jnp.asarray(im_info), pre_nms_top_n=300, post_nms_top_n=32,
        nms_thresh=0.7, use_pallas=False)
    assert np.asarray(rs)[np.asarray(valid)].max() <= 0.1 + 1e-6


def test_fpn_select_pre_nms_matches_rows_oracle(rng):
    """FPN pre-NMS selection (models/fpn.py::select_pre_nms): A-major top-k
    remapped to A-minor anchor ids, deltas via cell-row gather + lane
    select.  Oracle: build A-MINOR per-anchor probability and delta-row
    tables independently and select with per-level top_k +
    take_along_axis.  Distinct scores make the ordering unique, so ids,
    scores, and deltas must match exactly."""
    import jax
    import jax.numpy as jnp

    from frcnn_tpu.models.fpn import select_pre_nms

    a_n, b = 3, 2
    # first level is big enough (4608 > 128 blocks * m) to exercise
    # topk_strided's two-stage path; the last (18 < per) the identity path
    hws = [(32, 48), (8, 12), (4, 6), (2, 3)]
    per = 20
    sizes = [h * w * a_n for h, w in hws]
    k_tot = sum(sizes)

    # distinct scores: shuffled arange, per image
    prob_minor = np.stack([rng.permutation(k_tot).astype(np.float32) / k_tot
                           for _ in range(b)])
    cells, rows_minor, prob_major = [], [], []
    off = 0
    for (h, w), s in zip(hws, sizes):
        hw = h * w
        c = rng.randn(b, hw, 4 * a_n).astype(np.float32)
        cells.append(jnp.asarray(c))
        rows_minor.append(c.reshape(b, hw * a_n, 4))    # k = cell*A + a
        pm = prob_minor[:, off:off + s].reshape(b, hw, a_n)
        prob_major.append(pm.transpose(0, 2, 1).reshape(b, s))  # a*HW + cell
        off += s
    rows_minor = np.concatenate(rows_minor, axis=1)
    fg_major = jnp.asarray(np.concatenate(prob_major, axis=1))

    sel, scores, deltas = select_pre_nms(fg_major, cells, sizes, per, a_n)
    sel = np.asarray(sel)

    # independent oracle in minor order
    want_sel, want_sc = [], []
    off = 0
    for s in sizes:
        k = min(per, s)
        sl = prob_minor[:, off:off + s]
        idx = np.argsort(-sl, axis=1)[:, :k]
        want_sel.append(idx + off)
        want_sc.append(np.take_along_axis(sl, idx, axis=1))
        off += s
    want_sel = np.concatenate(want_sel, axis=1)
    want_sc = np.concatenate(want_sc, axis=1)

    # select_pre_nms may emit each level's winners in any ORDER (identity
    # fast path when k == s; strided-block order in ops/select.py) — the
    # downstream _propose re-ranks the concat, so the contract is the
    # per-level (id, score, delta) SET.  Compare id-sorted per level.
    scores = np.asarray(scores)
    deltas = np.asarray(deltas)
    want_deltas = np.take_along_axis(rows_minor, want_sel[..., None], axis=1)
    off_k = 0
    for s in sizes:
        k = min(per, s)
        sl = slice(off_k, off_k + k)
        ours_ord = np.argsort(sel[:, sl], axis=1)
        want_ord = np.argsort(want_sel[:, sl], axis=1)

        def take(a, o):
            return np.take_along_axis(a, o.reshape(o.shape + (1,) * (a.ndim - 2)), axis=1)

        np.testing.assert_array_equal(take(sel[:, sl], ours_ord).squeeze(),
                                      take(want_sel[:, sl], want_ord).squeeze())
        np.testing.assert_allclose(take(scores[:, sl], ours_ord).squeeze(),
                                   take(want_sc[:, sl], want_ord).squeeze(),
                                   rtol=1e-6)
        np.testing.assert_allclose(take(deltas[:, sl], ours_ord),
                                   take(want_deltas[:, sl], want_ord),
                                   rtol=1e-6)
        off_k += k
