"""topk_threshold Pallas kernel: exact-set agreement with lax.top_k
(stable-argsort oracle), including tie-heavy and adversarial inputs.

Interpret mode on CPU; compiled + REPEAT-executed on TPU under
FRCNN_TPU_TEST_TPU=1 (repeat execution is where the axon backend broke the
XLA strided-top-k build — PROFILE_r04 §2)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.ops.pallas.select_kernel import (topk_threshold,
                                                topk_threshold_ref)

ON_TPU = jax.default_backend() == "tpu"
INTERPRET = not ON_TPU


def _check(x, k, interpret=INTERPRET):
    x = jnp.asarray(x, jnp.float32)
    vals, idx = topk_threshold(x, k, interpret=interpret)
    rvals, ridx = topk_threshold_ref(x, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(rvals))
    # and the selected VALUES (sorted desc) equal lax.top_k's exactly
    wv, _ = jax.lax.top_k(x, k)
    np.testing.assert_array_equal(
        -np.sort(-np.asarray(vals), axis=-1), np.asarray(wv))


def test_unique_values():
    rng = np.random.RandomState(0)
    x = rng.permutation(3 * 4096).reshape(3, 4096).astype(np.float32)
    _check(x, 300)


def test_random_uniform_padded_row():
    # S not a multiple of the 512-lane block; k odd-sized
    rng = np.random.RandomState(1)
    _check(rng.rand(2, 3001).astype(np.float32), 77)


def test_tie_heavy_quantized():
    # 8-level quantization: the threshold bucket holds many ties; the first-r
    # by index must be selected (lax.top_k's tie rule)
    rng = np.random.RandomState(2)
    x = np.floor(rng.rand(3, 2048) * 8).astype(np.float32)
    _check(x, 500)


def test_all_equal():
    _check(np.ones((2, 1536), np.float32), 200)


def test_mixed_signs_and_infs():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 2048).astype(np.float32) * 100
    x[0, :50] = -np.inf
    x[0, 50:60] = np.inf
    x[1, ::3] = -x[1, ::3]
    _check(x, 600)


def test_k_equals_s():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 700).astype(np.float32)
    _check(x, 700)


def test_k_one():
    rng = np.random.RandomState(5)
    _check(rng.randn(2, 1111).astype(np.float32), 1)


def test_clustered_run():
    # a contiguous dominant run (the strided-select hard case) — threshold
    # select has no block-saturation mode at all, but keep the case pinned
    rng = np.random.RandomState(6)
    x = rng.rand(2, 8192).astype(np.float32) * 0.1
    x[0, 2000:4500] += 0.9
    x[1, :2500] += 0.9
    _check(x, 2000)


def test_nan_sorts_largest_and_visible():
    # NaN (any bit pattern, incl. negative NaN whose raw sortable key would
    # collide with the INT_MIN padding key) maps to one key above +inf:
    # selected FIRST, so a diverged run shows loud NaN values instead of a
    # silently different selection (round-4 ADVICE #4).
    rng = np.random.RandomState(8)
    x = rng.rand(2, 2048).astype(np.float32)
    x[0, 100] = np.nan
    x[0, 200] = np.float32(np.frombuffer(
        np.uint32(0xFFC00000).tobytes(), np.float32)[0])  # negative NaN
    x[1, 5] = np.nan
    vals, idx = topk_threshold(jnp.asarray(x), 50, interpret=INTERPRET)
    vals, idx = np.asarray(vals), np.asarray(idx)
    # the NaN positions are in the selected set, values visibly NaN
    assert {100, 200} <= set(idx[0]) and 5 in set(idx[1])
    assert np.isnan(vals[0]).sum() == 2 and np.isnan(vals[1]).sum() == 1
    # non-NaN remainder of the selection = top-(k - #nan) of the finite rest
    finite0 = np.sort(x[0][~np.isnan(x[0])])[::-1][:48]
    got0 = np.sort(vals[0][~np.isnan(vals[0])])[::-1]
    np.testing.assert_array_equal(got0, finite0)


def test_sigmoid_like_production_shape():
    # FPN train L3 shape scaled down: sigmoid-distributed scores
    rng = np.random.RandomState(7)
    x = 1.0 / (1.0 + np.exp(-rng.randn(2, 29184).astype(np.float32)))
    _check(x, 2000)


def test_select_pre_nms_threshold_path_bit_identical(monkeypatch):
    """The wired FPN path (select_pre_nms use_threshold=True) must be
    BIT-IDENTICAL to the lax.top_k path — ids, scores, AND order (the
    post-kernel (-score, index) pair-sort restores lax.top_k's tie rule;
    padding regions produce exact score ties, so order parity is what
    keeps downstream NMS unchanged)."""
    from functools import partial

    from frcnn_tpu.models import fpn as fpn_mod
    from frcnn_tpu.ops.pallas import select_kernel as sk

    monkeypatch.setattr(fpn_mod, "THRESHOLD_SELECT_MIN_S", 256)
    monkeypatch.setattr(fpn_mod, "THRESHOLD_SELECT_MIN_RATIO", 1)
    monkeypatch.setattr(sk, "topk_threshold",
                        partial(topk_threshold, interpret=True))

    rng = np.random.RandomState(11)
    a_n, b = 3, 2
    hws = [(16, 24), (8, 12), (2, 3)]
    sizes = [h * w * a_n for h, w in hws]
    per = 100
    # heavy exact ties: quantized scores (as zero-padding regions produce)
    fg = np.floor(rng.rand(b, sum(sizes)) * 50).astype(np.float32) / 50
    cells = [jnp.asarray(rng.randn(b, h * w, 4 * a_n).astype(np.float32))
             for h, w in hws]
    ref = fpn_mod.select_pre_nms(jnp.asarray(fg), cells, sizes, per, a_n,
                                 use_threshold=False)
    got = fpn_mod.select_pre_nms(jnp.asarray(fg), cells, sizes, per, a_n,
                                 use_threshold=True)
    for name, a, c in zip(("sel", "scores", "deltas"), got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c),
                                      err_msg=name)


def test_subsample_idx_threshold_path_bit_identical(monkeypatch):
    """The anchor fg/bg sampler (targets._subsample_idx) with the threshold
    kernel must return bit-identical (idx, take) to the lax.top_k path —
    slots included, under vmap as the train step calls it."""
    from functools import partial

    from frcnn_tpu.models import targets as tg
    from frcnn_tpu.ops.pallas import select_kernel as sk

    monkeypatch.setattr(tg, "THRESHOLD_SELECT_MIN_S", 256)
    monkeypatch.setattr(sk, "topk_threshold",
                        partial(topk_threshold, interpret=True))

    rng = np.random.RandomState(12)
    mask = jnp.asarray(rng.rand(4, 5000) < 0.02)
    keys = jax.random.split(jax.random.PRNGKey(3), 4)

    def run(use_th):
        return jax.vmap(
            lambda m, k: tg._subsample_idx(m, 128, 128, k,
                                           use_threshold=use_th)
        )(mask, keys)

    ri, rt = run(False)
    gi, gt = run(True)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(gt), np.asarray(rt))


def test_proposal_layer_batch_threshold_path_bit_identical(monkeypatch):
    """The C4 batched proposal layer with the threshold kernel must return
    bit-identical (rois, scores, valid) to the lax.top_k path — the top-k
    feeds NMS presorted, so tie ORDER (incl. NEG_INF-masked padding
    anchors) decides downstream keeps."""
    from functools import partial

    from frcnn_tpu.models import proposals as pr
    from frcnn_tpu.ops.anchors import generate_anchors_pre
    from frcnn_tpu.ops.pallas import select_kernel as sk

    monkeypatch.setattr(pr, "THRESHOLD_SELECT_MIN_S", 256)
    monkeypatch.setattr(pr, "THRESHOLD_SELECT_MIN_RATIO", 1)
    monkeypatch.setattr(sk, "topk_threshold",
                        partial(topk_threshold, interpret=True))

    rng = np.random.RandomState(13)
    anchors, _ = generate_anchors_pre(16, 24, 16)
    k = anchors.shape[0]                      # 16*24*9 = 3456
    scores = jnp.asarray(rng.rand(2, k).astype(np.float32))
    deltas = jnp.asarray((rng.randn(2, k, 4) * 0.1).astype(np.float32))
    # one image smaller than the padded grid: many NEG_INF-masked anchors
    im_info = jnp.asarray([[256.0, 384.0, 1.0], [120.0, 150.0, 1.0]])

    def run(use_th):
        return pr.proposal_layer_batch(
            scores, deltas, jnp.asarray(anchors), im_info,
            pre_nms_top_n=1000, post_nms_top_n=64, nms_thresh=0.7,
            use_pallas=False, use_threshold=use_th)

    ref = run(False)
    got = run(True)
    for name, a, c in zip(("rois", "scores", "valid"), got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c),
                                      err_msg=name)


def test_threshold_gate_requires_ratio(monkeypatch):
    """The S/k profitability gate (round 5): the kernel must NOT engage
    when S < 24*k even with use_threshold on — at the C4 detect shape
    (S/k = 5.7) the kernel measured 1.7 ms SLOWER than lax.top_k after a
    backend TopK update (PROFILE_r05 §3).  Guards the gate itself: a
    kernel call below the ratio is a perf regression even though the
    result would be correct."""
    from functools import partial

    from frcnn_tpu.models import fpn as fpn_mod
    from frcnn_tpu.models import proposals as pr
    from frcnn_tpu.ops.anchors import generate_anchors_pre
    from frcnn_tpu.ops.pallas import select_kernel as sk

    calls = []

    def spy(scores, k, **kw):
        calls.append((scores.shape, k))
        return topk_threshold(scores, k, interpret=True)

    monkeypatch.setattr(sk, "topk_threshold", spy)
    # C4-like: S=3456, pre_n=1000 -> ratio 3.5; patch MIN_S low so ONLY
    # the ratio can gate
    monkeypatch.setattr(pr, "THRESHOLD_SELECT_MIN_S", 256)
    rng = np.random.RandomState(21)
    anchors, _ = generate_anchors_pre(16, 24, 16)
    s = anchors.shape[0]
    pr.proposal_layer_batch(
        jnp.asarray(rng.rand(1, s).astype(np.float32)),
        jnp.asarray((rng.randn(1, s, 4) * 0.1).astype(np.float32)),
        jnp.asarray(anchors), jnp.asarray([[256.0, 384.0, 1.0]]),
        pre_nms_top_n=1000, post_nms_top_n=64, nms_thresh=0.7,
        use_pallas=False, use_threshold=True)
    assert not calls, f"kernel engaged below the S/k ratio: {calls}"

    # per-level FPN gate: sizes 1152/288/18 with per=16 -> only the first
    # level passes both MIN_S (patched 256) and ratio (1152 >= 24*16)
    monkeypatch.setattr(fpn_mod, "THRESHOLD_SELECT_MIN_S", 256)
    a_n = 3
    hws = [(16, 24), (8, 12), (2, 3)]
    sizes = [h * w * a_n for h, w in hws]
    fg = jnp.asarray(rng.rand(1, sum(sizes)).astype(np.float32))
    cells = [jnp.asarray(rng.randn(1, h * w, 4 * a_n).astype(np.float32))
             for h, w in hws]
    fpn_mod.select_pre_nms(fg, cells, sizes, 16, a_n, use_threshold=True)
    assert [c[0][1] for c in calls] == [1152], (
        f"expected exactly the 1152-wide level through the kernel: {calls}")


@pytest.mark.skipif(not ON_TPU, reason="needs TPU (FRCNN_TPU_TEST_TPU=1)")
def test_tpu_compiled_repeat_execution():
    """Compiled on the chip, executed 5x with fresh inputs — the failure
    mode that killed the strided XLA build was the SECOND execution."""
    rng = np.random.RandomState(8)
    for trial in range(5):
        x = rng.rand(4, 29184).astype(np.float32)
        _check(x, 2000, interpret=False)
