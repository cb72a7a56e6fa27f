#!/usr/bin/env python
"""Attribute FPN _propose at the train shape (B8 608x1024, k=2000/level):
select_pre_nms (per-level top_k + cell-row fetch), decode/clip/validity,
the cross-level full top_k over the 10k concat, and the capped NMS.

Each arm is a small graph (compiles in ~1 min, unlike the full train step),
so this is the cheap way to decide where the remaining train-forward
milliseconds live.

Usage: python scripts/probe_fpn_propose.py [--test]  (--test: k=1000/level,
post=1000 — the detect-path shape)

By default each arm runs in its OWN subprocess: the axon backend can fail
the second of two similar executables in one process with INVALID_ARGUMENT
(PROFILE_r04 §2 / NEXT.md #4).  --arm {a,b,c,d} runs a single arm inline.
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_backbone import slope_time


def main():
    import subprocess

    arm = None
    for i, v in enumerate(sys.argv):
        if v == "--arm":
            arm = sys.argv[i + 1]
    if arm is None:
        # parent mode: one subprocess per arm (see module docstring)
        base = [a for a in sys.argv[1:] if a != "--arm"]
        for a in "abcd":
            r = subprocess.run([sys.executable, __file__, "--arm", a] + base)
            if r.returncode:
                sys.exit(r.returncode)
        return

    from frcnn_tpu.config import default_config
    from frcnn_tpu.models.fpn import select_pre_nms
    from frcnn_tpu.models.proposals import _anchor_validity
    from frcnn_tpu.ops.boxes import bbox_transform_inv, clip_boxes
    from frcnn_tpu.ops.nms import NEG_INF, nms_fixed_batched
    from frcnn_tpu.ops.anchors import generate_anchors_pre

    cfg = default_config()
    train = "--test" not in sys.argv
    B, h, w = 8, 608, 1024
    a_n = len(cfg.ANCHOR_RATIOS)
    per = (cfg.FPN.PRE_NMS_PER_LEVEL_TRAIN if train
           else cfg.FPN.PRE_NMS_PER_LEVEL_TEST)
    post = cfg.TRAIN.RPN_POST_NMS_TOP_N if train else cfg.TEST.RPN_POST_NMS_TOP_N
    thresh = cfg.TRAIN.RPN_NMS_THRESH if train else cfg.TEST.RPN_NMS_THRESH

    levels = list(range(cfg.FPN.MIN_LEVEL, cfg.FPN.MAX_LEVEL + 2))  # P2..P6

    def pyramid_shape(dim, level):
        # iterated stride-2 ceil halving, matching the SAME-padded conv
        # pyramid (a one-shot ceil(dim/2^l) diverges at non-divisible dims)
        for _ in range(level):
            dim = (dim + 1) // 2
        return dim

    shapes = [(pyramid_shape(h, l), pyramid_shape(w, l)) for l in levels]
    sizes = [hh * ww * a_n for hh, ww in shapes]
    anchors = jnp.concatenate([
        generate_anchors_pre(hh, ww, 2 ** l, ratios=cfg.ANCHOR_RATIOS,
                             scales=(cfg.FPN.ANCHOR_SCALE,))[0]
        for (hh, ww), l in zip(shapes, levels)], axis=0)
    k_tot = int(sum(sizes))
    rng = np.random.RandomState(0)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    prob = jnp.asarray(rng.rand(B, k_tot).astype(np.float32))
    cells = [jnp.asarray(rng.randn(B, hh * ww, 4 * a_n).astype(np.float32),
                         dtype) for hh, ww in shapes]
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (B, 1))
    print(f"backend={jax.default_backend()} B={B} K={k_tot} per={per} "
          f"post={post}")

    def scalarize(outs):
        return sum(jnp.asarray(o, jnp.float32).ravel()[0]
                   for o in jax.tree.leaves(outs))

    # A: per-level top_k + cell-row delta fetch
    if arm == "a":
        def arm_a(prob):
            return scalarize(select_pre_nms(prob, cells, sizes, per, a_n))
        dt = slope_time(arm_a, (prob,))
        print(f"select_pre_nms             : {dt*1e3:7.2f} ms")
        return

    # B: + anchors gather, decode, clip, validity
    def through_b(prob):
        sel, sel_scores, sel_deltas = select_pre_nms(
            prob, cells, sizes, per, a_n)
        sel_anchors = anchors[sel]
        proposals = bbox_transform_inv(sel_anchors, sel_deltas)
        proposals = clip_boxes(proposals, im_info[:, :2])
        av = jax.vmap(_anchor_validity)(sel_anchors, im_info)
        scores = jnp.where(av, sel_scores, NEG_INF)
        return proposals, scores
    if arm == "b":
        dt = slope_time(lambda p: scalarize(through_b(p)), (prob,))
        print(f"  + gather/decode/validity : {dt*1e3:7.2f} ms")
        return

    # C: + cross-level full top_k
    def through_c(prob):
        proposals, scores = through_b(prob)
        top_scores, top_idx = jax.lax.top_k(scores, scores.shape[1])
        top_boxes = jnp.take_along_axis(proposals, top_idx[..., None], axis=1)
        return top_boxes, top_scores
    if arm == "c":
        dt = slope_time(lambda p: scalarize(through_c(p)), (prob,))
        print(f"  + cross-level top_k      : {dt*1e3:7.2f} ms")
        return

    # D: + NMS (the full _propose tail)
    def through_d(prob):
        top_boxes, top_scores = through_c(prob)
        top_valid = top_scores > NEG_INF / 2
        keep_idx, keep_valid = nms_fixed_batched(
            top_boxes, top_scores, thresh, post, valid=top_valid,
            use_pallas=cfg.TPU.USE_PALLAS, presorted=True)
        rois = jnp.take_along_axis(top_boxes, keep_idx[..., None], axis=1)
        return rois, keep_valid
    dt = slope_time(lambda p: scalarize(through_d(p)), (prob,))
    print(f"  + NMS (full _propose)    : {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
