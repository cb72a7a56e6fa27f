#!/usr/bin/env python
"""Attribute the FPN train-forward gap (60 ms vs ~35 ms detect-path at
608x1024 B8): the train-only pieces are the per-anchor cls/box rows, the
train-mode propose (2000/level pre-NMS, cap 2000), and the two target
layers at FPN's ~117k-anchor scale.

Usage: python scripts/probe_fpn_train_fwd.py
"""

import dataclasses
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_backbone import slope_time


def main():
    from frcnn_tpu.config import default_config
    from frcnn_tpu.models import build_model
    from frcnn_tpu.models.backbones import pack_images
    from frcnn_tpu.models.targets import (anchor_target_layer,
                                          proposal_target_layer)

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, TPU=dataclasses.replace(cfg.TPU, BUCKETS=((608, 1024),)))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    B = 8
    h, w = cfg.TPU.BUCKETS[0]
    model = build_model("res50_fpn", 21, cfg, dtype=dtype)
    rng = np.random.RandomState(0)
    images = jnp.asarray(pack_images(
        rng.uniform(0, 255, (B, h, w, 3)).astype(np.float32),
        model.input_block))
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (B, 1))
    g = cfg.TPU.MAX_GT
    b0 = rng.uniform(0, 500, (B, g, 4)).astype(np.float32)
    gt_boxes = jnp.asarray(np.concatenate(
        [np.minimum(b0[..., :2], b0[..., 2:] - 16),
         np.maximum(b0[..., 2:], b0[..., :2] + 16)], -1))
    gt_labels = jnp.asarray(rng.randint(1, 21, (B, g)).astype(np.int32))
    gt_valid = jnp.asarray(rng.rand(B, g) < 0.3)
    variables = model.init(jax.random.PRNGKey(0), images[:1], im_info[:1])
    key = jax.random.PRNGKey(1)

    print(f"backend={jax.default_backend()} B={B} bucket={h}x{w}")

    def scalarize(outs):
        return sum(jnp.asarray(o, jnp.float32).ravel()[0]
                   for o in jax.tree.leaves(outs))

    # full train forward
    def tf(im):
        losses, _ = model.apply(variables, im, im_info, gt_boxes, gt_labels,
                                gt_valid, key, method="train_forward",
                                rngs={"dropout": key})
        return losses["total_loss"]
    dt = slope_time(tf, (images,))
    print(f"train_forward          : {dt*1e3:7.2f} ms")

    # pyramid + rpn (train consumption: ALL outputs incl. per-anchor rows)
    def rpn_train(im):
        def run(mdl, im):
            pyr = mdl._pyramid(im)
            cls, prob, rows, cells, _ = mdl._rpn_all_levels(pyr)
            return [cls, prob, rows] + list(cells)
        return scalarize(model.apply(variables, im, method=run))
    dt = slope_time(rpn_train, (images,))
    print(f"pyramid+rpn (train)    : {dt*1e3:7.2f} ms")

    # + train propose
    def propose_train(im):
        def run(mdl, im):
            pyr = mdl._pyramid(im)
            cls, prob, rows, cells, _ = mdl._rpn_all_levels(pyr)
            anchors = mdl._anchors(pyr)
            out = mdl._propose(pyr, jax.lax.stop_gradient(prob),
                               jax.tree.map(jax.lax.stop_gradient, cells),
                               anchors, im_info, train=True)
            return [cls, rows, out[0], out[2]]
        return scalarize(model.apply(variables, im, method=run))
    dt = slope_time(propose_train, (images,))
    print(f"  + train propose      : {dt*1e3:7.2f} ms")

    # target layers on realistic shapes (isolated)
    def anchors_of(mdl, im):
        return mdl._anchors(mdl._pyramid(im))
    anchors = model.apply(variables, images[:1], method=anchors_of)
    k_tot = anchors.shape[0]
    keys = jax.random.split(key, 2 * B)

    def at(gt, gv):
        return jax.vmap(
            lambda g_, gv_, i, k_: anchor_target_layer(
                anchors, g_, gv_, i, k_, cfg)
        )(gt, gv, im_info, keys[:B])
    dt = slope_time(lambda gt: scalarize(at(gt, gt_valid)), (gt_boxes,))
    print(f"anchor_target ({k_tot} a): {dt*1e3:7.2f} ms")

    n_roi = cfg.TRAIN.RPN_POST_NMS_TOP_N
    roisv = jnp.asarray(rng.uniform(0, 600, (B, n_roi, 4)).astype(np.float32))
    roisv = jnp.concatenate([jnp.minimum(roisv[..., :2], roisv[..., 2:]),
                             jnp.maximum(roisv[..., 2:], roisv[..., :2]) + 8],
                            axis=-1)
    rvalid = jnp.ones((B, n_roi), bool)

    def pt(rois):
        return jax.vmap(
            lambda r, rv, g_, gl, gv, k_: proposal_target_layer(
                r, rv, g_, gl, gv, k_, cfg, 21)
        )(rois, rvalid, gt_boxes, gt_labels, gt_valid, keys[B:])
    dt = slope_time(lambda r: scalarize(pt(r)), (roisv,))
    print(f"proposal_target ({n_roi}) : {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
