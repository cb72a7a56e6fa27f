#!/usr/bin/env python
"""Attribute the FPN train-step BACKWARD (round 3): the forward stages sum
to ~37 ms at B8 608x1024 G=64 (probe_fpn_train_fwd) but the full step is
~90 ms — where do the other ~53 ms go?

Arms (each its own jit; slope-timed; run subsets via argv to bound tunnel
compiles):
  fwd     — losses only, no grad (baseline).
  full    — value_and_grad of total_loss w.r.t. all params + SGD-free
            update-less step (the train_step cost minus optimizer).
  rpnonly — grad of (rpn_cross_entropy + rpn_loss_box) only: backward
            through RPN heads + pyramid + backbone, NO pool/box-head bwd.
  roionly — grad of (cross_entropy + loss_box) only: backward through
            box head + pool + pyramid + backbone, NO RPN-head bwd.

full - fwd                = total backward cost
(rpnonly - fwd)           = rpn-loss backward chain
(roionly - fwd)           = roi-loss backward chain
overlap (both include pyramid+backbone bwd) shows conv-bwd share.

Usage: python scripts/probe_fpn_train_bwd.py [fwd full rpnonly roionly]
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

    arms = sys.argv[1:] or ["fwd", "full", "rpnonly", "roionly"]
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
    params = variables["params"]
    key = jax.random.PRNGKey(1)
    print(f"backend={jax.default_backend()} B={B} bucket={h}x{w} G={g}")

    def losses_fn(p, im):
        losses, _ = model.apply({"params": p}, im, im_info, gt_boxes,
                                gt_labels, gt_valid, key,
                                method="train_forward",
                                rngs={"dropout": key})
        return losses

    def grad_arm(pick):
        def f(p, im):
            gr = jax.grad(lambda q: pick(losses_fn(q, im)))(p)
            return sum(jnp.asarray(x, jnp.float32).ravel()[0]
                       for x in jax.tree.leaves(gr))
        return f

    defs = {
        "fwd": lambda p, im: losses_fn(p, im)["total_loss"],
        "full": grad_arm(lambda l: l["total_loss"]),
        "rpnonly": grad_arm(
            lambda l: l["rpn_cross_entropy"] + l["rpn_loss_box"]),
        "roionly": grad_arm(lambda l: l["cross_entropy"] + l["loss_box"]),
    }
    for name in arms:
        dt = slope_time(lambda im, f=defs[name]: f(params, im), (images,))
        print(f"{name:8}: {dt * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
