#!/usr/bin/env python
"""Slope-time anchor_target_layer at the FPN train shape (155k anchors,
batch 8, MAX_GT=64) and at the C4 shape, to measure the chunked-scan
overlap rewrite.  Usage: python scripts/probe_anchor_target.py [--chunk N]
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_backbone import slope_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from frcnn_tpu.config import default_config
    from frcnn_tpu.models.targets import anchor_target_layer
    from frcnn_tpu.ops.anchors import generate_anchors_pre

    cfg = default_config()
    B = args.batch
    G = cfg.TPU.MAX_GT
    rng = np.random.RandomState(0)

    for name, strides, hw in (
        ("fpn 608x1024", (4, 8, 16, 32, 64), (608, 1024)),
        ("c4 608x1024", (16,), (608, 1024)),
    ):
        anchors = []
        for s in strides:
            a, _ = generate_anchors_pre(hw[0] // s, hw[1] // s, s,
                                        scales=(8.0,) if len(strides) > 1
                                        else (8.0, 16.0, 32.0))
            anchors.append(a)
        anchors = jnp.concatenate(anchors, axis=0)
        k = anchors.shape[0]

        xy = rng.uniform(0, 500, (B, G, 2, 2)).astype(np.float32)
        gt = np.concatenate([xy.min(2), xy.max(2) + 16], axis=-1)
        gt_boxes = jnp.asarray(gt)
        gt_valid = jnp.asarray(rng.rand(B, G) < 0.3)
        im_info = jnp.tile(jnp.asarray([[hw[0], hw[1], 1.0]], jnp.float32),
                           (B, 1))
        keys = jax.random.split(jax.random.PRNGKey(0), B)

        import dataclasses

        for label, c in (("dense", dataclasses.replace(
                              cfg, TPU=dataclasses.replace(
                                  cfg.TPU, USE_PALLAS=False))),
                         ("pallas", cfg)):
            def run(gt_boxes, gt_valid, im_info, keys, c=c):
                at = jax.vmap(
                    lambda g, gv, i, kk: anchor_target_layer(
                        anchors, g, gv, i, kk, c)
                )(gt_boxes, gt_valid, im_info, keys)
                return at.bbox_targets

            dt = slope_time(run, (gt_boxes, gt_valid, im_info, keys))
            print(f"{name} [{label}]: K={k} B={B} G={G}  "
                  f"anchor_target {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
