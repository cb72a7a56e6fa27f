#!/usr/bin/env python
"""Slope-time anchor_target_layer at the FPN train shape (155k anchors,
batch 8, MAX_GT=64) and at the C4 shape, A/B-ing the dense (K, G) overlap
form vs the fused Pallas reduction kernel.  --parts additionally times the
layer's sub-stages at FPN scale (the probe that exposed the 5.2 ms
gt-row gather → one-hot-matmul fix).  Usage:
python scripts/probe_anchor_target.py [--batch N] [--parts]
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_backbone import slope_time


def parts(B=8, K=155472, G=64):
    """Sub-stage slopes at FPN scale: IoU kernel, subsampling, and the
    targets/weights epilogue (incl. gather-vs-one-hot for the gt-row
    fetch)."""
    from frcnn_tpu.models.targets import _subsample_mask
    from frcnn_tpu.ops.boxes import bbox_transform
    from frcnn_tpu.ops.pallas.overlap_kernel import anchor_overlap_stats

    rng = np.random.RandomState(0)
    anchors = rng.uniform(0, 800, (K, 4)).astype(np.float32)
    anchors[:, 2:] += anchors[:, :2]
    anchors = jnp.asarray(anchors)
    gt = rng.uniform(0, 700, (B, G, 4)).astype(np.float32)
    gt[..., 2:] += 20
    gt = jnp.asarray(gt)
    gtv = jnp.asarray(rng.rand(B, G) > 0.5)
    inside = jnp.asarray(rng.rand(B, K) > 0.2)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    labels = jnp.asarray(rng.randint(-1, 2, (B, K)).astype(np.int32))
    am = jnp.asarray(rng.randint(0, G, (B, K)).astype(np.int32))

    dt = slope_time(lambda g, v, i: jax.vmap(
        lambda gg, vv, ii: anchor_overlap_stats(anchors, gg, vv, ii)
    )(g, v, i)[0], (gt, gtv, inside))
    print(f"IoU kernel           : {dt*1e3:7.2f} ms")

    dt = slope_time(lambda l, k: jax.vmap(
        lambda lab, kk: _subsample_mask(lab == 1, 128, 128, kk)
    )(l, k), (labels, keys))
    print(f"subsample (one)      : {dt*1e3:7.2f} ms")

    dt = slope_time(lambda a, g: jax.vmap(lambda aa, gg: gg[aa])(a, g),
                    (am, gt))
    print(f"gt-row GATHER        : {dt*1e3:7.2f} ms   (the old form)")

    def onehot(a, g):
        def one(aa, gg):
            oh = (aa[:, None] == jnp.arange(G)[None, :]).astype(gg.dtype)
            return bbox_transform(anchors, oh @ gg)
        return jax.vmap(one)(a, g)
    dt = slope_time(onehot, (am, gt))
    print(f"one-hot matmul + enc : {dt*1e3:7.2f} ms   (shipped)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--parts", action="store_true")
    args = ap.parse_args()
    if args.parts:
        parts(args.batch)
        return

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
