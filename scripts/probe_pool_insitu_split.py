#!/usr/bin/env python
"""Split the FPN pool's in-situ-vs-isolated gap (PROFILE_r04 §4/§7a,
round-5 item): is the +10.3 ms in-situ pool delta (isolated: 7.7)
(a) roi-DATA dependence (level assignment / gather locality of the real
propose output) or (b) co-scheduling/layout tax of running inside the
full graph?

Three same-process arms at 800×1216 B8, each slope-timed:
  1. prefix through propose (baseline);
  2. + pool on the REAL propose rois (the production path);
  3. + pool on CONSTANT balanced rois (propose outputs still consumed, so
     nothing is DCE'd; the pool's grid work is identical — only the roi
     values/levels differ).

(2)−(1) vs (3)−(1) separates data from structure: if (3) ≈ isolated-7.7,
the gap is roi-data; if both ≈ 10.3, the gap is structural co-scheduling.

Usage: python scripts/probe_pool_insitu_split.py
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

    h, w = 800, 1216
    b = 8
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        TEST=dataclasses.replace(cfg.TEST, SCALES=(800,), MAX_SIZE=1333),
        TPU=dataclasses.replace(cfg.TPU, BUCKETS=((h, w),)),
    )
    model = build_model("res50_fpn", 21, cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    images = jnp.asarray(pack_images(
        rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32),
        getattr(model, "input_block", 1)))
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (b, 1))
    variables = model.init(jax.random.PRNGKey(0), images[:1], im_info[:1])

    n = cfg.TEST.RPN_POST_NMS_TOP_N
    # balanced constant rois, same distribution as probe_pool_800
    rois_list = []
    for _ in range(b):
        lv = rng.randint(0, 4, n)
        s = 224.0 * (2.0 ** (lv - 4)) * rng.uniform(0.7, 1.4, n)
        a = np.exp(rng.uniform(-0.8, 0.8, n))
        w_ = s * np.sqrt(a)
        h_ = s / np.sqrt(a)
        x1 = rng.uniform(0, w - w_ - 1)
        y1 = rng.uniform(0, h - h_ - 1)
        rois_list.append(np.stack([x1, y1, x1 + w_, y1 + h_], -1))
    const_rois = jnp.asarray(np.stack(rois_list), jnp.float32)

    def prefix_propose(mdl, im):
        pyr = mdl._pyramid(im)
        _, prob, _, cells, _ = mdl._rpn_all_levels(pyr)
        anchors = mdl._anchors(pyr)
        rois, scores, valid = mdl._propose(pyr, prob, cells, anchors,
                                           im_info, train=False)
        return rois, scores

    def prefix_pool_real(mdl, im):
        pyr = mdl._pyramid(im)
        _, prob, _, cells, _ = mdl._rpn_all_levels(pyr)
        anchors = mdl._anchors(pyr)
        rois, scores, valid = mdl._propose(pyr, prob, cells, anchors,
                                           im_info, train=False)
        return mdl._pool(pyr, rois), scores

    def prefix_pool_const(mdl, im):
        pyr = mdl._pyramid(im)
        _, prob, _, cells, _ = mdl._rpn_all_levels(pyr)
        anchors = mdl._anchors(pyr)
        rois, scores, valid = mdl._propose(pyr, prob, cells, anchors,
                                           im_info, train=False)
        # keep propose alive through scores; pool sees constant rois
        return mdl._pool(pyr, const_rois), scores, rois[:, 0, 0]

    print(f"backend={jax.default_backend()}")
    results = {}
    for name, meth in (("propose", prefix_propose),
                       ("pool_real", prefix_pool_real),
                       ("pool_const", prefix_pool_const)):
        def fn(im, meth=meth):
            outs = model.apply(variables, im, method=meth)
            return sum(jnp.sum(jnp.asarray(o, jnp.float32))
                       for o in jax.tree.leaves(outs))
        dt = slope_time(fn, (images,)) * 1e3
        results[name] = dt
        print(f"{name:10s}: {dt:7.2f} ms")
    print(f"pool delta REAL rois : {results['pool_real']-results['propose']:6.2f} ms")
    print(f"pool delta CONST rois: {results['pool_const']-results['propose']:6.2f} ms")


if __name__ == "__main__":
    main()
