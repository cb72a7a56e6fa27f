#!/usr/bin/env python
"""Same-process interleaved A/B of cfg.TPU.THRESHOLD_SELECT (the exact
threshold-select Pallas kernel vs plain lax.top_k) on the production
graphs.  Cross-process variance on the tunnel is ±3-4%, so sub-ms propose
effects are decided ONLY this way (NEXT.md doctrine).

Arms (both compiled once, then slope-timed interleaved):
  * res50_fpn detect  800x1216 B8   (P2/P3 select k=1000 + NMS path)
  * res50 C4  detect  800x1216 B8   (bench.py headline: select k=6000)
  * res50_fpn train fwd-only 608x1024 B8 G=64 with --train (select k=2000
    x2 levels + two 256-of-155k sampler selects; fwd only — the full-step
    A/B would cost 2 x ~25 min compiles)

Usage: python scripts/ab_threshold_select.py [--rounds 5] [--train]
"""

import argparse
import dataclasses
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_backbone import slope_time


def build_detect(net, bucket, batch, thresh_flag):
    from frcnn_tpu.config import default_config
    from frcnn_tpu.models import build_model
    from frcnn_tpu.models.backbones import pack_images

    h, w = bucket
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        TEST=dataclasses.replace(cfg.TEST, SCALES=(800,), MAX_SIZE=1333),
        TPU=dataclasses.replace(cfg.TPU, BUCKETS=((h, w),),
                                THRESHOLD_SELECT=thresh_flag),
    )
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = build_model(net, 21, cfg, dtype=dtype)
    rng = np.random.RandomState(0)
    images = jnp.asarray(pack_images(
        rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32),
        getattr(model, "input_block", 1)))
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (batch, 1))
    variables = model.init(jax.random.PRNGKey(0), images[:1], im_info[:1])

    def run(im):
        det, _ = model.apply(variables, im, im_info, method="detect")
        return det
    return run, images


def build_train_fwd(net, bucket, batch, thresh_flag):
    from frcnn_tpu.config import default_config
    from frcnn_tpu.models import build_model
    from frcnn_tpu.models.backbones import pack_images

    h, w = bucket
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, TPU=dataclasses.replace(cfg.TPU, BUCKETS=((h, w),),
                                     THRESHOLD_SELECT=thresh_flag))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = build_model(net, 21, cfg, dtype=dtype)
    rng = np.random.RandomState(0)
    g = cfg.TPU.MAX_GT
    images = jnp.asarray(pack_images(
        rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32),
        getattr(model, "input_block", 1)))
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (batch, 1))
    gt = jnp.asarray(np.sort(rng.uniform(0, 600, (batch, g, 2, 2)), axis=2)
                     .transpose(0, 1, 3, 2).reshape(batch, g, 4)
                     .astype(np.float32))
    gl = jnp.asarray(rng.randint(1, 21, (batch, g)), jnp.int32)
    gv = jnp.asarray(np.arange(g)[None, :] < 12).repeat(batch, 0)
    variables = model.init(jax.random.PRNGKey(0), images[:1], im_info[:1])
    key = jax.random.PRNGKey(7)

    def run(im):
        losses, _ = model.apply(variables, im, im_info, gt, gl, gv, key,
                                method="train_forward",
                                rngs={"dropout": jax.random.PRNGKey(1)})
        return losses["total_loss"]
    return run, images


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--train", action="store_true")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()}")

    arms = {}
    specs = [("fpn-detect-800", lambda f: build_detect("res50_fpn", (800, 1216), 8, f)),
             ("c4-detect-800", lambda f: build_detect("res50", (800, 1216), 8, f))]
    if args.train:
        specs.append(("fpn-trainfwd-608",
                      lambda f: build_train_fwd("res50_fpn", (608, 1024), 8, f)))

    for name, build in specs:
        for flag in (True, False):
            fn, images = build(flag)
            tag = f"{name}-{'kernel' if flag else 'topk'}"
            arms[tag] = (fn, images)
            # compile + warm via one slope call (discarded)
            _ = slope_time(fn, (images,), n_lo=2, n_hi=3)
            print(f"  compiled {tag}")

    results = {t: [] for t in arms}
    for rnd in range(args.rounds):
        for tag, (fn, images) in arms.items():
            results[tag].append(slope_time(fn, (images,)) * 1e3)
    for name, _ in specs:
        a = min(results[f"{name}-kernel"])
        b = min(results[f"{name}-topk"])
        print(f"{name}: kernel best {a:.3f} ms | topk best {b:.3f} ms | "
              f"delta {b - a:+.3f} ms ({(b - a) / b * 100:+.2f}%)")
        for v in ("kernel", "topk"):
            print(f"    {v}: " + " ".join(f"{x:.3f}"
                                          for x in results[f"{name}-{v}"]))


if __name__ == "__main__":
    main()
