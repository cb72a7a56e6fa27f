#!/usr/bin/env python
"""In-situ backbone sub-profile: preprocess alone vs preprocess+trunk as the
model actually runs them in the detect pipeline (host-packed input, bf16,
fused frozen-BN stem), slope-timed on the real TPU.  Per-layer splits come
from profile_backbone.py; this script pins down the in-situ total and the
preprocess share (profile_detect.py showed backbone->C4 ≈ 17.7 ms while the
isolated parts sum to ~13.5 — this isolates where the gap lives).

Usage: python scripts/profile_backbone_insitu.py [--batch 8]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from frcnn_tpu.config import default_config
    from frcnn_tpu.models import build_model
    from frcnn_tpu.models.backbones import pack_images

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, TPU=dataclasses.replace(cfg.TPU, BUCKETS=((800, 1216),)))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    B = args.batch
    model = build_model("res50", 21, cfg, dtype=dtype)
    h, w = cfg.TPU.BUCKETS[0]
    rng = np.random.RandomState(0)
    images = jnp.asarray(pack_images(
        rng.uniform(0, 255, (B, h, w, 3)).astype(np.float32),
        getattr(model, "input_block", 1)))
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (B, 1))
    variables = model.init(jax.random.PRNGKey(0), images[:1], im_info[:1])
    print(f"backend={jax.default_backend()} batch={B} dtype={dtype.__name__} "
          f"input={images.shape}")

    def pre(im):
        return model.apply(variables, im,
                           method=lambda mdl, x: mdl._preprocess(x))

    def trunk_only(x):
        return model.apply(
            variables, x, method=lambda mdl, x: mdl.backbone.extract_features(x))

    for name, fn, inp in (
        ("preprocess", pre, images),
        ("preprocess + trunk", lambda im: trunk_only(pre(im)), images),
        ("trunk (pre-done input)", trunk_only, pre(images)),
    ):
        dt = slope_time(fn, (inp,))
        out = jax.eval_shape(fn, inp)
        print(f"{name:24s}: {dt*1e3:7.2f} ms   out={out.shape} {out.dtype}")


if __name__ == "__main__":
    main()
