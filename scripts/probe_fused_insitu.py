#!/usr/bin/env python
"""Same-process A/B: full fused-detect pipeline and isolated trunk with
FUSED_RESNET_BLOCKS on vs off (run-to-run chip variance makes cross-process
comparisons unreliable; see docs/PROFILE_r02.md section 1)."""

import dataclasses
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from frcnn_tpu.config import default_config
from frcnn_tpu.models import build_model
from frcnn_tpu.models.backbones import pack_images
from profile_backbone import slope_time


def build(fused):
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        TEST=dataclasses.replace(cfg.TEST, SCALES=(800,), MAX_SIZE=1333),
        TPU=dataclasses.replace(cfg.TPU, BUCKETS=((800, 1216),),
                                FUSED_RESNET_BLOCKS=fused),
    )
    model = build_model("res50", 21, cfg, dtype=jnp.bfloat16)
    return cfg, model


def main():
    rng = np.random.RandomState(0)
    h, w, batch = 800, 1216, 8
    images = jnp.asarray(pack_images(
        rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32), 4))
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (batch, 1))

    from frcnn_tpu.models import backbones as bb

    only = [a for a in sys.argv[1:] if a != "--no-trunk"]
    no_trunk = "--no-trunk" in sys.argv
    # (label, FUSED_RESNET_BLOCKS, FUSED_MAX_CH): off / shipped gate (narrow
    # stages only) / every eligible stage
    for label, fused, max_ch in (("off", False, bb.FUSED_MAX_CH),
                                 ("gated128", True, 128),
                                 ("full", True, 10**9)):
        if only and label not in only:
            continue
        bb.FUSED_MAX_CH = max_ch
        cfg, model = build(fused)
        variables = model.init(jax.random.PRNGKey(0), images[:1], im_info[:1])

        def detect(im, ii):
            det, _ = model.apply(variables, im, ii, method="detect")
            return det

        def trunk(im, ii):
            from frcnn_tpu.models.backbones import preprocess_images
            x = preprocess_images(im, cfg, jnp.bfloat16)
            return model.backbone.apply(
                {"params": variables["params"]["backbone"]}, x,
                method="extract_features")

        t_det = slope_time(detect, (images, im_info))
        t_trunk = float("nan") if no_trunk else slope_time(trunk,
                                                           (images, im_info))
        print(f"{label:9}  detect {t_det * 1e3:6.2f} ms "
              f"({batch / t_det:6.1f} img/s)   trunk {t_trunk * 1e3:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
