#!/usr/bin/env python
"""Per-backbone end-to-end detect throughput on one chip.

Completeness sweep over every backbone the framework ships (reference
lineage: vgg16 / res50 / res101 / res152 / mobile, SURVEY.md §2.2, plus the
beyond-reference FPN variants), same fused-detect pipeline and slope
methodology as bench.py.  Default bucket 608x1024 (shorter-side-600
reference test scale); pass nets as argv to subset (compiles are ~5 min
each on the tunnel — run arms separately when iterating).
"""

import dataclasses
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from frcnn_tpu.config import default_config
from frcnn_tpu.models import build_model
from frcnn_tpu.models.backbones import pack_images

ALL_NETS = ("mobile", "vgg16", "res50", "res101", "res152", "res50_fpn")


def main():
    args = sys.argv[1:]
    bucket = (608, 1024)
    if args and args[0] == "--bucket":  # e.g. --bucket 800x1216
        bucket = tuple(int(v) for v in args[1].split("x"))
        args = args[2:]
    nets = args or ALL_NETS
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batch = 8 if on_tpu else 1
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, TPU=dataclasses.replace(cfg.TPU, BUCKETS=(bucket,)))
    h, w = cfg.TPU.BUCKETS[0]
    rng = np.random.RandomState(0)
    raw = rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32)
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (batch, 1))

    for net in nets:
        model = build_model(net, 21, cfg, dtype=dtype)
        images = jnp.asarray(pack_images(raw, getattr(model, "input_block", 1)))
        variables = model.init(jax.random.PRNGKey(0), images[:1], im_info[:1])

        @jax.jit
        def loop(v, im0, ii, n):
            def body(i, carry):
                im, acc = carry
                det, _ = model.apply(v, im, ii, method="detect")
                s = jnp.sum(det[:, 0, 0])
                return im + s * 0.0, acc + s
            return jax.lax.fori_loop(0, n, body, (im0, 0.0))

        _ = np.asarray(loop(variables, images, im_info, 2)[1])
        n_lo, n_hi = (4, 12) if on_tpu else (1, 2)
        times = {}
        for n in (n_lo, n_hi):
            t0 = time.perf_counter()
            _ = np.asarray(loop(variables, images, im_info, n)[1])
            times[n] = time.perf_counter() - t0
        dt = (times[n_hi] - times[n_lo]) / (n_hi - n_lo)
        print(f"{net:10}  {dt / batch * 1e3:7.2f} ms/img  "
              f"({batch / dt:6.1f} img/s)  [batch {batch}, {h}x{w}]",
              flush=True)


if __name__ == "__main__":
    main()
