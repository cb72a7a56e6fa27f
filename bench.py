#!/usr/bin/env python
"""Benchmark: end-to-end detection throughput on one TPU chip.

North-star config (BASELINE.json): ResNet-50 C4, 800px, full fused pipeline
(in-graph preprocessing → backbone → RPN → proposal NMS (Pallas) → RoIAlign
(Pallas) → box head → per-class NMS → top-k), batch 8, bfloat16 trunk.

Baseline: the reference's CPU throughput at the same config, measured with
scripts/torch_cpu_baseline.py on this machine = 0.1538 images/sec
(6.5 s/image; see BASELINE.md).  The north-star asks for >= 10x that.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

TORCH_CPU_BASELINE_IPS = 0.1538  # measured 2026-08-16, scripts/torch_cpu_baseline.py


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from frcnn_tpu.config import default_config
    from frcnn_tpu.models import build_model

    cfg = default_config()
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        TEST=dataclasses.replace(cfg.TEST, SCALES=(800,), MAX_SIZE=1333),
        TPU=dataclasses.replace(cfg.TPU, BUCKETS=((800, 1216),)),
    )
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batch = 8 if on_tpu else 1

    model = build_model("res50", 21, cfg, dtype=dtype)
    h, w = cfg.TPU.BUCKETS[0]
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32))
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (batch, 1))

    variables = model.init(jax.random.PRNGKey(0), images[:1], im_info[:1])
    detect = jax.jit(lambda v, im, ii: model.apply(v, im, ii, method="detect"))

    # warmup / compile
    d, valid = detect(variables, images, im_info)
    jax.block_until_ready((d, valid))

    iters = 20 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        d, valid = detect(variables, images, im_info)
    jax.block_until_ready((d, valid))
    dt = (time.perf_counter() - t0) / iters
    ips = batch / dt

    print(json.dumps({
        "metric": "images_per_sec_per_chip (ResNet-50 C4, 800x1216, batch "
                  f"{batch}, end-to-end fused detect)",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / TORCH_CPU_BASELINE_IPS, 2),
    }))


if __name__ == "__main__":
    main()
