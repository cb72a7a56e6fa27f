#!/usr/bin/env python
"""A/B probe: fused Pallas bottleneck vs XLA convs at the detect shapes.

Slope-times one bottleneck block both ways (docs/PROFILE_r02.md section 2
methodology) at the layer1/layer2 shapes of the 800x1216 batch-8 pipeline,
and checks bf16 parity.  Decision input for wiring the fused kernel into
_ResNetTrunk.
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from frcnn_tpu.ops.pallas.fused_block import (bottleneck_reference,
                                              fused_bottleneck, pick_row_tile)
from profile_backbone import slope_time

CASES = [
    # name, B, H, W, Cin, mid, Cout, has_ds
    ("layer1/block0 (ds)", 8, 200, 304, 64, 64, 256, True),
    ("layer1/identity", 8, 200, 304, 256, 64, 256, False),
    ("layer2/identity", 8, 100, 152, 512, 128, 512, False),
    ("layer3/identity", 8, 50, 76, 1024, 256, 1024, False),
]


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    for name, b, h, w, cin, mid, cout, has_ds in CASES:
        x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32) * 0.5, dt)
        w1, b1 = (jnp.asarray(rng.randn(cin, mid).astype(np.float32) * 0.1),
                  jnp.asarray(rng.randn(mid).astype(np.float32) * 0.1))
        w2 = jnp.asarray(rng.randn(3, 3, mid, mid).astype(np.float32) * 0.05)
        b2 = jnp.asarray(rng.randn(mid).astype(np.float32) * 0.1)
        w3, b3 = (jnp.asarray(rng.randn(mid, cout).astype(np.float32) * 0.05),
                  jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1))
        wds = bds = None
        if has_ds:
            wds = jnp.asarray(rng.randn(cin, cout).astype(np.float32) * 0.1)
            bds = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)

        args_ref = (x, w1, b1, w2, b2, w3, b3, wds, bds)
        args_fus = (x, w1, b1, w2.reshape(9 * mid, mid), b2, w3, b3, wds, bds)

        ref = jax.jit(bottleneck_reference)(*args_ref)
        got = jax.jit(fused_bottleneck)(*args_fus)
        r32, g32 = np.asarray(ref, np.float32), np.asarray(got, np.float32)
        rel = np.max(np.abs(r32 - g32)) / max(np.max(np.abs(r32)), 1e-6)

        flops = 2 * b * h * w * mid * (cin + 9 * mid + cout
                                       + (cin * cout // mid if has_ds else 0))
        t_ref = slope_time(lambda *a: bottleneck_reference(*a), args_ref)
        t_fus = slope_time(lambda *a: fused_bottleneck(*a), args_fus)
        print(f"{name:22s} rh={pick_row_tile(h, w, mid):2d} rel_err={rel:.2e} "
              f"xla {t_ref * 1e3:6.2f} ms ({flops / t_ref / 1e12:5.1f} TF/s)  "
              f"fused {t_fus * 1e3:6.2f} ms ({flops / t_fus / 1e12:5.1f} TF/s)"
              f"  speedup {t_ref / t_fus:4.2f}x")


if __name__ == "__main__":
    main()
