#!/usr/bin/env python
"""A/B the FPN pool forms at the 800x1216 bucket (P2 = 200x304, c=256).

The x-first matmul-form level kernels blow v5e VMEM at this bucket (P2
wants ~180 MB at cb=128); level_tile_params instead drops the roi tile to
8 and switches to the transpose-free y-first variant (channel blocks below
128 are lane-illegal, so cb stays 128).  This probe checks parity of
fwd + bwd vs the gather form on the chip and slope-times both.

Usage: python scripts/probe_pool_800.py [--rois 300]
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_backbone import slope_time

P, SR = 7, 2
C = 256
LEVELS = [(200, 304), (100, 152), (50, 76), (25, 38)]
STRIDES = [4, 8, 16, 32]
B = 8


def make_inputs(rng, r):
    feats = [jnp.asarray(rng.randn(B, h, w, C), jnp.bfloat16)
             for h, w in LEVELS]
    rois, lvls = [], []
    for _ in range(B):
        lv = rng.randint(0, 4, r)
        s = 224.0 * (2.0 ** (lv - 4)) * rng.uniform(0.7, 1.4, r)
        a = np.exp(rng.uniform(-0.8, 0.8, r))
        w_ = s * np.sqrt(a)
        h_ = s / np.sqrt(a)
        x1 = rng.uniform(0, 1216 - w_ - 1)
        y1 = rng.uniform(0, 800 - h_ - 1)
        rois.append(np.stack([x1, y1, x1 + w_, y1 + h_], -1))
        lvls.append(lv)
    return (feats, jnp.asarray(np.stack(rois), jnp.float32),
            jnp.asarray(np.stack(lvls), jnp.int32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rois", type=int, default=300)
    args = ap.parse_args()

    from frcnn_tpu.ops.roi_align import (multilevel_pallas_fits,
                                         roi_align_multilevel,
                                         roi_align_multilevel_pallas,
                                         _level_roi_tile)

    for hw in LEVELS:
        print(f"  level {hw}: tile params {_level_roi_tile(*hw, C)}")
    assert multilevel_pallas_fits(LEVELS, C), "still gated off!"

    rng = np.random.RandomState(0)
    feats, rois, levels = make_inputs(rng, args.rois)

    def run(pool_fn, fs, r, lv):
        return jax.vmap(
            lambda f, rr, ll: pool_fn(f, rr, ll, strides=STRIDES,
                                      output_size=P, sampling_ratio=SR)
        )(fs, r, lv)

    def loss(pool_fn, fs, r, lv):
        out = run(pool_fn, fs, r, lv)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    # -- parity ---------------------------------------------------------------
    a = np.asarray(jax.jit(lambda *x: run(roi_align_multilevel, *x))(
        feats, rois, levels), np.float32)
    b = np.asarray(jax.jit(lambda *x: run(roi_align_multilevel_pallas, *x))(
        feats, rois, levels), np.float32)
    err = np.max(np.abs(a - b))
    print(f"fwd parity: max abs err {err:.2e} (bf16 scale ~{np.abs(a).max():.1f})")

    ga = jax.jit(jax.grad(lambda f, r, l: loss(roi_align_multilevel, f, r, l)))(
        feats, rois, levels)
    gb = jax.jit(jax.grad(
        lambda f, r, l: loss(roi_align_multilevel_pallas, f, r, l)))(
        feats, rois, levels)
    for i, (x, y) in enumerate(zip(ga, gb)):
        x, y = np.asarray(x, np.float32), np.asarray(y, np.float32)
        denom = max(np.abs(x).max(), 1e-6)
        cc = np.corrcoef(x.ravel(), y.ravel())[0, 1] if x.std() > 0 else 1.0
        print(f"bwd level {i}: rel err {np.abs(x - y).max() / denom:.2e} "
              f"corr {cc:.6f}")

    # -- timing ---------------------------------------------------------------
    for name, fn in (("gather", roi_align_multilevel),
                     ("pallas", roi_align_multilevel_pallas)):
        def fwd_once(f0, f1, f2, f3, r, l, fn=fn):
            return run(fn, [f0, f1, f2, f3], r, l)

        t = slope_time(fwd_once,
                       (feats[0], feats[1], feats[2], feats[3], rois, levels))
        print(f"{name} fwd: {t * 1e3:.2f} ms")

        def bwd_once(f0, f1, f2, f3, r, l, fn=fn):
            gs = jax.grad(lambda a0, a1, a2, a3: loss(
                fn, [a0, a1, a2, a3], r, l), argnums=(0, 1, 2, 3))(
                f0, f1, f2, f3)
            # reduce to one scalar so the slope loop's data dependency
            # forces every grad leaf (no DCE)
            return sum(jnp.asarray(g, jnp.float32).ravel()[0] for g in gs)

        t = slope_time(bwd_once,
                       (feats[0], feats[1], feats[2], feats[3], rois, levels))
        print(f"{name} fwd+bwd: {t * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
