#!/usr/bin/env python
"""Isolate the FPN pool backward cost at the train shape (608x1024, B8,
128 rois/img): the gather-based forward's VJP is an XLA scatter-add.

  A) roi_align_multilevel (shipped fwd)      — fwd and fwd+bwd
  B) old masked per-level roi_align_gather   — fwd+bwd (what round-2d had)
  C) per-level Pallas matmul-form roi_align  — fwd+bwd (custom VJP; the
     candidate backward donor)

Usage: python scripts/probe_pool_backward.py
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_backbone import slope_time
from frcnn_tpu.ops.roi_align import roi_align_multilevel, roi_align_gather

LEVELS = [(152, 256), (76, 128), (38, 64), (19, 32)]
STRIDES = [4, 8, 16, 32]
B, R, C = 8, 128, 256
P, SR = 7, 2


def make_inputs(rng):
    feats = [jnp.asarray(rng.randn(B, h, w, C), jnp.bfloat16) for h, w in LEVELS]
    rois, lvls = [], []
    for _ in range(B):
        lv = rng.randint(0, 4, R)
        s = 224.0 * (2.0 ** (lv - 4)) * rng.uniform(0.7, 1.4, R)
        a = np.exp(rng.uniform(-0.5, 0.5, R))
        w_ = s * np.sqrt(a); h_ = s / np.sqrt(a)
        x1 = rng.uniform(0, 1024 - w_ - 1); y1 = rng.uniform(0, 608 - h_ - 1)
        rois.append(np.stack([x1, y1, x1 + w_, y1 + h_], -1))
        lvls.append(lv)
    return feats, jnp.asarray(np.stack(rois), jnp.float32), jnp.asarray(np.stack(lvls), jnp.int32)


def pool_ml(feats, rois, levels):
    return jax.vmap(lambda fs, r, lv: roi_align_multilevel(
        fs, r, lv, strides=STRIDES, output_size=P, sampling_ratio=SR))(
        feats, rois, levels)


def pool_masked(feats, rois, levels):
    out = None
    for li, (f, s) in enumerate(zip(feats, STRIDES)):
        pooled = jax.vmap(lambda ff, rr: roi_align_gather(
            ff, rr, output_size=P, spatial_scale=1.0 / s, sampling_ratio=SR)
        )(f, rois)
        m = (levels == li)[..., None, None, None]
        out = pooled * m if out is None else out + pooled * m
    return out


def pool_pallas(feats, rois, levels):
    from frcnn_tpu.ops.pallas.roi_align_kernel import roi_align_pallas
    out = None
    for li, (f, s) in enumerate(zip(feats, STRIDES)):
        pooled = jax.vmap(lambda ff, rr: roi_align_pallas(
            ff, rr, P, 1.0 / s, SR))(f, rois)
        m = (levels == li)[..., None, None, None]
        out = pooled * m if out is None else out + pooled * m
    return out


def main():
    rng = np.random.RandomState(0)
    feats, rois, levels = make_inputs(rng)
    print(f"backend={jax.default_backend()} B={B} R={R} C={C} levels={LEVELS}")

    # NOTE: variant C (matmul-form Pallas kernel per level) OOMs on P2:
    # 175 MB VMEM demand vs the chip's 128 MB — the kernel's scratch scales
    # with level area.  It would need CHAN_BLOCK <= 64 at P2 to fit.
    for name, fn in (("A multilevel", pool_ml), ("B masked    ", pool_masked),
                     ("C pallas    ", pool_pallas)):
        try:
            dt = slope_time(
                lambda *f: fn(list(f), rois, levels).astype(jnp.float32),
                tuple(feats))
            print(f"{name} fwd    : {dt*1e3:8.2f} ms")

            def loss(*f):
                return jnp.sum(fn(list(f), rois, levels).astype(jnp.float32))

            def fwdbwd(*f):
                g = jax.grad(loss, argnums=tuple(range(len(f))))(*f)
                return sum(jnp.asarray(x, jnp.float32).ravel()[0] for x in g)
            dt = slope_time(fwdbwd, tuple(feats))
            print(f"{name} fwd+bwd: {dt*1e3:8.2f} ms")
        except Exception as e:  # noqa: BLE001 — probe must survive OOMs
            print(f"{name} FAILED : {str(e).splitlines()[0][:100]}")


if __name__ == "__main__":
    main()
