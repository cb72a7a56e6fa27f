#!/usr/bin/env python
"""On-chip bit-identity certificate for the PADDED deferred-unsort pool.

Round 5 (late): ``roi_align_multilevel_pallas_sorted`` returns the
roi-tile-PADDED (R_pad, p, p, C) rows instead of slicing back to R — the
R_pad→R slice of a pallas custom-call output is a full copy of the ~60 MB
pooled tensor (PROFILE_r05 §5's pool in-situ residual).  The box head is
row-equivariant, so the caller's take(head_out, inv) both un-sorts and
drops the pad rows: the wiring must be BIT-identical to the plain pallas
pool (in-place unsort, sliced), which shares every kernel.

Two arms, both through the real model methods (the plain arm monkeypatches
FPN._pool to defer_unsort=False so every other line is shared):

  predict  — res50_fpn 800x1216 (detect shape; N=300 → N_pad=304)
  train    — res50_fpn_gn 512x640 B2 (G=64 is a tile multiple → no pads;
             pins that the r_pad==R case stays bit-identical too)

A pallas-vs-GATHER comparison is NOT a valid oracle here (bf16 pool deltas
legitimately flip NMS keeps — PROFILE_r05 §5); pallas-vs-pallas is.

RESULT (2026-08-21, on chip): FPN predict (all five outputs) and FPN
train (all five losses) bit-identical → shipped.  The C4 arm (--only c4,
roi_align_pallas pad_rows through the res50 layer4 head) FAILED the gate:
rois/scores/valid identical but cls_prob/bbox_pred mismatch — layer4's
convs recompile at B·N_pad=608 rows with different tiling than at 600, an
accumulation-order (ulp) effect the FPN's pure row-tiled matmul head does
not have.  Benign but not certifiable ⇒ the C4 wiring was REVERTED
(network.py keeps the slice; ops keep pad_rows + this probe as the
witness for any retry with a shape-pinned head).

Usage: python scripts/probe_pool_pad_identity.py [--batch 2] [--only fpn|c4]
"""

import argparse
import dataclasses
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build(net, h, w, b, num_classes=21):
    from frcnn_tpu.config import default_config
    from frcnn_tpu.models import build_model
    from frcnn_tpu.models.backbones import pack_images

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        TEST=dataclasses.replace(cfg.TEST, SCALES=(min(h, w),), MAX_SIZE=max(h, w)),
        TPU=dataclasses.replace(cfg.TPU, BUCKETS=((h, w),)),
    )
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = build_model(net, num_classes, cfg, dtype=dtype)
    rng = np.random.RandomState(0)
    images = jnp.asarray(pack_images(
        rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32),
        getattr(model, "input_block", 1)))
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (b, 1))
    variables = model.init(jax.random.PRNGKey(0), images[:1], im_info[:1])
    return model, variables, images, im_info


class plain_pool:
    """Context manager: force FPN._pool back to the in-place-unsort form."""

    def __enter__(self):
        from frcnn_tpu.models.fpn import FasterRCNNFPN as FPN

        self._orig = FPN._pool

        def pool(mdl, pyramid, rois, defer_unsort=False):
            out = self._orig(mdl, pyramid, rois, defer_unsort=False)
            return (out, None) if defer_unsort else out

        FPN._pool = pool
        return self

    def __exit__(self, *exc):
        from frcnn_tpu.models.fpn import FasterRCNNFPN as FPN

        FPN._pool = self._orig


def check_predict(batch):
    model, variables, images, im_info = build("res50_fpn", 800, 1216, batch)

    def run(im, info):
        return model.apply(variables, im, info, method="predict")

    prod = jax.device_get(jax.jit(run)(images, im_info))
    with plain_pool():
        plain = jax.device_get(jax.jit(lambda im, info: model.apply(
            variables, im, info, method="predict"))(images, im_info))
    ok = True
    for k in sorted(prod):
        same = np.array_equal(np.asarray(prod[k]), np.asarray(plain[k]))
        print(f"  predict[{k}]: shape {np.asarray(prod[k]).shape} "
              f"{'bit-identical' if same else 'MISMATCH'}")
        ok &= same
    return ok


def check_train(batch):
    model, variables, images, im_info = build("res50_fpn_gn", 512, 640, batch)
    rng = np.random.RandomState(1)
    g = rng.uniform(20, 400, (batch, 8, 4)).astype(np.float32)
    gt = jnp.asarray(np.concatenate(
        [np.minimum(g[..., :2], g[..., 2:]),
         np.maximum(g[..., :2], g[..., 2:]) + 16.0], axis=-1))
    gl = jnp.asarray(rng.randint(1, 21, (batch, 8)).astype(np.int32))
    gv = jnp.ones((batch, 8), bool)
    key = jax.random.PRNGKey(7)

    def run(im, info):
        losses, _ = model.apply(variables, im, info, gt, gl, gv, key,
                                method="train_forward")
        return losses

    prod = jax.device_get(jax.jit(run)(images, im_info))
    with plain_pool():
        plain = jax.device_get(jax.jit(lambda im, info: model.apply(
            variables, im, info, gt, gl, gv, key,
            method="train_forward")[0])(images, im_info))
    ok = True
    for k in sorted(prod):
        same = np.array_equal(np.asarray(prod[k]), np.asarray(plain[k]))
        print(f"  train[{k}]: prod {float(prod[k]):.6f}  plain "
              f"{float(plain[k]):.6f}  "
              f"{'bit-identical' if same else 'MISMATCH'}")
        ok &= same
    return ok


def check_c4(batch):
    """C4 (single-level roi_align_pallas pad_rows): prod predict vs the
    pad_rows=False wiring — shares every kernel, must be bit-identical."""
    import frcnn_tpu.models.network as net_mod

    model, variables, images, im_info = build("res50", 800, 1216, batch)

    prod = jax.device_get(jax.jit(lambda im, info: model.apply(
        variables, im, info, method="predict"))(images, im_info))
    orig = net_mod.extract_roi_features
    net_mod.extract_roi_features = (
        lambda *a, **k: orig(*a, **{**k, "pad_rows": False}))
    try:
        plain = jax.device_get(jax.jit(lambda im, info: model.apply(
            variables, im, info, method="predict"))(images, im_info))
    finally:
        net_mod.extract_roi_features = orig
    ok = True
    for k in sorted(prod):
        same = np.array_equal(np.asarray(prod[k]), np.asarray(plain[k]))
        print(f"  c4-predict[{k}]: shape {np.asarray(prod[k]).shape} "
              f"{'bit-identical' if same else 'MISMATCH'}")
        ok &= same
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--only", choices=["all", "fpn", "c4"], default="all")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()}")
    ok = True
    if args.only in ("all", "fpn"):
        ok &= check_predict(args.batch)
        ok &= check_train(args.batch)
    if args.only in ("all", "c4"):
        ok &= check_c4(args.batch)
    print("PADDED POOL WIRING OK" if ok else "PADDED POOL WIRING MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
