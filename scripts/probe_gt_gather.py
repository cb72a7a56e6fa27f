#!/usr/bin/env python
"""On-chip exactness probe for the target layers' one-hot gt-row gathers.

Round-4 VERDICT Weak #2: `one_hot @ gt_boxes` (models/targets.py) at
default MXU precision truncates the gt coordinates to bf16 on chip —
measured up to 3.81 px error per gathered coordinate (64 boxes, coords
≤1216) while the same graph is exact on CPU.  Fixed with
Precision.HIGHEST; this probe certifies the fix on hardware and guards
the class (docs/ARCHITECTURE.md "Matmul precision policy").

Checks, compiled on the real chip:
  1. the raw one-hot matmul pattern at the production scale
     (155k anchors × 64 gt) — max abs error vs an exact numpy gather;
  2. through the public layers: anchor_target_layer / anchor_target_compact
     / proposal_target_layer bbox_targets vs the same layers run on CPU.
     Criterion: <= 5e-4 absolute, NOT 0.0 — bbox_transform's log()/div
     differ from CPU in the last ulp (backend transcendental
     implementations), which is ~1e-4 in target units and a different
     class from the 3.8 px gather truncation this probe guards against
     (measured through-layer deltas: 1.0e-4 / 1.0e-4 / 2.9e-4; a bf16
     gather regression would show as ~1e-2..1e0 here).

Usage: python scripts/probe_gt_gather.py
"""

import dataclasses
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def raw_pattern():
    rng = np.random.RandomState(0)
    g = 64
    k = 155520
    gt = (rng.rand(g, 4) * 1216.0).astype(np.float32)
    idx = rng.randint(0, g, k).astype(np.int32)

    @jax.jit
    def fetch(gt_boxes, argmax):
        one_hot = (argmax[:, None] == jnp.arange(gt_boxes.shape[0])[None, :])
        return jnp.matmul(one_hot.astype(gt_boxes.dtype), gt_boxes,
                          precision=jax.lax.Precision.HIGHEST)

    got = np.asarray(fetch(jnp.asarray(gt), jnp.asarray(idx)))
    want = gt[idx]
    err = np.abs(got - want).max()
    print(f"raw one-hot gather ({k}x{g}, coords<=1216): max abs err {err}")
    return err == 0.0


def through_layers():
    from frcnn_tpu.config import default_config
    from frcnn_tpu.models.targets import (anchor_target_compact,
                                          anchor_target_layer,
                                          proposal_target_layer)
    from frcnn_tpu.ops.anchors import generate_anchors_pre

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, TPU=dataclasses.replace(cfg.TPU, USE_PALLAS=False,
                                     THRESHOLD_SELECT=False))
    rng = np.random.RandomState(1)
    anchors, _ = generate_anchors_pre(38, 57, 16,
                                      ratios=tuple(cfg.ANCHOR_RATIOS),
                                      scales=tuple(cfg.ANCHOR_SCALES))
    g = 48
    gt = np.sort((rng.rand(g, 2, 2) * np.array([608.0, 912.0])), axis=1)
    gt = gt.transpose(0, 2, 1).reshape(g, 4).astype(np.float32)
    gt[:, 2:] = np.maximum(gt[:, 2:], gt[:, :2] + 8)
    gt_j = jnp.asarray(gt)
    gv = jnp.ones(g, bool)
    gl = jnp.asarray(rng.randint(1, 21, g).astype(np.int32))
    im_info = jnp.asarray([608.0, 912.0, 1.0])
    key = jax.random.PRNGKey(3)

    cpu = jax.devices("cpu")[0]
    ok = True
    for name, fn in [
        ("anchor_target_layer", lambda dev_anchors, dev_gt, dev_gv, dev_ii,
         dev_key: anchor_target_layer(dev_anchors, dev_gt, dev_gv, dev_ii,
                                      dev_key, cfg).bbox_targets),
        ("anchor_target_compact", lambda dev_anchors, dev_gt, dev_gv, dev_ii,
         dev_key: anchor_target_compact(dev_anchors, dev_gt, dev_gv, dev_ii,
                                        dev_key, cfg).bbox_targets),
    ]:
        args = (jnp.asarray(anchors), gt_j, gv, im_info, key)
        dev = np.asarray(jax.jit(fn)(*args))
        with jax.default_device(cpu):
            host = np.asarray(jax.jit(fn)(*jax.device_put(args, cpu)))
        err = np.abs(dev - host).max()
        print(f"{name}: chip-vs-cpu bbox_targets max abs err {err:.2e} "
              f"(<= 5e-4: transcendental ulp only)")
        ok &= err <= 5e-4

    rois = jnp.asarray((rng.rand(256, 4) * 600).astype(np.float32))
    rois = jnp.concatenate([jnp.minimum(rois[:, :2], rois[:, 2:]),
                            jnp.maximum(rois[:, :2], rois[:, 2:]) + 4.0], 1)
    rv = jnp.ones(256, bool)

    def ptl(r, rvv, gb, gll, gvv, kk):
        return proposal_target_layer(r, rvv, gb, gll, gvv, kk, cfg,
                                     21).bbox_targets

    args = (rois, rv, gt_j, gl, gv, key)
    dev = np.asarray(jax.jit(ptl)(*args))
    with jax.default_device(cpu):
        host = np.asarray(jax.jit(ptl)(*jax.device_put(args, cpu)))
    err = np.abs(dev - host).max()
    print(f"proposal_target_layer: chip-vs-cpu bbox_targets max abs err "
          f"{err:.2e} (<= 5e-4: transcendental ulp only)")
    ok &= err <= 5e-4
    return ok


def main():
    print(f"backend={jax.default_backend()}")
    ok = raw_pattern()
    ok &= through_layers()
    print("GT-GATHER EXACT ON CHIP" if ok else "GT-GATHER ERRORS — see above")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
