#!/usr/bin/env python
"""End-to-end trained-AP regression (VERDICT r2 Missing #1 / Next #1a).

Reproduces the flagship from-scratch check recorded in BASELINE.md on one
TPU chip, as ONE seed-pinned command with an asserted floor:

  * generate the 120-image synthetic VOC (classes dog/cat/car/person,
    class-correlated colors — tools/make_synthetic_voc.py, seed 0;
    trainval 90 / test 30),
  * train res50_fpn_gn (ResNet-50 + FPN, GroupNorm, from scratch) for
    --iters steps through the full CLI pipeline (train_net → orbax
    snapshots),
  * evaluate with test_net → VOC AP table,
  * ASSERT mean AP over classes present in the test split >= --floor
    (default 0.75; the recorded runs reach 0.88 at 1500 iters — the floor
    leaves seed/chip noise margin while still failing on any real
    training-path regression, e.g. a halved AP).

Exit code 0 = pass, 1 = AP below floor.  ~12 min on one v5e chip.

With --json-out PATH the result is also written as a durable artifact
(VERDICT r3 Weak #6: make the quality claim as round-comparable as
BENCH_r*.json): {mean_ap, per_class, iters, floor, pass, net, seconds,
s_per_iter_incl_compile, s_per_iter_steady}.  Written on failure too,
with "pass": false.

Usage: python scripts/ap_regression.py [--iters 1500] [--floor 0.75]
       [--root /tmp/ap_regression] [--json-out AP_r04.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os.path as osp
import subprocess
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--floor", type=float, default=0.75)
    ap.add_argument("--root", default="/tmp/ap_regression")
    ap.add_argument("--net", default="res50_fpn_gn")
    ap.add_argument("--json-out", default=None,
                    help="also write the result as a JSON artifact")
    args = ap.parse_args()

    if not osp.exists(osp.join(args.root, "VOCdevkit2007")):
        subprocess.run(
            [sys.executable,
             osp.join(osp.dirname(__file__), "..", "tools",
                      "make_synthetic_voc.py"),
             "--root", args.root, "--images", "120", "--seed", "0"],
            check=True)

    from frcnn_tpu.config import default_config
    from frcnn_tpu.data.pascal_voc import pascal_voc
    from frcnn_tpu.engine.test import test_net
    from frcnn_tpu.engine.train import get_training_roidb, train_net
    from frcnn_tpu.models import build_model

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        DATA_DIR=args.root,
        # the flagship from-scratch recipe (BASELINE.md): GN backbone,
        # nothing frozen, warmup + grad clip, batch 2 at the 608x1024 bucket
        RESNET=dataclasses.replace(cfg.RESNET, FIXED_BLOCKS=0),
        TRAIN=dataclasses.replace(
            cfg.TRAIN, IMS_PER_BATCH=2, SCALES=(600,), MAX_SIZE=1024,
            GRAD_CLIP=10.0, WARMUP_ITERS=500, WARMUP_FACTOR=0.1,
            STEPSIZE=(1200,), SNAPSHOT_ITERS=10000, DISPLAY=100,
            USE_FLIPPED=True, SUMMARY_INTERVAL=0, IMAGE_CACHE=True),
        TEST=dataclasses.replace(cfg.TEST, SCALES=(600,), MAX_SIZE=1024),
        TPU=dataclasses.replace(cfg.TPU, BUCKETS=((608, 1024),), MAX_GT=8),
    )

    np.random.seed(cfg.RNG_SEED)
    ds = pascal_voc("trainval", "2007",
                    devkit_path=osp.join(args.root, "VOCdevkit2007"),
                    data_dir=args.root)
    ds.set_proposal_method("gt")
    roidb = get_training_roidb(ds, cfg)
    model = build_model(args.net, ds.num_classes, cfg, dtype=_dtype())
    out_dir = osp.join(args.root, "out")
    t0 = time.time()
    state = train_net(model, ds, roidb, None, out_dir, cfg=cfg,
                      max_iters=args.iters)
    t_train = time.time() - t0
    # Split compile amortization from steady-state (round-4 VERDICT Weak #6:
    # wall/iters conflated ~0.87 s/iter with the 0.397 steady-state record).
    # train_log.jsonl carries a timestamp every DISPLAY iters; the slope
    # from the second logged point onward excludes the initial compiles.
    s_steady = None
    try:
        with open(osp.join(out_dir, "train_log.jsonl")) as f:
            pts = [json.loads(line) for line in f]
        pts = [(p["iter"], p["ts"]) for p in pts
               if "iter" in p and p["iter"] <= args.iters]
        pts = sorted(pts)[-max(2, len(pts) - 1):]   # drop the compile window
        if len(pts) >= 2 and pts[-1][0] > pts[0][0]:
            s_steady = (pts[-1][1] - pts[0][1]) / (pts[-1][0] - pts[0][0])
    except (OSError, ValueError, KeyError):
        pass
    print(f"trained {args.iters} iters in {t_train:.0f}s "
          f"({t_train / args.iters:.3f} s/iter incl. compile"
          + (f"; steady-state {s_steady:.3f} s/iter" if s_steady else "")
          + ")")

    dst = pascal_voc("test", "2007",
                     devkit_path=osp.join(args.root, "VOCdevkit2007"),
                     data_dir=args.root)
    dst.competition_mode(True)
    res = test_net(model, {"params": state["params"]}, dst, cfg,
                   osp.join(args.root, "eval"), max_per_image=100, batch=2)
    aps = {k: v for k, v in res.items() if k != "mAP"}
    present = {c for r in dst.gt_roidb()
               for c in np.asarray(dst.classes)[r["gt_classes"]]}
    vals = [v for k, v in aps.items() if k in present and np.isfinite(v)]
    mean_present = float(np.mean(vals)) if vals else 0.0
    print(f"AP by class: { {k: round(float(v), 3) for k, v in aps.items()} }")
    print(f"mean AP over {len(vals)} present classes: {mean_present:.3f} "
          f"(floor {args.floor})")
    ok = mean_present >= args.floor
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({
                "mean_ap": round(mean_present, 4),
                "per_class": {k: round(float(v), 4) for k, v in aps.items()
                              if k in present and np.isfinite(v)},
                "iters": args.iters, "floor": args.floor, "pass": ok,
                "net": args.net, "seconds": round(t_train, 1),
                "s_per_iter_incl_compile": round(t_train / args.iters, 4),
                "s_per_iter_steady": (round(s_steady, 4) if s_steady
                                      else None),
                "backend": _backend(),
            }, f, indent=1)
            f.write("\n")
        print(f"wrote {args.json_out}")
    if not ok:
        print("AP REGRESSION: below floor", file=sys.stderr)
        sys.exit(1)
    print("AP regression check PASSED")


def _backend():
    import jax

    return jax.default_backend()


def _dtype():
    import jax.numpy as jnp

    return jnp.bfloat16 if _backend() == "tpu" else jnp.float32


if __name__ == "__main__":
    main()
