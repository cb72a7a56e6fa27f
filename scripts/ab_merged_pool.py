#!/usr/bin/env python
"""Same-process interleaved A/B of the merged tail-levels RoIAlign launch
(ops.roi_align.MERGED_LEVEL_FWD) on the FPN detect graph at 800x1216 B8.
Both arms use the production config otherwise (threshold select on).

The flag is read at trace time, so each arm is built and warmed while the
flag holds its value; slopes are then interleaved in one process.

Usage: python scripts/ab_merged_pool.py [--rounds 5] [--bucket 800x1216]
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax

from scripts.ab_threshold_select import build_detect
from scripts.profile_backbone import slope_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--bucket", default="800x1216")
    ap.add_argument("--net", default="res50_fpn")
    args = ap.parse_args()
    h, w = (int(x) for x in args.bucket.split("x"))
    print(f"backend={jax.default_backend()} net={args.net} bucket={h}x{w}")

    ra = sys.modules.get("frcnn_tpu.ops.roi_align")
    if ra is None:
        import frcnn_tpu.ops.roi_align  # noqa: F401
        ra = sys.modules["frcnn_tpu.ops.roi_align"]

    arms = {}
    for flag in (True, False):
        ra.MERGED_LEVEL_FWD = flag
        fn, images = build_detect(args.net, (h, w), 8, True)
        tag = "merged" if flag else "per-level"
        _ = slope_time(fn, (images,), n_lo=2, n_hi=3)  # compile + warm
        arms[tag] = (fn, images)
        print(f"  compiled {tag}")

    results = {t: [] for t in arms}
    for _ in range(args.rounds):
        for tag, (fn, images) in arms.items():
            results[tag].append(slope_time(fn, (images,)) * 1e3)
    a, b = min(results["merged"]), min(results["per-level"])
    print(f"detect: merged best {a:.3f} ms | per-level best {b:.3f} ms | "
          f"delta {b - a:+.3f} ms ({(b - a) / b * 100:+.2f}%)")
    for t in arms:
        print(f"    {t}: " + " ".join(f"{x:.3f}" for x in results[t]))


if __name__ == "__main__":
    main()
