#!/usr/bin/env python
"""Same-process A/B: round-2 (c05ae8a) detect graph vs HEAD detect graph.

VERDICT r3 Weak #1: BENCH_r02 224.47 -> BENCH_r03 215.25 img/s (-4.1%)
while round 3 edited files on the shared detect path, and no same-process
A/B existed.  This script settles it in ONE interpreter:

1. Lower the exact bench detect_loop for BOTH package versions (HEAD at
   /root/repo, round 2 via a git worktree at --r2-path) and compare the
   canonical StableHLO text.  Identical HLO => identical program => any
   round-over-round delta is measurement noise by construction.
2. Regardless of (1), run INTERLEAVED slope timings (A,B,A,B,...) on the
   chip so both versions share one tunnel session, one clock, one thermal
   state — the builder's own A/B doctrine (NEXT.md #2).

The round-2 package is imported by purging frcnn_tpu* from sys.modules and
prepending the worktree to sys.path; both sets of jitted functions stay
valid because they hold their own references.

Usage: python scripts/ab_detect_r2_vs_head.py [--r2-path /tmp/r2repo]
       [--hlo-only]   # skip device timing (CPU-safe)
"""

import argparse
import dataclasses
import hashlib
import importlib
import json
import re
import sys
import time


def load_package(path):
    """(Re)import frcnn_tpu from `path`, purging any prior version."""
    for name in [m for m in sys.modules if m.split(".")[0] == "frcnn_tpu"]:
        del sys.modules[name]
    sys.path.insert(0, path)
    try:
        pkg = importlib.import_module("frcnn_tpu")
        assert pkg.__file__.startswith(path), (pkg.__file__, path)
        config = importlib.import_module("frcnn_tpu.config")
        models = importlib.import_module("frcnn_tpu.models")
        backbones = importlib.import_module("frcnn_tpu.models.backbones")
        return config, models, backbones
    finally:
        sys.path.remove(path)


def build_detect_loop(config_mod, models_mod, backbones_mod, on_tpu):
    """Mirror bench.py's north-star detect_loop exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    cfg = config_mod.default_config()
    cfg = dataclasses.replace(
        cfg,
        TEST=dataclasses.replace(cfg.TEST, SCALES=(800,), MAX_SIZE=1333),
        TPU=dataclasses.replace(cfg.TPU, BUCKETS=((800, 1216),)),
    )
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batch = 8 if on_tpu else 1
    model = models_mod.build_model("res50", 21, cfg, dtype=dtype)
    h, w = cfg.TPU.BUCKETS[0]
    rng = np.random.RandomState(0)
    images = jnp.asarray(backbones_mod.pack_images(
        rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32),
        getattr(model, "input_block", 1)))
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (batch, 1))
    variables = model.init(jax.random.PRNGKey(0), images[:1], im_info[:1])

    @jax.jit
    def detect_loop(v, im0, ii, n):
        def body(i, carry):
            im, acc = carry
            det, _valid = model.apply(v, im, ii, method="detect")
            s = jnp.sum(det[:, 0, 0])
            return im + s * 0.0, acc + s
        return jax.lax.fori_loop(0, n, body, (im0, 0.0))

    return detect_loop, variables, images, im_info, batch


def canonical_hlo(detect_loop, variables, images, im_info):
    import jax.numpy as jnp
    txt = detect_loop.lower(variables, images, im_info,
                            jnp.int32(4)).as_text()
    # strip location metadata / ids that vary without changing the program
    txt = re.sub(r'loc\([^)]*\)', '', txt)
    txt = re.sub(r'#loc\d* = .*', '', txt)
    return txt


def slope(detect_loop, variables, images, im_info, n_lo, n_hi):
    import numpy as np
    times = {}
    for n in (n_lo, n_hi):
        t0 = time.perf_counter()
        out = detect_loop(variables, images, im_info, n)
        _ = np.asarray(out[1])
        times[n] = time.perf_counter() - t0
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--r2-path", default="/tmp/r2repo")
    ap.add_argument("--hlo-only", action="store_true")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    on_tpu = jax.default_backend() == "tpu"

    arms = {}
    for name, path in (("head", "/root/repo"), ("r2", args.r2_path)):
        mods = load_package(path)
        arms[name] = build_detect_loop(*mods, on_tpu)
        hlo = canonical_hlo(*arms[name][:4])
        digest = hashlib.sha256(hlo.encode()).hexdigest()[:16]
        arms[name] += (digest, len(hlo))
        print(f"[{name}] HLO sha256[:16]={digest} len={len(hlo)}",
              file=sys.stderr)

    identical = arms["head"][5] == arms["r2"][5]
    result = {"hlo_identical": identical,
              "hlo_head": arms["head"][5], "hlo_r2": arms["r2"][5]}

    if not args.hlo_only:
        n_lo, n_hi = (4, 12) if on_tpu else (1, 2)
        # warm up / compile both
        for name in ("head", "r2"):
            dl, v, im, ii, batch = arms[name][:5]
            import numpy as np
            _ = np.asarray(dl(v, im, ii, 2)[1])
        sl = {"head": [], "r2": []}
        for _ in range(args.rounds):
            for name in ("head", "r2"):     # interleaved
                dl, v, im, ii, batch = arms[name][:5]
                sl[name].append(slope(dl, v, im, ii, n_lo, n_hi))
        batch = arms["head"][4]
        for name in ("head", "r2"):
            best = min(sl[name])
            result[f"{name}_ips"] = round(batch / best, 2)
            result[f"{name}_slopes_ms"] = [round(s * 1e3, 3) for s in sl[name]]
        result["delta_rel"] = round(
            result["head_ips"] / result["r2_ips"] - 1.0, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
