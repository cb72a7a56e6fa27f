#!/usr/bin/env python
"""On-chip validation + A/B of the threshold-select Pallas kernel
(ops/pallas/select_kernel.topk_threshold) vs jax.lax.top_k at the FPN
propose shapes.

Three checks, in one process (deliberately — the axon backend's strided-
top-k failure fired on the SECOND similar program in one process;
PROFILE_r04 §2):

  1. parity: kernel indices/values == stable-argsort oracle (computed on
     CPU via numpy) at the train L2 shape, repeated 5x with fresh inputs;
  2. a second, different shape (detect P2) compiled and repeat-executed in
     the same process (cross-program interference check);
  3. slope A/B: kernel vs lax.top_k at both shapes.

Usage: python scripts/probe_topk_threshold.py
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_backbone import slope_time
from frcnn_tpu.ops.pallas.select_kernel import topk_threshold


def np_oracle(x, k):
    order = np.argsort(-x, axis=-1, kind="stable")[..., :k]
    idx = np.sort(order, axis=-1).astype(np.int32)
    return np.take_along_axis(x, idx, axis=-1), idx


def parity(shape, k, trials, tag):
    rng = np.random.RandomState(0)
    ok = True
    for t in range(trials):
        x = (1.0 / (1.0 + np.exp(-rng.randn(*shape)))).astype(np.float32)
        v, i = jax.jit(lambda a: topk_threshold(a, k))(jnp.asarray(x))
        v, i = np.asarray(v), np.asarray(i)
        rv, ri = np_oracle(x, k)
        if not ((v == rv).all() and (i == ri).all()):
            bad = int((i != ri).sum())
            print(f"  {tag} trial {t}: MISMATCH ({bad} idx cells differ)")
            ok = False
        else:
            print(f"  {tag} trial {t}: exact")
    return ok


def ab(shape, k, tag):
    rng = np.random.RandomState(1)
    x = jnp.asarray(
        (1.0 / (1.0 + np.exp(-rng.randn(*shape)))).astype(np.float32))

    def kern(a):
        v, i = topk_threshold(a, k)
        return v.sum() + i.sum()

    def direct(a):
        v, i = jax.lax.top_k(a, k)
        return v.sum() + i.sum()

    tk = slope_time(kern, (x,)) * 1e3
    td = slope_time(direct, (x,)) * 1e3
    print(f"  {tag}: kernel {tk:.3f} ms   lax.top_k {td:.3f} ms   "
          f"({td / tk:.2f}x)")


def vmapped_sampler_check():
    """The anchor-sampler pattern: vmapped 1-row topk_threshold, k=256,
    iid priorities — parity + repeat execution."""
    rng = np.random.RandomState(9)
    ok = True
    for t in range(3):
        x = rng.rand(8, 155520).astype(np.float32)

        @jax.jit
        def f(a):
            def one(row):
                v, i = topk_threshold(row[None], 256)
                return v[0], i[0]
            return jax.vmap(one)(a)

        v, i = f(jnp.asarray(x))
        rv, ri = np_oracle(x, 256)
        good = (np.asarray(v) == rv).all() and (np.asarray(i) == ri).all()
        print(f"  vmapped sampler (8x155520) k=256 trial {t}: "
              f"{'exact' if good else 'MISMATCH'}")
        ok &= good
    return ok


def dense_regimes():
    """Adversarial DENSE-block parity (round-5 addition).  The round-4
    on-chip bug (wrong top-k sets whenever any 512-lane block held > 256
    selected elements — bf16-truncated prefix dots) was invisible to the
    i.i.d. uniform/sigmoid inputs above (~9 selected/block).  These cases
    push per-block survivor counts past 256 and straddle the 256 boundary;
    all were verified failing at default MXU precision and exact with
    Precision.HIGHEST on the prefix dots."""
    rng = np.random.RandomState(7)
    ok = True
    cases = []

    # (a) clustered high-score run WIDER than k: contiguous 4000-wide run
    # of near-1 scores in a (8, 116736) sigmoid row, k=2000 — every block
    # in the run is fully selected (512/block).
    x = (1.0 / (1.0 + np.exp(-rng.randn(8, 116736)))).astype(np.float32)
    x[:, 30000:34000] += 2.0
    cases.append((x, 2000, "dense: clustered run 4000 > k=2000"))

    # (b) clustered run SMALLER than k (1000-wide, k=2000): run blocks are
    # dense, the remaining 1000 winners scatter — mixes dense and sparse
    # blocks in one row (the judge's 772/16000-wrong repro regime).
    x = (1.0 / (1.0 + np.exp(-rng.randn(8, 116736)))).astype(np.float32)
    x[:, 50000:51000] += 2.0
    cases.append((x, 2000, "dense: clustered run 1000 < k=2000"))

    # (c) per-block counts straddling 256: alternating half-dense blocks
    # (lanes 0..287 boosted -> 288 survivors/block in even blocks).
    x = rng.rand(4, 65536).astype(np.float32)
    xb = x.reshape(4, 128, 512)
    xb[:, ::2, :288] += 2.0
    cases.append((xb.reshape(4, 65536), 8192, "dense: 288/block straddle"))

    # (d) k == s: every element selected, every block fully dense.
    x = rng.rand(2, 8192).astype(np.float32)
    cases.append((x, 8192, "dense: k == s == 8192"))

    # (e) uniform large-k: k=60000 of 116736 (~263 selected/block average,
    # straddling 256 everywhere; judge repro: 427k/480k wrong at default).
    x = rng.rand(8, 116736).astype(np.float32)
    cases.append((x, 60000, "dense: uniform k=60000"))

    for x, k, tag in cases:
        v, i = jax.jit(lambda a, kk=k: topk_threshold(a, kk))(jnp.asarray(x))
        rv, ri = np_oracle(x, k)
        good = (np.asarray(v) == rv).all() and (np.asarray(i) == ri).all()
        bad = int((np.asarray(i) != ri).sum())
        print(f"  {tag}: {'exact' if good else f'MISMATCH ({bad} idx cells)'}")
        ok &= good
    return ok


def ratio_sweep():
    """Profitability sweep behind THRESHOLD_SELECT_MIN_RATIO (round 5):
    kernel(+re-rank) vs lax.top_k across the production S/k spectrum.
    Re-run this after any jax/axon update — the round-4→5 backend change
    made lax.top_k ~4x faster at small rows and flipped the C4 verdict
    (PROFILE_r05 §3).  `--sweep` runs ONLY the sweep: timing arms in a
    process that already executed many compiled programs read garbage
    (negative slopes — the multi-program axon hazard, PROFILE_r05 §8),
    and even sweep-only is 12 programs, so treat boundary shapes as
    indicative and confirm gate flips with one-shape-per-process runs +
    an in-situ same-process A/B (ab_threshold_select.py) before shipping
    them."""
    rng = np.random.RandomState(1)
    print("  shape, k (S/k): kernel+rerank | lax.top_k")
    for shape, k in [((8, 34200), 6000), ((8, 29184), 2000),
                     ((8, 45600), 1000), ((8, 65536), 2000),
                     ((8, 116736), 2000), ((8, 182400), 1000)]:
        x = jnp.asarray(rng.rand(*shape).astype(np.float32))

        def kern(a, kk=k):
            v, i = topk_threshold(a, kk)
            vv, pos = jax.lax.top_k(v, kk)   # production re-rank included
            return vv.sum() + jnp.take_along_axis(i, pos, axis=1).sum()

        def direct(a, kk=k):
            v, i = jax.lax.top_k(a, kk)
            return v.sum() + i.sum()

        tk = slope_time(kern, (x,)) * 1e3
        td = slope_time(direct, (x,)) * 1e3
        print(f"  {shape} k={k} (S/k={shape[1] // k:4d}): {tk:7.3f} | "
              f"{td:7.3f} ms  ({td - tk:+.3f})")


def main():
    print(f"backend={jax.default_backend()}")
    if "--sweep" in sys.argv:
        ratio_sweep()          # sweep-only: see ratio_sweep docstring
        return
    shapes = [((8, 116736), 2000, "train-L2 (8,116736) k=2000"),
              ((8, 182400), 1000, "detect-P2 (8,182400) k=1000")]
    allok = True
    for shape, k, tag in shapes:
        allok &= parity(shape, k, 3, tag)
    allok &= dense_regimes()
    # interleaved re-execution of both compiled programs
    for rep in range(2):
        for shape, k, tag in shapes:
            allok &= parity(shape, k, 1, tag + f" re-exec {rep}")
    allok &= vmapped_sampler_check()
    for shape, k, tag in shapes:
        ab(shape, k, tag)
    print("ALL PARITY OK" if allok else "PARITY FAILURES — see above")


if __name__ == "__main__":
    main()
