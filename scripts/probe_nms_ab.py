#!/usr/bin/env python
"""Same-process A/B of the batched NMS kernel: current ops/pallas/nms_kernel
vs the round-3 variant (inlined below) at the FPN train-propose shape
(B8, N≈8304 presorted, cap 2000, thresh 0.7).

The round-4 edits hoist per-box areas out of the pair sweeps and drop the
later-box guard for chunks strictly after the tile — bit-exact, pure op-count
cuts.  This probe decides whether they pay on hardware (NEXT.md doctrine:
sub-ms effects only by same-process interleaved A/B).

Usage: python scripts/probe_nms_ab.py [--n 8304] [--cap 2000] [--rounds 5]
"""

import argparse
import os.path as osp
import sys
import time
from functools import partial

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from frcnn_tpu.ops.pallas import nms_kernel as nk

TILE, CHUNK, B_BLOCK = nk.TILE, nk.CHUNK, nk.B_BLOCK


# --- round-3 kernel, inlined for the A arm --------------------------------

def _iou_mask_r3(x1a, y1a, x2a, y2a, x1b, y1b, x2b, y2b, thresh):
    iw = jnp.minimum(x2a, x2b) - jnp.maximum(x1a, x1b) + 1.0
    ih = jnp.minimum(y2a, y2b) - jnp.maximum(y1a, y1b) + 1.0
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    inter = iw * ih
    area_a = (x2a - x1a + 1.0) * (y2a - y1a + 1.0)
    area_b = (x2b - x1b + 1.0) * (y2b - y1b + 1.0)
    return inter > thresh * (area_a + area_b - inter)


def _nms_kernel_r3(coords_ref, valid_ref, keep_ref, sup_ref, m_ref, cnt_ref,
                   *, thresh, n, chunk, cap):
    import jax
    from jax.experimental import pallas as pl

    ti = pl.program_id(1)
    bb = B_BLOCK

    @pl.when(ti == 0)
    def _():
        sup_ref[:, :] = 1 - valid_ref[:, :]
        cnt_ref[:, :] = jnp.zeros_like(cnt_ref[:, :])

    start = pl.multiple_of(ti * TILE, TILE)
    pos = jax.lax.broadcasted_iota(jnp.int32, (bb, n), 1)
    remaining = jnp.sum(jnp.where(pos >= start, valid_ref[:, :], 0), axis=1)
    done = jnp.all((cnt_ref[:, 0] >= cap) | (remaining == 0))

    @pl.when(done)
    def _():
        keep_ref[:, :] = jnp.zeros_like(keep_ref[:, :])

    @pl.when(jnp.logical_not(done))
    def _():
        xt1 = coords_ref[:, 0, pl.ds(start, TILE)]
        yt1 = coords_ref[:, 1, pl.ds(start, TILE)]
        xt2 = coords_ref[:, 2, pl.ds(start, TILE)]
        yt2 = coords_ref[:, 3, pl.ds(start, TILE)]

        def col(v):
            return v.reshape(bb, TILE, 1)

        def row(v):
            return v.reshape(bb, 1, TILE)

        masked = _iou_mask_r3(col(xt1), col(yt1), col(xt2), col(yt2),
                              row(xt1), row(yt1), row(xt2), row(yt2), thresh)
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (bb, TILE), 1)
        m_ref[:, :, :] = masked.astype(jnp.int32)

        sup_t = sup_ref[:, pl.ds(start, TILE)]

        def intra(i, sup_t):
            alive = jnp.max(jnp.where(t_idx == i, sup_t, 0), axis=1,
                            keepdims=True) == 0
            rowi = m_ref[:, pl.ds(i, 1), :].reshape(bb, TILE) > 0
            new = (alive & rowi & (t_idx > i)).astype(jnp.int32)
            return jnp.maximum(sup_t, new)

        sup_t = jax.lax.fori_loop(0, TILE, intra, sup_t)
        kept = 1 - sup_t
        sup_ref[:, pl.ds(start, TILE)] = sup_t
        keep_ref[:, :] = kept
        cnt_ref[:, :] = cnt_ref[:, :] + jnp.sum(kept, axis=1, keepdims=True)

        kept_col = kept.reshape(bb, TILE, 1) > 0
        g_row = start + t_idx.reshape(bb, TILE, 1)

        def chunk_body(jb, _):
            cs = pl.multiple_of(jb * chunk, chunk)
            xc1 = coords_ref[:, 0, pl.ds(cs, chunk)].reshape(bb, 1, chunk)
            yc1 = coords_ref[:, 1, pl.ds(cs, chunk)].reshape(bb, 1, chunk)
            xc2 = coords_ref[:, 2, pl.ds(cs, chunk)].reshape(bb, 1, chunk)
            yc2 = coords_ref[:, 3, pl.ds(cs, chunk)].reshape(bb, 1, chunk)
            iou = _iou_mask_r3(col(xt1), col(yt1), col(xt2), col(yt2),
                               xc1, yc1, xc2, yc2, thresh)
            g_col = cs + jax.lax.broadcasted_iota(jnp.int32, (bb, 1, chunk), 2)
            new_sup = jnp.any(kept_col & iou & (g_col > g_row), axis=1)
            cur = sup_ref[:, pl.ds(cs, chunk)]
            sup_ref[:, pl.ds(cs, chunk)] = jnp.maximum(
                cur, new_sup.astype(jnp.int32))
            return 0

        jax.lax.fori_loop((start // chunk), n // chunk, chunk_body, 0)


@partial(jax.jit, static_argnames=("thresh", "cap"))
def _r3_padded(coords, valid, thresh: float, cap: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, _, n = coords.shape
    chunk = min(CHUNK, n)
    kernel = partial(_nms_kernel_r3, thresh=float(thresh), n=n, chunk=chunk,
                     cap=cap)
    return pl.pallas_call(
        kernel,
        grid=(b // B_BLOCK, n // TILE),
        in_specs=[
            pl.BlockSpec((B_BLOCK, 4, n), lambda bb, ti: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLOCK, n), lambda bb, ti: (bb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_BLOCK, TILE), lambda bb, ti: (bb, ti),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B_BLOCK, n), jnp.int32),
                        pltpu.VMEM((B_BLOCK, TILE, TILE), jnp.int32),
                        pltpu.VMEM((B_BLOCK, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(coords, valid)


def make_problem(b, n, seed=0):
    """Presorted proposal-like boxes: clustered around objects + noise."""
    rng = np.random.RandomState(seed)
    cx = rng.uniform(0, 1024, (b, n))
    cy = rng.uniform(0, 608, (b, n))
    w = rng.lognormal(4.0, 0.8, (b, n)).clip(8, 500)
    h = rng.lognormal(4.0, 0.8, (b, n)).clip(8, 500)
    x1 = (cx - w / 2).clip(0, 1023)
    y1 = (cy - h / 2).clip(0, 607)
    x2 = (cx + w / 2).clip(0, 1023)
    y2 = (cy + h / 2).clip(0, 607)
    boxes = np.stack([x1, y1, x2, y2], axis=2).astype(np.float32)
    return jnp.asarray(boxes)


def slope(fn, args, iters=(4, 16)):
    ts = {}
    for it in iters:
        t0 = time.perf_counter()
        for _ in range(it):
            out = fn(*args)
        np.asarray(out)
        ts[it] = time.perf_counter() - t0
    return (ts[iters[1]] - ts[iters[0]]) / (iters[1] - iters[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8304)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--cap", type=int, default=2000)
    ap.add_argument("--thresh", type=float, default=0.7)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    boxes = make_problem(args.b, args.n)
    valid = jnp.ones((args.b, args.n), bool)

    # pad like nms_mask_pallas_batched does
    pad_n = (-args.n) % TILE if args.n <= CHUNK else (-args.n) % CHUNK
    bp = jnp.pad(boxes, ((0, 0), (0, pad_n), (0, 0)))
    vp = jnp.pad(valid, ((0, 0), (0, pad_n))).astype(jnp.int32)
    coords = bp.transpose(0, 2, 1).astype(jnp.float32)

    def arm_new():
        return nk._nms_pallas_batched_padded(coords, vp, args.thresh,
                                             args.cap)

    def arm_r3():
        return _r3_padded(coords, vp, args.thresh, args.cap)

    # correctness: identical keep masks
    k_new = np.asarray(arm_new())
    k_r3 = np.asarray(arm_r3())
    same = bool((k_new == k_r3).all())
    print(f"keep masks identical: {same}   kept/problem: "
          f"{k_new.sum(axis=1).tolist()}")
    assert same

    sl = {"new": [], "r3": []}
    for _ in range(args.rounds):
        sl["new"].append(slope(arm_new, ()))
        sl["r3"].append(slope(arm_r3, ()))
    for k in ("r3", "new"):
        best = min(sl[k])
        print(f"{k:4s}: best {best*1e3:6.3f} ms   "
              f"all {[round(s*1e3, 3) for s in sl[k]]}")
    print(f"delta: {(min(sl['new']) / min(sl['r3']) - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
