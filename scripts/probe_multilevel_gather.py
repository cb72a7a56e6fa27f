#!/usr/bin/env python
"""Probe XLA gather formulations for the FPN multilevel RoIAlign.

The one-pass multilevel gather (ops.roi_align.roi_align_multilevel) costs
27.6 ms at the 8x300-roi 800x1216 FPN detect shape — ~35 GB/s effective for
~1 GB of gathered rows, far below HBM.  Candidates:

  A) shipped: 4x row-gather (1, C) per sample from the flat (sum HW, C) table
  B) x-pair gather: 2x (2, C) slices (xl/xh are adjacent rows in the flat
     table) — half the descriptors, 1 KB contiguous runs
  C) 2x2 patch gather: ONE (2, 2, C) slice per sample point from a 3D
     common-width table (levels stacked along H, W padded to max) — quarter
     the descriptors, the whole bilinear stencil in one slice

Usage: python scripts/probe_multilevel_gather.py
"""

import os.path as osp
import sys
import functools

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_backbone import slope_time

P, SR = 7, 2
C = 256
LEVELS = [(200, 304), (100, 152), (50, 76), (25, 38)]
STRIDES = [4, 8, 16, 32]
B, R = 8, 300
CHUNK = 60


def make_inputs(rng):
    feats = [jnp.asarray(rng.randn(B, h, w, C), jnp.bfloat16)
             for h, w in LEVELS]
    # realistic rois: geometric-mean size matched to level, random aspect
    rois, lvls = [], []
    for _ in range(B):
        lv = rng.randint(0, 4, R)
        s = 224.0 * (2.0 ** (lv - 4)) * rng.uniform(0.7, 1.4, R)
        a = np.exp(rng.uniform(-0.8, 0.8, R))
        w_ = s * np.sqrt(a)
        h_ = s / np.sqrt(a)
        x1 = rng.uniform(0, 1216 - w_ - 1)
        y1 = rng.uniform(0, 800 - h_ - 1)
        rois.append(np.stack([x1, y1, x1 + w_, y1 + h_], -1))
        lvls.append(lv)
    return (feats, jnp.asarray(np.stack(rois), jnp.float32),
            jnp.asarray(np.stack(lvls), jnp.int32))


def variant_a(feats, rois, levels):
    from frcnn_tpu.ops.roi_align import roi_align_multilevel
    return jax.vmap(
        lambda fs, r, lv: roi_align_multilevel(
            fs, r, lv, strides=STRIDES, output_size=P, sampling_ratio=SR,
            chunk=CHUNK))(feats, rois, levels)


def _coords(rois, levels, dims, scales, dtype):
    hh = dims[levels, 0].astype(dtype)[:, None]
    ww = dims[levels, 1].astype(dtype)[:, None]
    scale = scales[levels][:, None].astype(dtype)
    x1 = rois[:, 0:1].astype(dtype) * scale
    y1 = rois[:, 1:2].astype(dtype) * scale
    x2 = rois[:, 2:3].astype(dtype) * scale
    y2 = rois[:, 3:4].astype(dtype) * scale
    bw = jnp.maximum(x2 - x1, 1.0) / P
    bh = jnp.maximum(y2 - y1, 1.0) / P
    s = (jnp.arange(P * SR, dtype=dtype) + 0.5) / SR
    ys = y1 + s[None, :] * bh
    xs = x1 + s[None, :] * bw

    def nb(coords, size):
        empty = (coords < -1.0) | (coords > size)
        c = jnp.clip(coords, 0.0, size - 1.0)
        low = jnp.floor(c)
        return low.astype(jnp.int32), c - low, empty

    yl, fy, ey = nb(ys, hh)
    xl, fx, ex = nb(xs, ww)
    return yl, fy, ey, xl, fx, ex


def _combine(patches, fy, fx, ey, ex, r):
    # patches (G, 2, 2, C) with G = r * n * n
    n = P * SR
    pt = patches.reshape(r, n, n, 2, 2, -1)
    wy = jnp.stack([1 - fy, fy], -1)[:, :, None, :, None, None]   # (r,n,1,2,1,1)
    wx = jnp.stack([1 - fx, fx], -1)[:, None, :, None, :, None]
    v = (pt * wy * wx).sum(axis=(3, 4))
    valid = (~ey)[:, :, None, None] & (~ex)[:, None, :, None]
    v = jnp.where(valid, v, 0.0)
    return v.reshape(r, P, SR, P, SR, -1).mean(axis=(2, 4))


def _patch_chunk(table3d, dims, row_offs, scales, rois, levels):
    """Variant C chunk: one (2,2,C) gather per sample point."""
    r = rois.shape[0]
    n = P * SR
    dtype = table3d.dtype
    yl, fy, ey, xl, fx, ex = _coords(rois, levels, dims, scales, dtype)
    rows = row_offs[levels][:, None] + yl                       # (r, n)
    starts = jnp.stack([
        jnp.broadcast_to(rows[:, :, None], (r, n, n)).reshape(-1),
        jnp.broadcast_to(xl[:, None, :], (r, n, n)).reshape(-1)], -1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    patches = jax.lax.gather(
        table3d, starts, dn, slice_sizes=(2, 2, table3d.shape[-1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return _combine(patches, fy, fx, ey, ex, r)


def variant_c_one(feats, rois, levels):
    """feats: list of (H, W, C) one image."""
    c = feats[0].shape[-1]
    wmax = max(f.shape[1] for f in feats) + 2
    stacked = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, wmax - f.shape[1]), (0, 0))) for f in feats],
        axis=0)
    stacked = jnp.pad(stacked, ((0, 1), (0, 0), (0, 0)))        # slack row
    dims = jnp.asarray([f.shape[:2] for f in feats], jnp.int32)
    hs = [f.shape[0] for f in feats]
    row_offs = jnp.asarray(np.concatenate([[0], np.cumsum(hs)[:-1]]), jnp.int32)
    scales = jnp.asarray([1.0 / s for s in STRIDES], jnp.float32)

    r = rois.shape[0]
    fn = functools.partial(_patch_chunk, stacked, dims, row_offs, scales)
    out = jax.lax.map(
        lambda args: fn(rois=args[0], levels=args[1]),
        (rois.reshape(r // CHUNK, CHUNK, 4),
         levels.reshape(r // CHUNK, CHUNK)))
    return out.reshape((r,) + out.shape[2:])


def variant_c(feats, rois, levels):
    return jax.vmap(lambda fs, r, lv: variant_c_one(fs, r, lv))(
        feats, rois, levels)


def _pair_chunk(table, dims, offsets, scales, rois, levels):
    """Variant B chunk: two (2, C) gathers per sample point (yl and yh)."""
    r = rois.shape[0]
    n = P * SR
    dtype = table.dtype
    yl, fy, ey, xl, fx, ex = _coords(rois, levels, dims, scales, dtype)
    w_i = dims[levels, 1][:, None]
    hh_i = dims[levels, 0][:, None]
    base = offsets[levels][:, None]
    yh = jnp.minimum(yl + 1, hh_i - 1)

    def pair_gather(yy):
        starts = ((base + yy * w_i)[:, :, None] + xl[:, None, :]).reshape(-1, 1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,))
        out = jax.lax.gather(
            table, starts, dn, slice_sizes=(2, table.shape[-1]),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return out.reshape(r, n, n, 2, -1)

    top = pair_gather(yl)                                        # (r,n,n,2,C)
    bot = pair_gather(yh)
    wx = jnp.stack([1 - fx, fx], -1)[:, None, :, :, None]        # (r,1,n,2,1)
    rowt = (top * wx).sum(3)
    rowb = (bot * wx).sum(3)
    v = rowt * (1 - fy)[:, :, None, None] + rowb * fy[:, :, None, None]
    valid = (~ey)[:, :, None, None] & (~ex)[:, None, :, None]
    v = jnp.where(valid, v, 0.0)
    return v.reshape(r, P, SR, P, SR, -1).mean(axis=(2, 4))


def variant_b_one(feats, rois, levels):
    c = feats[0].shape[-1]
    table = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)
    table = jnp.pad(table, ((0, 1), (0, 0)))                    # slack row
    dims = jnp.asarray([f.shape[:2] for f in feats], jnp.int32)
    sizes = [int(np.prod(f.shape[:2])) for f in feats]
    offsets = jnp.asarray(np.concatenate([[0], np.cumsum(sizes)[:-1]]),
                          jnp.int32)
    scales = jnp.asarray([1.0 / s for s in STRIDES], jnp.float32)
    r = rois.shape[0]
    fn = functools.partial(_pair_chunk, table, dims, offsets, scales)
    out = jax.lax.map(
        lambda args: fn(rois=args[0], levels=args[1]),
        (rois.reshape(r // CHUNK, CHUNK, 4),
         levels.reshape(r // CHUNK, CHUNK)))
    return out.reshape((r,) + out.shape[2:])


def variant_b(feats, rois, levels):
    return jax.vmap(lambda fs, r, lv: variant_b_one(fs, r, lv))(
        feats, rois, levels)


def _stencil_chunk(tableq, dims, offsets, scales, rois, levels):
    """Variant D chunk: ONE (1, 4C) gather per sample from a precomputed
    2x2-stencil table tableq[y*w+x] = [f(y,x) f(y,x+1) f(y+1,x) f(y+1,x+1)]."""
    r = rois.shape[0]
    n = P * SR
    dtype = tableq.dtype
    yl, fy, ey, xl, fx, ex = _coords(rois, levels, dims, scales, dtype)
    w_i = dims[levels, 1][:, None]
    base = offsets[levels][:, None]
    starts = ((base + yl * w_i)[:, :, None] + xl[:, None, :]).reshape(-1, 1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    quad = jax.lax.gather(
        tableq, starts, dn, slice_sizes=(1, tableq.shape[-1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    patches = quad.reshape(r, n, n, 2, 2, -1)
    return _combine(patches.reshape(-1, 2, 2, patches.shape[-1]),
                    fy, fx, ey, ex, r)


def variant_d_one(feats, rois, levels):
    c = feats[0].shape[-1]
    quads = []
    for f in feats:
        h, w, _ = f.shape
        fr = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)       # x+1 (clamp)
        fx4 = jnp.concatenate([f, fr], axis=-1)                   # (h, w, 2C)
        fd = jnp.concatenate([fx4[1:], fx4[-1:]], axis=0)         # y+1 (clamp)
        quads.append(jnp.concatenate([fx4, fd], axis=-1).reshape(h * w, 4 * c))
    tableq = jnp.concatenate(quads, axis=0)
    dims = jnp.asarray([f.shape[:2] for f in feats], jnp.int32)
    sizes = [int(np.prod(f.shape[:2])) for f in feats]
    offsets = jnp.asarray(np.concatenate([[0], np.cumsum(sizes)[:-1]]),
                          jnp.int32)
    scales = jnp.asarray([1.0 / s for s in STRIDES], jnp.float32)
    r = rois.shape[0]
    fn = functools.partial(_stencil_chunk, tableq, dims, offsets, scales)
    out = jax.lax.map(
        lambda args: fn(rois=args[0], levels=args[1]),
        (rois.reshape(r // CHUNK, CHUNK, 4),
         levels.reshape(r // CHUNK, CHUNK)))
    return out.reshape((r,) + out.shape[2:])


def variant_d(feats, rois, levels):
    return jax.vmap(lambda fs, r, lv: variant_d_one(fs, r, lv))(
        feats, rois, levels)


def main():
    rng = np.random.RandomState(0)
    feats, rois, levels = make_inputs(rng)
    print(f"backend={jax.default_backend()}  B={B} R={R} C={C} "
          f"levels={LEVELS}")

    # parity first (f32 on small subset)
    f32 = [f.astype(jnp.float32) for f in feats]
    a = np.asarray(variant_a(f32, rois, levels))
    for name, fn in (("B", variant_b), ("C", variant_c)):
        got = np.asarray(fn(f32, rois, levels))
        err = np.max(np.abs(got - a))
        print(f"variant {name} parity vs A: max abs err {err:.2e}")

    d = np.asarray(variant_d(f32, rois, levels))
    print(f"variant D parity vs A: max abs err {np.max(np.abs(d - a)):.2e}")

    global CHUNK
    for name, fn in (("A row-gather ", variant_a),
                     ("B x-pair     ", variant_b),
                     ("C 2x2 patch  ", variant_c),
                     ("D 4C stencil ", variant_d)):
        dt = slope_time(lambda *f: fn(list(f), rois, levels), tuple(feats))
        print(f"variant {name}: {dt*1e3:7.2f} ms")

    for chunk in (100, 300):
        CHUNK = chunk
        for name, fn in (("B x-pair     ", variant_b),
                         ("D 4C stencil ", variant_d)):
            dt = slope_time(lambda *f: fn(list(f), rois, levels), tuple(feats))
            print(f"variant {name} chunk={chunk}: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
