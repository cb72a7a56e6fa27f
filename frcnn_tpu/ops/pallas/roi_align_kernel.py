"""Pallas TPU RoIAlign kernel (forward + custom VJP backward).

TPU-native replacement for the reference's CUDA RoIAlign
(``lib/layer_utils/roi_align/src/*.cu``, SURVEY.md #22).  The CUDA kernel
gathers 4 neighbours per sample point; a TPU wants matmuls, so this kernel
uses a **pooled separable-bilinear** formulation:

    out[r] = Ay[r] @ F @ Ax[r]^T        per channel,

where Ay (p, H) / Ax (p, W) are the bilinear interpolation matrices with the
sampling_ratio mean-pool *pre-folded in* (pooling is linear, so averaging the
sr sample rows of the interpolation matrix gives the exact same operator at
1/sr^2 the FLOPs).

Everything in a grid step is **tile-batched** — the interpolation matrices
for all ROI_TILE rois build in one set of 3-D iota/select ops, and BOTH
contractions are single full-width MXU matmuls: the x-contraction stacks
the tile's Ax blocks px-major along M ((p*RT, W) @ (W, HP*CB)), and the
y-contraction is one block-diagonal (RT*8, RT*HP) @ (RT*HP, p*CB) matmul
(HP = H padded to a sublane multiple so the in-between minor-split reshape
is a cheap aligned shape-cast, not a relayout).  No per-roi python loop
and no batched dot_general: per-roi M=7 MXU passes cost ~1.4 µs each in
pass overhead and dominated earlier versions (30 ms looped → 10.8 ms
batched-dot → 4.3 ms this form, at the 8-image 304-roi detect shape).

Backward (dF only — rois are detached in the reference lineage):
dF = sum_r Ay[r]^T @ dOut[r] @ Ax[r], accumulated per channel block with
roi_tiles as the inner grid dimension (out block revisited; initialized at
the first visit), same batched structure.

Precision: f32 inputs use HIGHEST MXU passes (parity tests); bf16 inputs use
native bf16 (production).

Numerical truth: frcnn_tpu.ops.roi_align.roi_align (torchvision
aligned=False semantics, fixed sampling_ratio); equality tested in
tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROI_TILE = 16   # stacked matmul rows = 16 * 7 = 112 (block must be 8-divisible)
CHAN_BLOCK = 512


def _precision(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _tile_matrices(rois, lo_i, hi_i, size, p, sr, scale, dtype):
    """Pooled interpolation matrices for a whole roi tile, one shot.

    rois (RT, 4); returns (RT, p, size): bilinear weights with the sr-sample
    mean folded in, torchvision border semantics.  Pure 3-D iota/select ops.
    """
    rt = rois.shape[0]
    n = p * sr
    lo = rois[:, lo_i:lo_i + 1] * scale                 # (RT, 1)
    hi = rois[:, hi_i:hi_i + 1] * scale
    bin_sz = jnp.maximum(hi - lo, 1.0) / p
    # int iota then cast (tpu.iota only supports integer results)
    s = (jax.lax.broadcasted_iota(jnp.int32, (rt, n), 1).astype(jnp.float32)
         + 0.5) / sr
    coords = (lo + s * bin_sz)[..., None]               # (RT, n, 1)

    empty = (coords < -1.0) | (coords > size)
    c = jnp.clip(coords, 0.0, size - 1.0)
    low = jnp.floor(c)
    ly = c - low
    low_i32 = low.astype(jnp.int32)
    high_i32 = jnp.minimum(low_i32 + 1, size - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rt, n, size), 2)
    w = jnp.where(cols == low_i32, 1.0 - ly, 0.0)
    w = w + jnp.where(cols == high_i32, ly, 0.0)
    w = jnp.where(empty, 0.0, w)
    pooled = w.reshape(rt, p, sr, size).sum(axis=2) * (1.0 / sr)
    return pooled.astype(dtype)                          # (RT, p, size)


def _hp(h: int) -> int:
    """H padded to a sublane multiple: keeps the mid-kernel minor-split
    reshape and the block-diagonal y-matmul vreg-aligned."""
    return (h + 7) // 8 * 8


def _fwd_kernel(rois_ref, feat_ref, out_ref, fx_ref, *, p, sr, scale, h, w):
    cb = feat_ref.shape[-1]
    hp = _hp(h)
    prec = _precision(fx_ref.dtype)
    rois = rois_ref[:, :]                                # (RT, 4)

    # Transpose the feature block to x-major ONCE per channel block (rti is
    # the inner grid dim), zero-padding H to hp; per-step transposes were
    # the kernel's original dominant cost.
    @pl.when(pl.program_id(1) == 0)
    def _():
        ft = feat_ref[0, :, :, :].transpose(1, 0, 2)     # (W, H, CB)
        ft = jnp.pad(ft, ((0, 0), (0, hp - h), (0, 0)))
        fx_ref[:, :] = ft.reshape(w, hp * cb)

    ay = _tile_matrices(rois, 1, 3, h, p, sr, scale, fx_ref.dtype)  # (RT, p, H)
    ax = _tile_matrices(rois, 0, 2, w, p, sr, scale, fx_ref.dtype)  # (RT, p, W)

    # Stacked x-contraction with px-MAJOR rows: (p*RT, W) @ (W, HP*CB).
    # px-major makes each px's slab a contiguous aligned row block, so the
    # (RT, HP*CB) → (RT*HP, CB) minor-split reshape below is cheap.
    g = jnp.dot(ax.transpose(1, 0, 2).reshape(p * ROI_TILE, w), fx_ref[:, :],
                preferred_element_type=jnp.float32, precision=prec)
    g = g.astype(fx_ref.dtype)                           # (p*RT, HP*CB)

    # y-contraction as ONE aligned block-diagonal matmul instead of a
    # batched dot_general (which lowers to RT serial M=7 MXU passes whose
    # per-pass overhead dominated: 26 of 35 µs/step).  Measured 10.8 ms →
    # 4.3 ms at the 8×(304 roi, 50×76×1024) detect shape.  Rejected
    # alternatives (measured): explicit px↔H transpose (+40 µs/step in
    # Mosaic relayouts, aligned or not), CHAN_BLOCK 256/1024 (±10%).
    slabs = [g[px * ROI_TILE:(px + 1) * ROI_TILE, :].reshape(ROI_TILE * hp, cb)
             for px in range(p)]
    g2 = jnp.concatenate(slabs, axis=1)                  # (RT*HP, p*CB)
    ayp = jnp.pad(ay, ((0, 0), (0, 8 - p % 8 if p % 8 else 0), (0, hp - h)))
    pp = ayp.shape[1]                                    # p padded to 8 rows
    ay_f = ayp.reshape(ROI_TILE * pp, hp)
    row_r = jax.lax.broadcasted_iota(
        jnp.int32, (ROI_TILE * pp, ROI_TILE * hp), 0) // pp
    lane_r = jax.lax.broadcasted_iota(
        jnp.int32, (ROI_TILE * pp, ROI_TILE * hp), 1) // hp
    aybd = jnp.where(row_r == lane_r,
                     jnp.tile(ay_f, (1, ROI_TILE)), 0).astype(ay.dtype)
    out = jnp.dot(aybd, g2, preferred_element_type=jnp.float32,
                  precision=prec)                        # (RT*pp, p*CB)
    out = out.reshape(ROI_TILE, pp, p, cb)[:, :p]
    out_ref[:, :, :, :] = out.astype(out_ref.dtype)      # (RT, py, px, CB)


def _bwd_kernel(rois_ref, g_ref, dfeat_ref, dfx_ref, *, p, sr, scale, h, w):
    """Adjoint of the v4 forward, run transpose-free: dFX = AX_s^T ·
    unconcat(AYbd^T · dOUT), accumulated in the same x-major (W, HP*CB)
    layout the forward reads from, then un-transposed ONCE per channel
    block at the last roi tile.  (The previous form — batched K=7
    dot_general + a 17 MB Mosaic transpose per step — cost ~12 ms at the
    8×128-roi train shape; this one ~3 ms.)"""
    rt_i = pl.program_id(1)
    cb = dfeat_ref.shape[-1]
    hp = _hp(h)
    dtype = g_ref.dtype
    prec = _precision(dtype)
    rois = rois_ref[:, :]
    ay = _tile_matrices(rois, 1, 3, h, p, sr, scale, dtype)   # (RT, p, H)
    ax = _tile_matrices(rois, 0, 2, w, p, sr, scale, dtype)   # (RT, p, W)

    @pl.when(rt_i == 0)
    def _():
        dfx_ref[:, :] = jnp.zeros_like(dfx_ref[:, :])

    # dOUT rows (r, py_pad) / lanes (px, cb) — pad py to a sublane multiple
    # so the outer merge is aligned (generic like the forward: POOLING_SIZE
    # may exceed 8); the px sublane→lane move is a small (~1.6 MB) relayout
    dout = g_ref[:, :, :, :]                                  # (RT, py, px, CB)
    pp = (p + 7) // 8 * 8
    dout = jnp.pad(dout, ((0, 0), (0, pp - p), (0, 0), (0, 0)))
    dout2 = dout.reshape(ROI_TILE * pp, p * cb)

    # transposed block-diagonal Ay: (RT*HP, RT*8)
    ayp = jnp.pad(ay, ((0, 0), (0, pp - p), (0, hp - h)))     # (RT, 8, HP)
    ay_t = ayp.reshape(ROI_TILE * pp, hp).T                   # (HP, RT*8)
    row_r = jax.lax.broadcasted_iota(
        jnp.int32, (ROI_TILE * hp, ROI_TILE * pp), 0) // hp
    lane_r = jax.lax.broadcasted_iota(
        jnp.int32, (ROI_TILE * hp, ROI_TILE * pp), 1) // pp
    aybd_t = jnp.where(row_r == lane_r,
                       jnp.tile(ay_t, (ROI_TILE, 1)), 0).astype(dtype)
    dg2 = jnp.dot(aybd_t, dout2, preferred_element_type=jnp.float32,
                  precision=prec).astype(dtype)               # (RT*HP, p*CB)

    # reverse of the forward's slab split: per-px lane slice → aligned
    # minor-merge → px-major sublane stack
    dg = jnp.concatenate(
        [dg2[:, px * cb:(px + 1) * cb].reshape(ROI_TILE, hp * cb)
         for px in range(p)], axis=0)                         # (p*RT, HP*CB)
    # dFX += AX_s^T @ dG: contract the stacked px-major roi rows
    upd = jax.lax.dot_general(
        ax.transpose(1, 0, 2).reshape(p * ROI_TILE, w), dg,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)   # (W, HP*CB)
    dfx_ref[:, :] = dfx_ref[:, :] + upd

    @pl.when(rt_i == pl.num_programs(1) - 1)
    def _():
        dfx = dfx_ref[:, :].reshape(w, hp, cb)[:, :h, :]
        dfeat_ref[0, :, :, :] = dfx.transpose(1, 0, 2).astype(dfeat_ref.dtype)


def _xfirst_tile_out(rois, sel, fx, h, w, cb, *, p, sr, scale, rt):
    """The x-first pooled tile for one level: (RT, p, p, CB) f32, rows whose
    sel is False zeroed.  fx: the level's x-major (W, HP*CB) scratch view.
    Shared verbatim by the per-level and the merged multilevel kernels so
    their outputs are bit-identical."""
    hp = _hp(h)
    prec = _precision(fx.dtype)
    ay = _tile_matrices(rois, 1, 3, h, p, sr, scale, fx.dtype)
    ax = _tile_matrices(rois, 0, 2, w, p, sr, scale, fx.dtype)
    g = jnp.dot(ax.transpose(1, 0, 2).reshape(p * rt, w), fx,
                preferred_element_type=jnp.float32, precision=prec)
    g = g.astype(fx.dtype)
    slabs = [g[px * rt:(px + 1) * rt, :].reshape(rt * hp, cb)
             for px in range(p)]
    g2 = jnp.concatenate(slabs, axis=1)
    ayp = jnp.pad(ay, ((0, 0), (0, 8 - p % 8 if p % 8 else 0),
                       (0, hp - h)))
    pp = ayp.shape[1]
    ay_f = ayp.reshape(rt * pp, hp)
    row_r = jax.lax.broadcasted_iota(jnp.int32, (rt * pp, rt * hp), 0) // pp
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (rt * pp, rt * hp), 1) // hp
    aybd = jnp.where(row_r == lane_r,
                     jnp.tile(ay_f, (1, rt)), 0).astype(ay.dtype)
    out = jnp.dot(aybd, g2, preferred_element_type=jnp.float32,
                  precision=prec)
    out = out.reshape(rt, pp, p, cb)[:, :p]
    return jnp.where(sel[:, None, None, None], out, 0.0)


def _fill_fx(feat_ref, fx_ref, h, w, cb):
    """Fill a level's x-major (W, HP*CB) scratch from its natural-layout
    feature block (once per channel block — rti is the inner grid dim)."""
    ft = feat_ref[0, :, :, :].transpose(1, 0, 2)
    ft = jnp.pad(ft, ((0, 0), (0, _hp(h) - h), (0, 0)))
    fx_ref[:, :] = ft.reshape(w, _hp(h) * cb)


def _fwd_kernel_lv(rois_ref, lv_ref, feat_ref, out_ref, fx_ref, *,
                   p, sr, scale, h, w, level, rt):
    """Level-gated forward: rows whose lv != level write 0, and a tile with
    no roi at `level` skips both matmuls entirely (rois arrive sorted by
    level, so per level only ~contiguous-run tiles are active).  Otherwise
    identical to _fwd_kernel."""
    cb = feat_ref.shape[-1]
    sel = lv_ref[:, 0] == level                          # (RT,)
    active = jnp.any(sel)

    @pl.when(pl.program_id(1) == 0)
    def _():
        _fill_fx(feat_ref, fx_ref, h, w, cb)

    @pl.when(active)
    def _():
        out = _xfirst_tile_out(rois_ref[:, :], sel, fx_ref[:, :], h, w, cb,
                               p=p, sr=sr, scale=scale, rt=rt)
        out_ref[:, :, :, :] = out.astype(out_ref.dtype)

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[:, :, :, :] = jnp.zeros_like(out_ref)


def _fwd_kernel_ml(rois_ref, lv_ref, *refs, p, sr, levels, hws, scales, rt):
    """Merged x-first forward over several pyramid levels in ONE launch.

    refs order: n feature blocks, the shared out block, n fx scratches.
    Each grid step initializes its out tile once and lets every ACTIVE
    level's branch accumulate its rows (row supports are disjoint — each
    roi belongs to one level).  Replaces n separate launches whose
    inactive roi tiles still paid a grid step each: at the 800x1216 detect
    shape that is 3x(2 cb x 19 tiles x 8 images) steps folded into
    1x(2 x 19 x 8) (PROFILE_r04 §7).  Per-level math is _xfirst_tile_out —
    bit-identical to the per-level kernels."""
    n = len(levels)
    feat_refs = refs[:n]
    out_ref = refs[n]
    fx_refs = refs[n + 1:]
    lv = lv_ref[:, 0]
    rois = rois_ref[:, :]
    out_ref[:, :, :, :] = jnp.zeros_like(out_ref)

    for i in range(n):
        h, w = hws[i]
        cb = feat_refs[i].shape[-1]

        @pl.when(pl.program_id(1) == 0)
        def _(i=i, h=h, w=w, cb=cb):
            _fill_fx(feat_refs[i], fx_refs[i], h, w, cb)

        sel = lv == levels[i]

        @pl.when(jnp.any(sel))
        def _(i=i, h=h, w=w, cb=cb, sel=sel):
            out = _xfirst_tile_out(rois, sel, fx_refs[i][:, :], h, w, cb,
                                   p=p, sr=sr, scale=scales[i], rt=rt)
            out_ref[:, :, :, :] = (out_ref[:, :, :, :]
                                   + out.astype(out_ref.dtype))


def _bwd_kernel_lv(rois_ref, lv_ref, g_ref, dfeat_ref, dfx_ref, *,
                   p, sr, scale, h, w, level, rt):
    """Level-gated adjoint: incoming dOUT rows whose lv != level are masked
    to zero and inactive tiles skip the matmuls; accumulation/final-write
    structure identical to _bwd_kernel."""
    rt_i = pl.program_id(1)
    cb = dfeat_ref.shape[-1]
    hp = _hp(h)
    dtype = g_ref.dtype
    prec = _precision(dtype)
    sel = lv_ref[:, 0] == level
    active = jnp.any(sel)

    @pl.when(rt_i == 0)
    def _():
        dfx_ref[:, :] = jnp.zeros_like(dfx_ref[:, :])

    @pl.when(active)
    def _():
        rois = rois_ref[:, :]
        ay = _tile_matrices(rois, 1, 3, h, p, sr, scale, dtype)
        ax = _tile_matrices(rois, 0, 2, w, p, sr, scale, dtype)
        dout = g_ref[:, :, :, :]
        dout = jnp.where(sel[:, None, None, None], dout, 0.0)
        pp = (p + 7) // 8 * 8
        dout = jnp.pad(dout, ((0, 0), (0, pp - p), (0, 0), (0, 0)))
        dout2 = dout.reshape(rt * pp, p * cb)
        ayp = jnp.pad(ay, ((0, 0), (0, pp - p), (0, hp - h)))
        ay_t = ayp.reshape(rt * pp, hp).T
        row_r = jax.lax.broadcasted_iota(jnp.int32, (rt * hp, rt * pp), 0) // hp
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (rt * hp, rt * pp), 1) // pp
        aybd_t = jnp.where(row_r == lane_r,
                           jnp.tile(ay_t, (rt, 1)), 0).astype(dtype)
        dg2 = jnp.dot(aybd_t, dout2, preferred_element_type=jnp.float32,
                      precision=prec).astype(dtype)
        dg = jnp.concatenate(
            [dg2[:, px * cb:(px + 1) * cb].reshape(rt, hp * cb)
             for px in range(p)], axis=0)
        upd = jax.lax.dot_general(
            ax.transpose(1, 0, 2).reshape(p * rt, w), dg,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        dfx_ref[:, :] = dfx_ref[:, :] + upd

    @pl.when(rt_i == pl.num_programs(1) - 1)
    def _():
        dfx = dfx_ref[:, :].reshape(w, hp, cb)[:, :h, :]
        dfeat_ref[0, :, :, :] = dfx.transpose(1, 0, 2).astype(dfeat_ref.dtype)


def _fwd_kernel_lv_yf(rois_ref, lv_ref, feat_ref, out_ref, *,
                      p, sr, scale, h, w, level, rt):
    """Transpose-free y-first level forward for levels too large for the
    x-first kernel's transposed fx scratch (the 800x1216 bucket's P2).

    Contract over H FIRST against the feature block in its NATURAL layout —
    (h, w, cb) reshaped (h, w*cb) is an aligned minor-merge, so no in-kernel
    transpose and no (w, hp*cb) scratch copy:

        g_y = Ay_py-major (p*RT, h) @ F (h, w*cb)      # rows (py, r)
        g2  = lane-concat of per-py slabs               # (RT*w, p*cb)
        out = Axbd (RT*pp, RT*w) @ g2                   # rows (r, px)

    The result rows come out (r, px, py, cb) — the WRAPPER swaps the two
    pooled axes back to the (r, py, px, cb) convention (a cheap XLA
    transpose of the small pooled array, outside the kernel).  Level gating
    identical to _fwd_kernel_lv."""
    cb = feat_ref.shape[-1]
    prec = _precision(feat_ref.dtype)
    sel = lv_ref[:, 0] == level
    active = jnp.any(sel)

    @pl.when(active)
    def _():
        rois = rois_ref[:, :]
        ay = _tile_matrices(rois, 1, 3, h, p, sr, scale, feat_ref.dtype)
        ax = _tile_matrices(rois, 0, 2, w, p, sr, scale, feat_ref.dtype)
        f2 = feat_ref[0, :, :, :].reshape(h, w * cb)     # aligned minor-merge
        g = jnp.dot(ay.transpose(1, 0, 2).reshape(p * rt, h), f2,
                    preferred_element_type=jnp.float32, precision=prec)
        g = g.astype(feat_ref.dtype)                     # (p*RT, w*cb)
        slabs = [g[py * rt:(py + 1) * rt, :].reshape(rt * w, cb)
                 for py in range(p)]
        g2 = jnp.concatenate(slabs, axis=1)              # (RT*w, p*cb)
        axp = jnp.pad(ax, ((0, 0), (0, 8 - p % 8 if p % 8 else 0), (0, 0)))
        pp = axp.shape[1]
        ax_f = axp.reshape(rt * pp, w)
        row_r = jax.lax.broadcasted_iota(jnp.int32, (rt * pp, rt * w), 0) // pp
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (rt * pp, rt * w), 1) // w
        axbd = jnp.where(row_r == lane_r,
                         jnp.tile(ax_f, (1, rt)), 0).astype(ax.dtype)
        out = jnp.dot(axbd, g2, preferred_element_type=jnp.float32,
                      precision=prec)                    # (RT*pp, p*CB)
        out = out.reshape(rt, pp, p, cb)[:, :p]          # (r, px, py, cb)
        out = jnp.where(sel[:, None, None, None], out, 0.0)
        out_ref[:, :, :, :] = out.astype(out_ref.dtype)

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[:, :, :, :] = jnp.zeros_like(out_ref)


def _bwd_kernel_lv_yf(rois_ref, lv_ref, g_ref, dfeat_ref, acc_ref, *,
                      p, sr, scale, h, w, level, rt, h_chunk):
    """Adjoint of _fwd_kernel_lv_yf: dF accumulated in the NATURAL (h, w*cb)
    layout (no final transpose).  The wrapper pre-swaps incoming dOut to the
    kernel's (r, px, py, cb) order.  The H-side update matmul runs in
    h_chunk (= YF_H_CHUNK) row blocks so the f32 transient stays small; the
    accumulator scratch is f32 so cross-roi-tile accumulation matches the
    x-first kernel's precision even with bf16 features (ADVICE r2)."""
    rt_i = pl.program_id(1)
    cb = dfeat_ref.shape[-1]
    dtype = g_ref.dtype
    prec = _precision(dtype)
    sel = lv_ref[:, 0] == level
    active = jnp.any(sel)

    @pl.when(rt_i == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref[:, :])

    @pl.when(active)
    def _():
        rois = rois_ref[:, :]
        ay = _tile_matrices(rois, 1, 3, h, p, sr, scale, dtype)
        ax = _tile_matrices(rois, 0, 2, w, p, sr, scale, dtype)
        dout = g_ref[:, :, :, :]                         # (RT, px, py, CB)
        dout = jnp.where(sel[:, None, None, None], dout, 0.0)
        pp = (p + 7) // 8 * 8
        dout = jnp.pad(dout, ((0, 0), (0, pp - p), (0, 0), (0, 0)))
        dout2 = dout.reshape(rt * pp, p * cb)            # rows (r, px)
        axp = jnp.pad(ax, ((0, 0), (0, pp - p), (0, 0)))
        ax_t = axp.reshape(rt * pp, w).T                 # (w, RT*pp)
        row_r = jax.lax.broadcasted_iota(jnp.int32, (rt * w, rt * pp), 0) // w
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (rt * w, rt * pp), 1) // pp
        axbd_t = jnp.where(row_r == lane_r,
                           jnp.tile(ax_t, (rt, 1)), 0).astype(dtype)
        dg2 = jnp.dot(axbd_t, dout2, preferred_element_type=jnp.float32,
                      precision=prec).astype(dtype)      # (RT*w, p*CB)
        dg = jnp.concatenate(
            [dg2[:, py * cb:(py + 1) * cb].reshape(rt, w * cb)
             for py in range(p)], axis=0)                # (p*RT, w*CB)
        ay_s = ay.transpose(1, 0, 2).reshape(p * rt, h)  # rows (py, r)
        for h0 in range(0, h, h_chunk):
            hc = min(h_chunk, h - h0)
            upd = jax.lax.dot_general(
                ay_s[:, h0:h0 + hc], dg,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)                          # (hc, w*CB)
            acc_ref[h0:h0 + hc, :] = (acc_ref[h0:h0 + hc, :]
                                      + upd.astype(acc_ref.dtype))

    @pl.when(rt_i == pl.num_programs(1) - 1)
    def _():
        dfeat_ref[0, :, :, :] = acc_ref[:, :].reshape(
            h, w, cb).astype(dfeat_ref.dtype)


def level_fits_vmem(h: int, w: int, c: int, roi_tile: int = ROI_TILE,
                    p: int = 7, chan_block: int = None) -> bool:
    """Whether the level kernels fit the v5e's 128 MB VMEM at this feature
    shape.  Mosaic's scoped-stack accounting runs ~2.4x the naive live-set
    estimate (measured: 121 MB scoped at (152, 256, cb=128, rt=16) vs ~50 MB
    naive), so gate on the calibrated model with headroom."""
    cb = min(chan_block or LEVEL_CHAN_BLOCK, c)
    hp = _hp(h)
    naive = (hp * w * cb * (2 + 2 + 2)            # fx scratch + feat x2 (bf16)
             + p * roi_tile * hp * cb * (4 + 2 + 2)   # g f32 + bf16 + g2
             + roi_tile * 8 * roi_tile * hp * 2)      # aybd
    return naive * 2.45 < 120 * 1024 * 1024


def yfirst_fits_vmem(h: int, w: int, c: int, roi_tile: int, p: int = 7,
                     chan_block: int = None, bwd: bool = False) -> bool:
    """VMEM model for the y-first level kernels.  No x-major fx scratch —
    the feature block is consumed in its natural layout — so the live set
    is much smaller than the x-first kernels'; Mosaic's scoped accounting
    runs ~2.0x this naive estimate here (measured on-chip: the (200, 304,
    256) rt=8 forward compiles under the 126 MB limit where 2.45x of naive
    49 MB would not)."""
    cb = min(chan_block or LEVEL_CHAN_BLOCK, c)
    if bwd:
        naive = (h * w * cb * 4                         # f32 dF accumulator
                 + p * roi_tile * w * cb * (4 + 2 + 2)  # dg2 f32+bf16, dg
                 + min(YF_H_CHUNK, h) * w * cb * 4      # chunked upd transient
                 + roi_tile * 8 * roi_tile * w * 2)     # axbd_t
    else:
        naive = (h * w * cb * 2 * 2                # feat block (+double buffer)
                 + p * roi_tile * w * cb * (4 + 2 + 2)  # g_y f32 + bf16 + g2
                 + roi_tile * 8 * roi_tile * w * 2)     # axbd
    return naive * 2.0 < 120 * 1024 * 1024


def level_tile_params(h: int, w: int, c: int, p: int = 7):
    """(roi_tile, chan_block, variant) the level kernels can run at this
    feature shape, or None if nothing fits the v5e VMEM budget.  Prefers the
    x-first kernels (measured fastest at <=608x1024-class buckets); levels
    too large for them — the 800x1216 bucket's P2 (200, 304, 256) — fall to
    the transpose-free y-first variant, which keeps the feature block in its
    natural layout and therefore fits; only absurd shapes return None.
    Channel blocks below 128 are lane-illegal for blocked Pallas operands,
    so only the roi tile and the contraction order are searched."""
    if c % min(LEVEL_CHAN_BLOCK, c) != 0:
        return None
    for rt in (ROI_TILE, 8):
        if level_fits_vmem(h, w, c, rt, p):
            return rt, min(LEVEL_CHAN_BLOCK, c), "xfirst"
    for rt in (ROI_TILE, 8):
        if (yfirst_fits_vmem(h, w, c, rt, p)
                and yfirst_fits_vmem(h, w, c, rt, p, bwd=True)):
            return rt, min(LEVEL_CHAN_BLOCK, c), "yfirst"
    return None


LEVEL_CHAN_BLOCK = 128  # level kernels run tighter VMEM (P2 is large)
YF_H_CHUNK = 64  # y-first bwd H-matmul row block; yfirst_fits_vmem models it


def _pad_rois_lv(rois, lv, rt, r_pad=None):
    """Pad rois/levels to a roi-tile multiple (lv pad = -1, never a real
    level, so pad rows are inactive in every tile).  With ``r_pad`` the
    caller pins the padded row count (must be a tile multiple >= R) so
    several per-level launches emit identically-shaped outputs."""
    r = rois.shape[0]
    if r_pad is None:
        r_pad = r + (-r) % rt
    assert r_pad >= r and r_pad % rt == 0, (r, r_pad, rt)
    pad = r_pad - r
    if pad:
        rois = jnp.pad(rois, ((0, pad), (0, 0)))
        lv = jnp.pad(lv, (0, pad), constant_values=-1)
    return rois, lv, r


def roi_align_level_fwd(feat, rois, roi_levels, level: int, p: int,
                        scale: float, sr: int, roi_tile: int = ROI_TILE,
                        variant: str = "xfirst", interpret: bool = False,
                        r_pad: int | None = None):
    """Forward RoIAlign of `rois` against ONE pyramid level: rows with
    roi_levels != level come back zero.  rois should be sorted by level so
    inactive roi tiles skip compute.  feat (H, W, C) → (R, p, p, C).
    variant 'yfirst' selects the transpose-free large-level kernel (see
    level_tile_params).  With ``r_pad`` the PADDED (R_pad, p, p, C) output
    is returned un-sliced: slicing a pallas custom-call output back to R
    costs a full copy of the tensor (61 MB at 800×1216 B8 — PROFILE_r05
    §5's pool in-situ residual), whereas pad rows are zeros a
    row-equivariant consumer drops for free at its own (small) output."""
    h, w, c = feat.shape
    rois_p, lv_p, r_orig = _pad_rois_lv(rois, roi_levels, roi_tile, r_pad)
    rt_n = rois_p.shape[0] // roi_tile
    cbl = _chan_block(c, LEVEL_CHAN_BLOCK)
    yfirst = variant == "yfirst"
    kfn = _fwd_kernel_lv_yf if yfirst else _fwd_kernel_lv
    kernel = functools.partial(kfn, p=p, sr=sr, scale=scale,
                               h=h, w=w, level=level, rt=roi_tile)
    out = pl.pallas_call(
        kernel,
        grid=(c // cbl, rt_n),
        in_specs=[
            pl.BlockSpec((roi_tile, 4), lambda cb, rti: (rti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((roi_tile, 1), lambda cb, rti: (rti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, cbl), lambda cb, rti: (0, 0, 0, cb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((roi_tile, p, p, cbl),
                               lambda cb, rti: (rti, 0, 0, cb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rois_p.shape[0], p, p, c), feat.dtype),
        scratch_shapes=([] if yfirst
                        else [pltpu.VMEM((w, _hp(h) * cbl), feat.dtype)]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024),
        interpret=interpret,
    )(rois_p, lv_p[:, None], feat[None])
    if yfirst:
        out = out.swapaxes(1, 2)     # kernel emits (r, px, py, cb)
    return out if r_pad is not None else out[:r_orig]


def merged_tail_fits(hw_list, c: int, rt: int, p: int = 7) -> bool:
    """VMEM model for _fwd_kernel_ml: every merged level's feature block and
    fx scratch is live simultaneously; the per-branch transients are scoped,
    so only the largest level's count.  Same 2.45x Mosaic scoped-stack
    factor as level_fits_vmem."""
    cb = min(LEVEL_CHAN_BLOCK, c)
    naive = sum(_hp(h) * w * cb * (2 + 2 + 2) for h, w in hw_list)
    trans = max(p * rt * _hp(h) * cb * (4 + 2 + 2)
                + rt * 8 * rt * _hp(h) * 2 for h, w in hw_list)
    return (naive + trans) * 2.45 < 120 * 1024 * 1024


def roi_align_levels_fwd_merged(feats, rois, roi_levels, level_ids, p: int,
                                scales, sr: int, roi_tile: int,
                                interpret: bool = False):
    """Forward RoIAlign of `rois` against SEVERAL x-first pyramid levels in
    one launch (see _fwd_kernel_ml).  feats: list of (H_l, W_l, C) maps;
    level_ids: the lv value owning each feats entry; rows whose lv is not
    in level_ids come back zero.  Returns (R, p, p, C)."""
    c = feats[0].shape[-1]
    rois_p, lv_p, r_orig = _pad_rois_lv(rois, roi_levels, roi_tile)
    rt_n = rois_p.shape[0] // roi_tile
    cbl = _chan_block(c, LEVEL_CHAN_BLOCK)
    hws = tuple((f.shape[0], f.shape[1]) for f in feats)
    kernel = functools.partial(_fwd_kernel_ml, p=p, sr=sr,
                               levels=tuple(level_ids), hws=hws,
                               scales=tuple(scales), rt=roi_tile)
    dtype = feats[0].dtype
    out = pl.pallas_call(
        kernel,
        grid=(c // cbl, rt_n),
        in_specs=[
            pl.BlockSpec((roi_tile, 4), lambda cb, rti: (rti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((roi_tile, 1), lambda cb, rti: (rti, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, h, w, cbl), lambda cb, rti: (0, 0, 0, cb),
                         memory_space=pltpu.VMEM)
            for h, w in hws
        ],
        out_specs=pl.BlockSpec((roi_tile, p, p, cbl),
                               lambda cb, rti: (rti, 0, 0, cb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rois_p.shape[0], p, p, c), dtype),
        scratch_shapes=[pltpu.VMEM((w, _hp(h) * cbl), dtype) for h, w in hws],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024),
        interpret=interpret,
    )(rois_p, lv_p[:, None], *[f[None] for f in feats])
    return out[:r_orig]


def roi_align_level_bwd(g, rois, roi_levels, level: int, h: int, w: int,
                        dtype, p: int, scale: float, sr: int,
                        roi_tile: int = ROI_TILE, variant: str = "xfirst",
                        interpret: bool = False, r_pad: int | None = None):
    """Adjoint of roi_align_level_fwd w.r.t. the level's features: dOut rows
    of other levels are ignored.  g (R, p, p, C) → dfeat (H, W, C).  With
    ``r_pad``, g already carries R_pad rows (the fwd emitted the padded
    output); the pad rows' lv stays -1 so their cotangent — zero anyway,
    scattered by the caller's take() adjoint — never touches dfeat."""
    c = g.shape[-1]
    rois_p, lv_p, r_orig = _pad_rois_lv(rois, roi_levels, roi_tile, r_pad)
    if r_pad is not None:
        assert g.shape[0] == r_pad, (g.shape, r_pad)
    pad = rois_p.shape[0] - g.shape[0]
    if pad:
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0), (0, 0)))
    rt_n = rois_p.shape[0] // roi_tile
    cbl = _chan_block(c, LEVEL_CHAN_BLOCK)
    yfirst = variant == "yfirst"
    if yfirst:
        g = g.swapaxes(1, 2)         # feed the kernel its (r, px, py, cb) order
        kernel = functools.partial(_bwd_kernel_lv_yf, p=p, sr=sr, scale=scale,
                                   h=h, w=w, level=level, rt=roi_tile,
                                   h_chunk=YF_H_CHUNK)
        scratch = [pltpu.VMEM((h, w * cbl), jnp.float32)]
    else:
        kernel = functools.partial(_bwd_kernel_lv, p=p, sr=sr, scale=scale,
                                   h=h, w=w, level=level, rt=roi_tile)
        scratch = [pltpu.VMEM((w, _hp(h) * cbl), jnp.float32)]
    dfeat = pl.pallas_call(
        kernel,
        grid=(c // cbl, rt_n),
        in_specs=[
            pl.BlockSpec((roi_tile, 4), lambda cb, rti: (rti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((roi_tile, 1), lambda cb, rti: (rti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((roi_tile, p, p, cbl),
                         lambda cb, rti: (rti, 0, 0, cb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cbl), lambda cb, rti: (0, 0, 0, cb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, h, w, c), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024),
        interpret=interpret,
    )(rois_p, lv_p[:, None], g)
    return dfeat[0]


def _pad_rois(rois):
    r = rois.shape[0]
    pad = (-r) % ROI_TILE
    if pad:
        rois = jnp.pad(rois, ((0, pad), (0, 0)))
    return rois, r


def _chan_block(c: int, limit: int = None) -> int:
    cb = min(limit or CHAN_BLOCK, c)
    while c % cb != 0:
        cb //= 2
    return cb


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def roi_align_pallas(feat, rois, output_size: int = 7,
                     spatial_scale: float = 1.0 / 16.0, sampling_ratio: int = 2,
                     interpret: bool = False, pad_rows: bool = False):
    """RoIAlign: feat (H, W, C), rois (R, 4) → (R, p, p, C).  Same semantics
    as ops.roi_align.roi_align.  interpret=True runs the Pallas interpreter
    (CPU CI of the kernel logic; compiled path is TPU-only).  pad_rows=True
    returns the ROI_TILE-padded (R_pad, p, p, C) rows un-sliced (pad rows
    are zeros): slicing a pallas output back to R costs a full copy of the
    tensor — ~240 MB/batch on the C4 detect path (C=1024, B8 N=300) — while
    a row-equivariant head drops pad rows for free at its own small
    output."""
    return _fwd(feat, rois, output_size, spatial_scale, sampling_ratio,
                interpret, pad_rows)


def _fwd(feat, rois, p, scale, sr, interpret=False, pad_rows=False):
    h, w, c = feat.shape
    rois_p, r_orig = _pad_rois(rois)
    rt = rois_p.shape[0] // ROI_TILE
    cbl = _chan_block(c)
    kernel = functools.partial(_fwd_kernel, p=p, sr=sr, scale=scale, h=h, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(c // cbl, rt),
        in_specs=[
            pl.BlockSpec((ROI_TILE, 4), lambda cb, rti: (rti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, cbl), lambda cb, rti: (0, 0, 0, cb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROI_TILE, p, p, cbl),
                               lambda cb, rti: (rti, 0, 0, cb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rois_p.shape[0], p, p, c), feat.dtype),
        scratch_shapes=[pltpu.VMEM((w, _hp(h) * cbl), feat.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rois_p, feat[None])
    return out if pad_rows else out[:r_orig]


def _fwd_rule(feat, rois, p, scale, sr, interpret=False, pad_rows=False):
    # zero-size array carries feat's shape/dtype as a residual (static
    # metadata is not a valid jax residual type)
    shape_token = jnp.zeros((0,) + feat.shape, feat.dtype)
    return (_fwd(feat, rois, p, scale, sr, interpret, pad_rows),
            (shape_token, rois))


def _bwd_rule(p, scale, sr, interpret, pad_rows, res, g):
    shape_token, rois = res
    h, w, c = shape_token.shape[1:]
    dtype = shape_token.dtype
    rois_p, r_orig = _pad_rois(rois)
    # pad_rows fwd emitted R_pad rows, so g may already be padded
    pad = rois_p.shape[0] - g.shape[0]
    if pad:
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0), (0, 0)))
    rt = rois_p.shape[0] // ROI_TILE
    cbl = _chan_block(c)
    kernel = functools.partial(_bwd_kernel, p=p, sr=sr, scale=scale, h=h, w=w)
    dfeat = pl.pallas_call(
        kernel,
        grid=(c // cbl, rt),  # roi tiles inner: same out block accumulates
        in_specs=[
            pl.BlockSpec((ROI_TILE, 4), lambda cb, rti: (rti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROI_TILE, p, p, cbl), lambda cb, rti: (rti, 0, 0, cb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cbl), lambda cb, rti: (0, 0, 0, cb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, h, w, c), dtype),
        scratch_shapes=[pltpu.VMEM((w, _hp(h) * cbl), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rois_p, g)
    return dfeat[0], jnp.zeros_like(rois)


roi_align_pallas.defvjp(_fwd_rule, _bwd_rule)
