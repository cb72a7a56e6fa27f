"""Pallas TPU RoIAlign kernel (forward + custom VJP backward).

TPU-native replacement for the reference's CUDA RoIAlign
(``lib/layer_utils/roi_align/src/*.cu``, SURVEY.md #22).  The CUDA kernel
gathers 4 neighbours per sample point; a TPU wants matmuls, so this kernel
uses a **pooled separable-bilinear** formulation:

    out[r] = Ay[r] @ F @ Ax[r]^T        per channel,

where Ay (p, H) / Ax (p, W) are the bilinear interpolation matrices with the
sampling_ratio mean-pool *pre-folded in* (pooling is linear, so averaging the
sr sample rows of the interpolation matrix gives the exact same operator at
1/sr^2 the FLOPs).  Matrices are built in-kernel from roi coordinates with
iota comparisons — no gathers.

MXU utilization: a tile of ROI_TILE rois stacks its Ay matrices along the
matmul M dimension (ROI_TILE*p = 126 ≈ the 128-row MXU tile), so the big
F-contraction runs near full matrix-unit occupancy; only the small per-roi
x-contraction is batched.  Grid is (channel_blocks, roi_tiles): the feature
map streams through VMEM one channel block at a time.

Backward (dF only — rois are detached in the reference lineage):
dF = sum_r Ay[r]^T @ dOut[r] @ Ax[r], accumulated per channel block with
roi_tiles as the inner grid dimension (out block revisited; initialized at
the first visit), with the Ay^T contraction stacked exactly like forward.

Precision: f32 inputs use HIGHEST (needed for parity tests); bf16 feature
inputs use native bf16 MXU passes (production path).

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

ROI_TILE = 16   # 16 * 7 = 112 stacked matmul rows ≈ one 128-row MXU tile
                # (tile must be divisible by 8: Pallas block-shape rule)
CHAN_BLOCK = 128


def _precision(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _pooled_interp(coords, size: int, p: int, sr: int):
    """(p, size) interpolation matrix with the sr-sample mean folded in.

    coords: (p*sr, 1) f32 sample positions (torchvision border semantics).
    """
    n = p * sr
    empty = (coords < -1.0) | (coords > size)
    c = jnp.clip(coords, 0.0, size - 1.0)
    low = jnp.floor(c)
    ly = c - low
    low_i = low.astype(jnp.int32)
    high_i = jnp.minimum(low_i + 1, size - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, size), 1)
    w = jnp.where(cols == low_i, 1.0 - ly, 0.0)
    w = w + jnp.where(cols == high_i, ly, 0.0)
    w = jnp.where(empty, 0.0, w)
    # fold the mean over each group of sr sample rows
    return w.reshape(p, sr, size).sum(axis=1) * (1.0 / sr)


def _roi_matrices(roi, h, w, p, sr, scale, dtype):
    """Ay (p, H), Ax (p, W) for one roi."""
    x1 = roi[0] * scale
    y1 = roi[1] * scale
    x2 = roi[2] * scale
    y2 = roi[3] * scale
    bin_w = jnp.maximum(x2 - x1, 1.0) / p
    bin_h = jnp.maximum(y2 - y1, 1.0) / p
    n = p * sr
    # int iota then cast (tpu.iota only supports integer results)
    s = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(jnp.float32)
         + 0.5) / sr
    ay = _pooled_interp(y1 + s * bin_h, h, p, sr).astype(dtype)
    ax = _pooled_interp(x1 + s * bin_w, w, p, sr).astype(dtype)
    return ay, ax


def _fwd_kernel(rois_ref, feat_ref, out_ref, *, p, sr, scale, h, w):
    feat = feat_ref[0, :, :, :]                    # (H, W, CB)
    cb = feat.shape[-1]
    prec = _precision(feat.dtype)
    f2d = feat.reshape(h, w * cb)

    ays, axs = [], []
    for r in range(ROI_TILE):
        ay, ax = _roi_matrices(rois_ref[r, :], h, w, p, sr, scale, feat.dtype)
        ays.append(ay)
        axs.append(ax)
    ay_all = jnp.concatenate(ays, axis=0)          # (RT*p, H) — stacked M dim
    g_all = jnp.dot(ay_all, f2d, preferred_element_type=jnp.float32,
                    precision=prec)                # (RT*p, W*CB)
    g_all = g_all.astype(feat.dtype)
    for r in range(ROI_TILE):
        g_r = g_all[r * p:(r + 1) * p].reshape(p, w, cb)
        out_r = jax.lax.dot_general(
            axs[r], g_r,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                        # (p_x, p_y, CB)
        out_ref[r, :, :, :] = out_r.transpose(1, 0, 2).astype(out_ref.dtype)


def _bwd_kernel(rois_ref, g_ref, dfeat_ref, *, p, sr, scale, h, w):
    rt = pl.program_id(1)

    @pl.when(rt == 0)
    def _():
        dfeat_ref[0, :, :, :] = jnp.zeros_like(dfeat_ref[0, :, :, :])

    cb = dfeat_ref.shape[-1]
    prec = _precision(jnp.float32)
    ays, dgs = [], []
    for r in range(ROI_TILE):
        ay, ax = _roi_matrices(rois_ref[r, :], h, w, p, sr, scale, jnp.float32)
        dout = g_ref[r, :, :, :].astype(jnp.float32)   # (p_y, p_x, CB)
        # dG_r = dout @ Ax over x: (p_y, W, CB)
        dg = jax.lax.dot_general(
            dout.transpose(0, 2, 1).reshape(p * cb, p), ax,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                            # (p_y*CB, W)
        dgs.append(dg.reshape(p, cb, w).transpose(0, 2, 1).reshape(p, w * cb))
        ays.append(ay)
    ay_all = jnp.concatenate(ays, axis=0)              # (RT*p, H)
    dg_all = jnp.concatenate(dgs, axis=0)              # (RT*p, W*CB)
    # dF += Ay_all^T @ dG_all — stacked K dim fills the MXU
    upd = jax.lax.dot_general(
        ay_all, dg_all,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec)                                # (H, W*CB)
    acc = dfeat_ref[0, :, :, :].reshape(h, w * cb).astype(jnp.float32)
    dfeat_ref[0, :, :, :] = (acc + upd).reshape(h, w, cb).astype(dfeat_ref.dtype)


def _pad_rois(rois):
    r = rois.shape[0]
    pad = (-r) % ROI_TILE
    if pad:
        rois = jnp.pad(rois, ((0, pad), (0, 0)))
    return rois, r


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def roi_align_pallas(feat, rois, output_size: int = 7,
                     spatial_scale: float = 1.0 / 16.0, sampling_ratio: int = 2):
    """RoIAlign: feat (H, W, C), rois (R, 4) → (R, p, p, C).  Same semantics
    as ops.roi_align.roi_align."""
    return _fwd(feat, rois, output_size, spatial_scale, sampling_ratio)


def _fwd(feat, rois, p, scale, sr):
    h, w, c = feat.shape
    rois_p, r_orig = _pad_rois(rois)
    rt = rois_p.shape[0] // ROI_TILE
    cbl = min(CHAN_BLOCK, c)
    assert c % cbl == 0, f"channels {c} not divisible by {cbl}"
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(rois_p, feat[None])
    return out[:r_orig]


def _fwd_rule(feat, rois, p, scale, sr):
    # zero-size array carries feat's shape/dtype as a residual (static
    # metadata is not a valid jax residual type)
    shape_token = jnp.zeros((0,) + feat.shape, feat.dtype)
    return _fwd(feat, rois, p, scale, sr), (shape_token, rois)


def _bwd_rule(p, scale, sr, res, g):
    shape_token, rois = res
    h, w, c = shape_token.shape[1:]
    dtype = shape_token.dtype
    rois_p, r_orig = _pad_rois(rois)
    pad = rois_p.shape[0] - r_orig
    if pad:
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0), (0, 0)))
    rt = rois_p.shape[0] // ROI_TILE
    cbl = min(CHAN_BLOCK, c)
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(rois_p, g)
    return dfeat[0], jnp.zeros_like(rois)


roi_align_pallas.defvjp(_fwd_rule, _bwd_rule)
