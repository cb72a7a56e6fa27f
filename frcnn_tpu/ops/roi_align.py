"""RoI feature extraction: RoIAlign / RoIPool / crop-and-resize.

Replaces the reference's native RoI kernels (``lib/layer_utils/roi_align/src``
/ ``roi_pooling/src`` C/CUDA, or torchvision.ops on the 1.0 branch —
SURVEY.md #17/#22) and the three ``cfg.POOLING_MODE`` paths of
``Network._crop_pool_layer`` (reference ``lib/nets/network.py:~L230-L280``):

  * ``roi_align``            — 'align': bilinear sampling, torchvision
                               semantics (aligned=False), **fixed**
                               sampling_ratio (the adaptive ceil() of the
                               lineage is dynamic-shape-hostile; fixed 2 is
                               the Detectron standard — documented deviation);
  * ``roi_pool``             — 'pool': quantized max-bin pooling;
  * ``crop_and_resize_pool`` — 'crop': 2x-size bilinear crop + 2x2 maxpool
                               (the tf crop_and_resize lineage default).

TPU-first formulation: bilinear sampling is expressed **separably** as two
small matmuls per RoI — out = Wy @ F @ Wx^T per channel, where Wy/Wx are
(samples x H)/(samples x W) interpolation matrices with <=2 nonzeros per row.
That maps the whole op onto the MXU instead of scalar gathers.  The pure-jnp
version here (lax.map over RoI chunks to bound memory) is the numerical truth
for the Pallas kernel in ``frcnn_tpu/ops/pallas/roi_align_kernel.py``.

Gradients flow through everything (jnp ops only), so no custom_vjp is needed
for the reference path; the Pallas kernel defines one.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _pick_chunk(r: int, chunk: int) -> int:
    """Largest divisor of r that is <= chunk (bounds lax.map chunk memory)."""
    chunk = min(chunk, r)
    while r % chunk != 0:
        chunk -= 1
    return chunk


def _interp_matrix(coords, size: int):
    """Dense 1-D bilinear interpolation matrix.

    coords: (P,) continuous sample coordinates.  Returns (P, size) with
    torchvision RoIAlign border semantics: coordinate < -1 or > size → all
    zero (sample is empty); otherwise clamp to [0, size-1] and bilinear-weight
    the two neighbours.
    """
    empty = (coords < -1.0) | (coords > size)
    c = jnp.clip(coords, 0.0, size - 1.0)
    low = jnp.floor(c)
    ly = c - low
    low_i = low.astype(jnp.int32)
    high_i = jnp.minimum(low_i + 1, size - 1)
    w = (1.0 - ly)[:, None] * jax.nn.one_hot(low_i, size, dtype=coords.dtype)
    w = w + ly[:, None] * jax.nn.one_hot(high_i, size, dtype=coords.dtype)
    return jnp.where(empty[:, None], 0.0, w)


def _roi_align_one(feat, roi, output_size, spatial_scale, sampling_ratio):
    """RoIAlign for one RoI.  feat (H, W, C); roi (4,) image coords."""
    h, w, _ = feat.shape
    p = output_size
    sr = sampling_ratio

    x1 = roi[0] * spatial_scale
    y1 = roi[1] * spatial_scale
    x2 = roi[2] * spatial_scale
    y2 = roi[3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / p
    bin_h = roi_h / p

    # sample coordinates: (p * sr,) for each axis
    s = (jnp.arange(p * sr, dtype=feat.dtype) + 0.5) / sr  # in bin units
    ys = y1 + s * bin_h
    xs = x1 + s * bin_w

    wy = _interp_matrix(ys, h)  # (p*sr, H)
    wx = _interp_matrix(xs, w)  # (p*sr, W)

    # separable bilinear: two matmuls per channel (MXU-friendly).  HIGHEST
    # precision: interpolation weights must not go through bf16 passes on TPU
    # (FLOPs here are negligible; accuracy is not).
    g = jnp.einsum("qw,hwc->hqc", wx, feat, precision="highest")     # (H, p*sr, C)
    sampled = jnp.einsum("ph,hqc->pqc", wy, g, precision="highest")  # (p*sr, p*sr, C)
    # average the sr x sr samples per bin
    out = sampled.reshape(p, sr, p, sr, -1).mean(axis=(1, 3))
    return out


@partial(jax.jit, static_argnames=("output_size", "spatial_scale", "sampling_ratio", "chunk"))
def roi_align(feat, rois, output_size: int = 7, spatial_scale: float = 1.0 / 16.0,
              sampling_ratio: int = 2, chunk: int = 32):
    """RoIAlign: feat (H, W, C), rois (R, 4) image-coord boxes → (R, p, p, C).

    lax.map over chunks of ``chunk`` RoIs bounds the (chunk, H, p*sr, C)
    intermediate; R must be a multiple of chunk (callers pad RoIs anyway).
    """
    r = rois.shape[0]
    chunk = _pick_chunk(r, chunk)
    fn = partial(_roi_align_one, feat, output_size=output_size,
                 spatial_scale=spatial_scale, sampling_ratio=sampling_ratio)
    if r > chunk:
        batched = rois.reshape(r // chunk, chunk, 4)
        out = jax.lax.map(lambda rs: jax.vmap(fn)(rs), batched)
        return out.reshape((r,) + out.shape[2:])
    return jax.vmap(fn)(rois)


def _roi_pool_one(feat, roi, output_size, spatial_scale):
    """Exact quantized RoIPool for one RoI (Caffe/reference roi_pooling
    semantics): integer roi corners via round, bin [hstart, hend) ranges via
    floor/ceil (adjacent bins may overlap boundary cells), max over covered
    cells, empty bins → 0.  Max over a rectangle is separable: masked max
    over rows, then over cols."""
    h, w, _ = feat.shape
    p = output_size
    x1 = jnp.round(roi[0] * spatial_scale).astype(jnp.int32)
    y1 = jnp.round(roi[1] * spatial_scale).astype(jnp.int32)
    x2 = jnp.round(roi[2] * spatial_scale).astype(jnp.int32)
    y2 = jnp.round(roi[3] * spatial_scale).astype(jnp.int32)
    roi_w = jnp.maximum(x2 - x1 + 1, 1)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)

    # Bin ranges hstart = floor(b*roi_h/p), hend = ceil((b+1)*roi_h/p) in
    # exact integer arithmetic — float floor/ceil of products is sensitive to
    # XLA reassociation at exact-integer boundaries (observed under jit).
    pb = jnp.arange(p, dtype=jnp.int32)
    hs = jnp.clip(pb * roi_h // p + y1, 0, h)
    he = jnp.clip(((pb + 1) * roi_h + p - 1) // p + y1, 0, h)
    ws = jnp.clip(pb * roi_w // p + x1, 0, w)
    we = jnp.clip(((pb + 1) * roi_w + p - 1) // p + x1, 0, w)

    hh = jnp.arange(h, dtype=jnp.int32)
    ww = jnp.arange(w, dtype=jnp.int32)
    rowmask = (hh[None, :] >= hs[:, None]) & (hh[None, :] < he[:, None])  # (p, H)
    colmask = (ww[None, :] >= ws[:, None]) & (ww[None, :] < we[:, None])  # (p, W)

    neg = jnp.asarray(-jnp.inf, dtype=feat.dtype)
    # masked max over rows → (p, W, C), then over cols → (p, p, C)
    tmp = jax.vmap(lambda m: jnp.where(m[:, None, None], feat, neg).max(axis=0))(rowmask)
    out = jax.vmap(
        lambda m: jnp.where(m[None, :, None], tmp, neg).max(axis=1), out_axes=1
    )(colmask)
    return jnp.where(jnp.isfinite(out), out, 0.0)


@partial(jax.jit, static_argnames=("output_size", "spatial_scale", "chunk"))
def roi_pool(feat, rois, output_size: int = 7, spatial_scale: float = 1.0 / 16.0,
             chunk: int = 32):
    """RoIPool ('pool' mode): feat (H, W, C), rois (R, 4) → (R, p, p, C)."""
    r = rois.shape[0]
    chunk = _pick_chunk(r, chunk)
    fn = partial(_roi_pool_one, feat, output_size=output_size, spatial_scale=spatial_scale)
    if r > chunk:
        batched = rois.reshape(r // chunk, chunk, 4)
        out = jax.lax.map(lambda rs: jax.vmap(fn)(rs), batched)
        return out.reshape((r,) + out.shape[2:])
    return jax.vmap(fn)(rois)


def _crop_resize_one(feat, roi, crop_size, spatial_scale):
    """tf.crop_and_resize semantics for one RoI: corner-aligned linspace grid."""
    h, w, _ = feat.shape
    s = crop_size
    x1 = roi[0] * spatial_scale
    y1 = roi[1] * spatial_scale
    x2 = roi[2] * spatial_scale
    y2 = roi[3] * spatial_scale
    t = jnp.arange(s, dtype=feat.dtype) / (s - 1.0)
    ys = y1 + t * (y2 - y1)
    xs = x1 + t * (x2 - x1)
    wy = _interp_matrix(ys, h)
    wx = _interp_matrix(xs, w)
    g = jnp.einsum("qw,hwc->hqc", wx, feat, precision="highest")
    return jnp.einsum("ph,hqc->pqc", wy, g, precision="highest")  # (s, s, C)


@partial(jax.jit, static_argnames=("output_size", "spatial_scale", "chunk"))
def crop_and_resize_pool(feat, rois, output_size: int = 7,
                         spatial_scale: float = 1.0 / 16.0, chunk: int = 32):
    """'crop' mode: bilinear crop to (2p, 2p) then 2x2 max pool → (R, p, p, C).

    Matches the reference's F.affine_grid + grid_sample + max_pool2d path
    (network.py:~_crop_pool_layer, crop mode).
    """
    r = rois.shape[0]
    chunk = _pick_chunk(r, chunk)
    fn = partial(_crop_resize_one, feat, crop_size=2 * output_size,
                 spatial_scale=spatial_scale)
    if r > chunk:
        batched = rois.reshape(r // chunk, chunk, 4)
        crops = jax.lax.map(lambda rs: jax.vmap(fn)(rs), batched)
        crops = crops.reshape((r,) + crops.shape[2:])
    else:
        crops = jax.vmap(fn)(rois)
    p = output_size
    return crops.reshape(r, p, 2, p, 2, -1).max(axis=(2, 4))


def _roi_align_gather_chunk(feat_flat, h, w, rois, output_size, spatial_scale,
                            sampling_ratio):
    """Gather-based RoIAlign for a chunk of rois.  feat_flat: (H*W, C).

    4-neighbour gathers instead of interpolation matmuls: per-roi cost is
    independent of the feature-map size — the right formulation for large
    FPN levels (P2 at 800px is 200x304; the matmul form scales with H)."""
    p, sr = output_size, sampling_ratio
    r = rois.shape[0]
    dtype = feat_flat.dtype

    x1 = rois[:, 0:1] * spatial_scale
    y1 = rois[:, 1:2] * spatial_scale
    x2 = rois[:, 2:3] * spatial_scale
    y2 = rois[:, 3:4] * spatial_scale
    bin_w = jnp.maximum(x2 - x1, 1.0) / p
    bin_h = jnp.maximum(y2 - y1, 1.0) / p
    s = (jnp.arange(p * sr, dtype=dtype) + 0.5) / sr      # (p*sr,)
    ys = y1 + s[None, :] * bin_h                           # (R, p*sr)
    xs = x1 + s[None, :] * bin_w

    def neighbours(coords, size):
        empty = (coords < -1.0) | (coords > size)
        c = jnp.clip(coords, 0.0, size - 1.0)
        low = jnp.floor(c)
        frac = c - low
        low_i = low.astype(jnp.int32)
        high_i = jnp.minimum(low_i + 1, size - 1)
        return low_i, high_i, frac, empty

    yl, yh, fy, ey = neighbours(ys, h)
    xl, xh, fx, ex = neighbours(xs, w)

    # (R, p*sr_y, p*sr_x) flat indices for the 4 corners
    def flat(yi, xi):
        return (yi[:, :, None] * w + xi[:, None, :]).reshape(-1)

    g = lambda idx: feat_flat[idx].reshape(r, p * sr, p * sr, -1)
    v = (g(flat(yl, xl)) * ((1 - fy)[:, :, None] * (1 - fx)[:, None, :])[..., None]
         + g(flat(yl, xh)) * ((1 - fy)[:, :, None] * fx[:, None, :])[..., None]
         + g(flat(yh, xl)) * (fy[:, :, None] * (1 - fx)[:, None, :])[..., None]
         + g(flat(yh, xh)) * (fy[:, :, None] * fx[:, None, :])[..., None])
    valid = (~ey)[:, :, None, None] & (~ex)[:, None, :, None]
    v = jnp.where(valid, v, 0.0)
    return v.reshape(r, p, sr, p, sr, -1).mean(axis=(2, 4))


@partial(jax.jit, static_argnames=("output_size", "spatial_scale",
                                   "sampling_ratio", "chunk"))
def roi_align_gather(feat, rois, output_size: int = 7,
                     spatial_scale: float = 1.0 / 16.0, sampling_ratio: int = 2,
                     chunk: int = 64):
    """Gather-based RoIAlign: feat (H, W, C), rois (R, 4) → (R, p, p, C).

    Same semantics as ``roi_align``; preferred for large feature maps
    (FPN P2/P3) where the matmul formulation's cost grows with H."""
    h, w, c = feat.shape
    feat_flat = feat.reshape(h * w, c)
    r = rois.shape[0]
    chunk = _pick_chunk(r, chunk)
    fn = partial(_roi_align_gather_chunk, feat_flat, h, w,
                 output_size=output_size, spatial_scale=spatial_scale,
                 sampling_ratio=sampling_ratio)
    if r > chunk:
        batched = rois.reshape(r // chunk, chunk, 4)
        out = jax.lax.map(fn, batched)
        return out.reshape((r,) + out.shape[2:])
    return fn(rois)


def _roi_align_multilevel_chunk(table, dims, offsets, scales, rois, levels,
                                output_size, sampling_ratio):
    """Gather-based RoIAlign for a chunk of rois over a concatenated
    multi-level table.  table: (sum_l H_l*W_l, C); dims (L, 2) int32 per-level
    (H, W); offsets (L,) int32 row offsets into the table; scales (L,) f32
    spatial scales; levels (R,) int32 index into the L tables per roi.

    Identical bilinear math to ``_roi_align_gather_chunk`` but every scalar
    that used to be static (h, w, spatial_scale, row base) is selected
    per-roi by level index — one gather pass serves all pyramid levels.

    ALL coordinate/fraction math is f32 regardless of the table dtype: at
    bf16 any coordinate >= 128 has ULP >= 1, so fractions collapse to 0
    (nearest-neighbour sampling on the big P2/P3 levels) and disagree with
    the f32 coordinates the custom-VJP backward uses.  The exact f32
    weights are then cast to the table dtype for the combine — a ~2^-8
    relative weight quantization, the same scale as the bf16 feature
    values, where an all-f32 combine costs ~6 ms at the 800×1216 detect
    shape (measured; the indices/fractions, not the multiply precision,
    are what the bf16-coords bug corrupted)."""
    p, sr = output_size, sampling_ratio
    r = rois.shape[0]
    dtype = jnp.float32

    hh = dims[levels, 0].astype(dtype)[:, None]                 # (R, 1)
    ww = dims[levels, 1].astype(dtype)[:, None]
    w_i = dims[levels, 1][:, None]                              # int32 (R, 1)
    base = offsets[levels][:, None]                             # (R, 1)
    scale = scales[levels][:, None]                             # (R, 1) f32

    x1 = rois[:, 0:1].astype(dtype) * scale
    y1 = rois[:, 1:2].astype(dtype) * scale
    x2 = rois[:, 2:3].astype(dtype) * scale
    y2 = rois[:, 3:4].astype(dtype) * scale
    bin_w = jnp.maximum(x2 - x1, 1.0) / p
    bin_h = jnp.maximum(y2 - y1, 1.0) / p
    s = (jnp.arange(p * sr, dtype=dtype) + 0.5) / sr            # (p*sr,)
    ys = y1 + s[None, :] * bin_h                                # (R, p*sr)
    xs = x1 + s[None, :] * bin_w

    def neighbours(coords, size):
        empty = (coords < -1.0) | (coords > size)
        c = jnp.clip(coords, 0.0, size - 1.0)
        low = jnp.floor(c)
        frac = c - low
        low_i = low.astype(jnp.int32)
        high_i = jnp.minimum(low_i + 1, size.astype(jnp.int32) - 1)
        return low_i, high_i, frac, empty

    yl, yh, fy, ey = neighbours(ys, hh)
    xl, _, fx, ex = neighbours(xs, ww)

    # x-pair gather: xl/xh are ADJACENT ROWS of the flat table, so one
    # (2, C) slice per sample point fetches both x-neighbours — half the
    # gather descriptors and 2x-contiguous runs vs four row-gathers
    # (measured 27.6 -> 16 ms at the 8x300-roi FPN detect shape; see
    # scripts/probe_multilevel_gather.py for the losing variants).  At
    # xl == w-1 the slice reads one row past the level (next level's first
    # row, or the one-row zero slack appended by the caller); its weight fx
    # is exactly 0 there (clamped coord => frac 0), matching the reference's
    # explicit xh = min(xl+1, w-1) clamp.
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))

    def pair_rows(yi):
        starts = ((base + yi * w_i)[:, :, None]
                  + xl[:, None, :]).reshape(-1, 1)
        out = jax.lax.gather(
            table, starts, dn, slice_sizes=(2, table.shape[-1]),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return out.reshape(r, p * sr, p * sr, 2, -1)

    cdt = table.dtype
    wx = jnp.stack([1 - fx, fx], axis=-1).astype(cdt)[:, None, :, :, None]
    row_t = (pair_rows(yl) * wx).sum(axis=3)                    # (R,n,n,C)
    row_b = (pair_rows(yh) * wx).sum(axis=3)
    v = (row_t * (1 - fy).astype(cdt)[:, :, None, None]
         + row_b * fy.astype(cdt)[:, :, None, None])
    valid = (~ey)[:, :, None, None] & (~ex)[:, None, :, None]
    v = jnp.where(valid, v, jnp.zeros((), cdt))
    return v.reshape(r, p, sr, p, sr, -1).mean(axis=(2, 4))


def _ml_meta(hw_list, strides):
    """Shared level metadata for the multilevel fwd AND its custom-VJP bwd
    (any table-layout change must flow through here so the two cannot
    disagree on row indexing).  hw_list: [(H_l, W_l)]."""
    dims = jnp.asarray(hw_list, jnp.int32)
    sizes = [int(h * w) for h, w in hw_list]
    offsets = jnp.asarray(np.concatenate([[0], np.cumsum(sizes)[:-1]]),
                          jnp.int32)
    scales = jnp.asarray([1.0 / s for s in strides], jnp.float32)
    return dims, offsets, scales, sizes


def _ml_tables(feats, strides):
    c = feats[0].shape[-1]
    table = jnp.concatenate(
        [f.reshape(-1, c) for f in feats]
        + [jnp.zeros((1, c), feats[0].dtype)], axis=0)  # slack row: the
    # last level's bottom-right x-pair slice reads one row past the end
    dims, offsets, scales, sizes = _ml_meta(
        [f.shape[:2] for f in feats], strides)
    return table, dims, offsets, scales, sizes


def roi_align_multilevel(feats, rois, levels, strides, output_size: int = 7,
                         sampling_ratio: int = 2, chunk: int = 64):
    """Level-assigned RoIAlign over an FPN pyramid in ONE gather pass.

    feats: list of L (H_l, W_l, C) maps (one image); rois (R, 4) image-coord
    boxes; levels (R,) int32 in [0, L); strides: L python ints (feature
    stride per level).  Returns (R, p, p, C).  Equivalent to running
    ``roi_align_gather`` per level and selecting by level mask, at 1/L the
    gather traffic.

    custom_vjp: XLA's transpose of the (2, C)-slice gather is a sliced
    scatter that lowers pathologically on TPU (measured 1374 ms fwd+bwd at
    the 8×128-roi train shape vs 7.7 ms fwd — scripts/
    probe_pool_backward.py); the hand-written backward scatter-adds plain
    (1, C) rows (4 corners per sample, f32 accumulation).  RoIAlign is
    linear in the features, so the adjoint is exact.  Rois/levels get zero
    gradients (the reference lineage detaches rois)."""
    # positional indirection: custom_vjp functions reject keyword args
    return _roi_align_multilevel_vjp(feats, rois, levels, tuple(strides),
                                     output_size, sampling_ratio, chunk)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _roi_align_multilevel_vjp(feats, rois, levels, strides, output_size,
                              sampling_ratio, chunk):
    return _ml_fwd_impl(feats, rois, levels, strides, output_size,
                        sampling_ratio, chunk)


def _ml_fwd_impl(feats, rois, levels, strides, output_size, sampling_ratio,
                 chunk):
    table, dims, offsets, scales, _ = _ml_tables(feats, strides)
    r = rois.shape[0]
    chunk = _pick_chunk(r, chunk)
    fn = partial(_roi_align_multilevel_chunk, table, dims, offsets, scales,
                 output_size=output_size, sampling_ratio=sampling_ratio)
    if r > chunk:
        out = jax.lax.map(
            lambda args: fn(rois=args[0], levels=args[1]),
            (rois.reshape(r // chunk, chunk, 4),
             levels.reshape(r // chunk, chunk)))
        return out.reshape((r,) + out.shape[2:])
    return fn(rois=rois, levels=levels)


def _ml_fwd_rule(feats, rois, levels, strides, output_size, sampling_ratio,
                 chunk):
    out = _ml_fwd_impl(feats, rois, levels, strides, output_size,
                       sampling_ratio, chunk)
    # zero-size arrays carry each level's shape/dtype (static metadata is
    # not a valid jax residual type)
    tokens = tuple(jnp.zeros((0,) + f.shape, f.dtype) for f in feats)
    return out, (rois, levels, tokens)


def _ml_bwd_rule(strides, output_size, sampling_ratio, chunk, res, g):
    rois, levels, tokens = res
    shapes = [(t.shape[1:], t.dtype) for t in tokens]
    p, sr = output_size, sampling_ratio
    n = p * sr
    r = rois.shape[0]
    c = shapes[0][0][-1]
    dims, offsets, scales, sizes = _ml_meta(
        [s[0][:2] for s in shapes], strides)
    total = int(np.sum(sizes))

    # accumulate in the FEATURE dtype (bf16 on the TPU production path —
    # same numerics as the autodiff scatter of the gather formulation, and
    # half the scatter traffic; CPU/parity tests run f32 end to end)
    acc_dtype = shapes[0][1]

    def chunk_updates(rois_c, levels_c, g_c):
        """Per-chunk corner rows + weighted updates (coords in f32)."""
        dtype = jnp.float32
        hh = dims[levels_c, 0].astype(dtype)[:, None]
        ww = dims[levels_c, 1].astype(dtype)[:, None]
        w_i = dims[levels_c, 1][:, None]
        h_i = dims[levels_c, 0][:, None]
        base = offsets[levels_c][:, None]
        scale = scales[levels_c][:, None]

        x1 = rois_c[:, 0:1] * scale
        y1 = rois_c[:, 1:2] * scale
        x2 = rois_c[:, 2:3] * scale
        y2 = rois_c[:, 3:4] * scale
        bw = jnp.maximum(x2 - x1, 1.0) / p
        bh = jnp.maximum(y2 - y1, 1.0) / p
        s = (jnp.arange(n, dtype=dtype) + 0.5) / sr
        ys = y1 + s[None, :] * bh
        xs = x1 + s[None, :] * bw

        def nb(coords, size, limit):
            empty = (coords < -1.0) | (coords > size)
            cc = jnp.clip(coords, 0.0, size - 1.0)
            low = jnp.floor(cc)
            low_i = low.astype(jnp.int32)
            high_i = jnp.minimum(low_i + 1, limit - 1)
            return low_i, high_i, cc - low, empty

        yl, yh, fy, ey = nb(ys, hh, h_i)
        xl, xh, fx, ex = nb(xs, ww, w_i)
        valid = ((~ey)[:, :, None] & (~ex)[:, None, :]).astype(dtype)
        # mean-pool adjoint: each sample gets g[bin] / sr^2
        gs = (g_c.astype(dtype) / (sr * sr))[:, :, None, :, None, :]
        gs = jnp.broadcast_to(
            gs, (g_c.shape[0], p, sr, p, sr, c)).reshape(-1, n, n, c)
        gs = gs * valid[..., None]

        rows_y = {"l": base + yl * w_i, "h": base + yh * w_i}   # (rc, n)
        wy = {"l": 1.0 - fy, "h": fy}
        wx = {"l": 1.0 - fx, "h": fx}
        cols = {"l": xl, "h": xh}
        idx_list, upd_list = [], []
        for ky in ("l", "h"):
            for kx in ("l", "h"):
                idx = (rows_y[ky][:, :, None] + cols[kx][:, None, :])
                w = wy[ky][:, :, None] * wx[kx][:, None, :]
                idx_list.append(idx.reshape(-1))
                upd_list.append(
                    (gs * w[..., None]).reshape(-1, c).astype(acc_dtype))
        return jnp.concatenate(idx_list), jnp.concatenate(upd_list)

    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,))

    ck = _pick_chunk(r, chunk)
    g2 = g.reshape(r // ck, ck, p, p, c)
    rois_2 = rois.reshape(r // ck, ck, 4)
    levels_2 = levels.reshape(r // ck, ck)

    def body(dtab, args):
        rois_c, levels_c, g_c = args
        idx, upd = chunk_updates(rois_c, levels_c, g_c)
        dtab = jax.lax.scatter_add(
            dtab, idx[:, None], upd, dn,
            indices_are_sorted=False, unique_indices=False,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return dtab, None

    dtable, _ = jax.lax.scan(
        body, jnp.zeros((total, c), acc_dtype), (rois_2, levels_2, g2))

    dfeats, off = [], 0
    for (shape, dtype), sz in zip(shapes, sizes):
        dfeats.append(dtable[off:off + sz].reshape(shape).astype(dtype))
        off += sz
    zeros_levels = np.zeros(levels.shape, jax.dtypes.float0)
    return dfeats, jnp.zeros_like(rois), zeros_levels


_roi_align_multilevel_vjp.defvjp(_ml_fwd_rule, _ml_bwd_rule)


def _level_roi_tile(h: int, w: int, c: int):
    """(roi_tile, chan_block, variant) the level kernels can run at this
    feature shape, or None if nothing fits the v5e VMEM budget (large levels
    switch to the transpose-free y-first kernel — see level_tile_params)."""
    from frcnn_tpu.ops.pallas.roi_align_kernel import level_tile_params

    return level_tile_params(h, w, c)


def multilevel_pallas_fits(hw_list, c: int) -> bool:
    """Whether roi_align_multilevel_pallas can run this pyramid (VMEM gate
    + lane-aligned channels)."""
    return (c % 128 == 0
            and all(_level_roi_tile(h, w, c) is not None for h, w in hw_list))


def roi_align_multilevel_pallas(feats, rois, levels, strides,
                                output_size: int = 7, sampling_ratio: int = 2,
                                interpret: bool = False):
    """Level-assigned RoIAlign via the matmul-form Pallas kernel, one
    kernel launch per pyramid level with roi-tile skipping.

    Same semantics/signature as ``roi_align_multilevel`` (the gather
    formulation); this one turns the pooling into MXU matmuls instead of a
    1 KB-run HBM gather.  Rois are sorted by assigned level first so each
    level's rois form a contiguous run: a roi tile with no roi at the level
    skips both matmuls inside the kernel, making total compute proportional
    to the actual per-level roi counts rather than L x R.  The fwd/bwd
    permutations are exact adjoints (stable argsort on the same levels).
    Rois/levels get zero gradients (the reference lineage detaches rois).
    Callers must check ``multilevel_pallas_fits`` first (P2-sized levels
    need the reduced channel block / roi tile; very large buckets fall back
    to the gather form)."""
    return _ml_pallas_vjp(feats, rois, levels, tuple(strides), output_size,
                          sampling_ratio, interpret)


def roi_align_multilevel_pallas_sorted(feats, rois, levels, strides,
                                       output_size: int = 7,
                                       sampling_ratio: int = 2,
                                       interpret: bool = False):
    """``roi_align_multilevel_pallas`` with the row un-sort DEFERRED to the
    caller: returns ``(out_sorted, inv)`` where ``out_sorted`` has
    R_pad >= R rows (R padded to the levels' roi-tile lcm; pad rows are
    zeros) and ``jnp.take(out_sorted, inv, axis=0)`` restores roi order
    (inv's R entries index only the real sorted positions, so the pad
    rows drop out).  The in-place un-sort is a 60 MB gather+relayout of
    the (R, p, p, C) features per detect batch at 800×1216 B8, and the
    R_pad→R slice of a pallas output is another full copy (PROFILE_r05
    §5); callers that feed a row-equivariant head instead run the head on
    the padded sorted rows and permute its small outputs (cls/bbox rows:
    ~0.5 MB) with the same ``inv`` — exact, just reordered later."""
    return _ml_pallas_vjp_sorted(feats, rois, levels, tuple(strides),
                                 output_size, sampling_ratio, interpret)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ml_pallas_vjp(feats, rois, levels, strides, output_size, sampling_ratio,
                   interpret):
    return _ml_pallas_fwd_impl(feats, rois, levels, strides, output_size,
                               sampling_ratio, interpret)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ml_pallas_vjp_sorted(feats, rois, levels, strides, output_size,
                          sampling_ratio, interpret):
    out = _ml_pallas_fwd_impl(feats, rois, levels, strides, output_size,
                              sampling_ratio, interpret, defer_unsort=True)
    return out  # (out_sorted, inv)


# Merged tail-levels launch: OFF by default.  Same-process A/B at the
# 800x1216 B8 detect shape measured it NEUTRAL (-0.6%, inside noise) —
# the inactive-tile grid steps it removes were already effectively free
# (PROFILE_r04 §7a), so production keeps the longer-proven per-level
# launches.  The kernel + bit-parity test stay (the merged form may win
# at higher roi counts / more levels).
MERGED_LEVEL_FWD = False


def _ml_pallas_fwd_impl(feats, rois, levels, strides, p, sr, interpret,
                        defer_unsort: bool = False):
    from frcnn_tpu.ops.pallas.roi_align_kernel import (
        merged_tail_fits, roi_align_level_fwd, roi_align_levels_fwd_merged)

    order = jnp.argsort(levels)                  # stable → bwd re-derives it
    inv = jnp.argsort(order)
    rois_s = jnp.take(rois, order, axis=0)
    lv_s = jnp.take(levels, order, axis=0)
    params = []
    for f in feats:
        prm = _level_roi_tile(*f.shape)
        assert prm is not None, (
            f"level {f.shape} exceeds the VMEM model — gate callers with "
            "multilevel_pallas_fits")
        params.append(prm)

    # Merge the x-first TAIL levels (all but the largest) into one launch:
    # per-level launches pay a grid step for every roi tile whether or not
    # the tile holds that level's rois — at the 800x1216 detect shape 60%
    # of all pool grid steps were those inactive visits (PROFILE_r04 §7).
    # The largest level stays on its own launch (its preferred variant may
    # be y-first, and VMEM cannot hold every level's scratch beside it).
    tail = list(range(1, len(feats)))
    c = feats[0].shape[-1]
    merged = []
    if MERGED_LEVEL_FWD and len(tail) >= 2 and all(
            params[li][2] == "xfirst" for li in tail):
        rt_m = min(params[li][0] for li in tail)
        if merged_tail_fits([f.shape[:2] for li in tail
                             for f in [feats[li]]], c, rt_m, p=p):
            merged = tail
    # Deferred-unsort callers get the roi-tile-PADDED row count back:
    # slicing each pallas output R_pad→R costs a full copy of the 60 MB
    # pooled tensor (PROFILE_r05 §5 residual), while the pad rows (lv=-1,
    # zeros) ride the row-equivariant head for ~R_pad/R−1 ≈ 1.3% extra
    # matmul rows and vanish at the caller's take(head_out, inv) — inv
    # only ever indexes the R real sorted positions.  (The merged launch
    # keeps the sliced form; it is default-off.)
    r_pad = None
    if defer_unsort and not merged:
        lcm = math.lcm(*[prm[0] for prm in params])
        r = rois.shape[0]
        r_pad = r + (-r) % lcm
    out = None
    for li, (f, s) in enumerate(zip(feats, strides)):
        if li in merged:
            continue
        rt, _, variant = params[li]
        o = roi_align_level_fwd(f, rois_s, lv_s, li, p, 1.0 / s, sr,
                                roi_tile=rt, variant=variant,
                                interpret=interpret, r_pad=r_pad)
        out = o if out is None else out + o      # disjoint row supports
    if merged:
        o = roi_align_levels_fwd_merged(
            [feats[li] for li in merged], rois_s, lv_s, merged, p,
            [1.0 / strides[li] for li in merged], sr, rt_m,
            interpret=interpret)
        out = o if out is None else out + o
    if defer_unsort:
        return out, inv
    return jnp.take(out, inv, axis=0)


def _ml_pallas_fwd_rule(feats, rois, levels, strides, p, sr, interpret):
    out = _ml_pallas_fwd_impl(feats, rois, levels, strides, p, sr, interpret)
    tokens = tuple(jnp.zeros((0,) + f.shape, f.dtype) for f in feats)
    return out, (rois, levels, tokens)


def _ml_pallas_bwd_rule(strides, p, sr, interpret, res, g):
    from frcnn_tpu.ops.pallas.roi_align_kernel import roi_align_level_bwd

    rois, levels, tokens = res
    order = jnp.argsort(levels)
    rois_s = jnp.take(rois, order, axis=0)
    lv_s = jnp.take(levels, order, axis=0)
    g_s = jnp.take(g, order, axis=0)             # adjoint of take(out, inv)
    dfeats = []
    for li, (t, s) in enumerate(zip(tokens, strides)):
        h, w, c = t.shape[1:]
        params = _level_roi_tile(h, w, c)
        assert params is not None, (
            f"level {(h, w, c)} exceeds the VMEM model — gate callers with "
            "multilevel_pallas_fits")
        rt, _, variant = params
        dfeats.append(roi_align_level_bwd(
            g_s.astype(t.dtype), rois_s, lv_s, li, h, w, t.dtype, p,
            1.0 / s, sr, roi_tile=rt, variant=variant, interpret=interpret))
    zeros_levels = np.zeros(levels.shape, jax.dtypes.float0)
    return dfeats, jnp.zeros_like(rois), zeros_levels


_ml_pallas_vjp.defvjp(_ml_pallas_fwd_rule, _ml_pallas_bwd_rule)


def _ml_pallas_sorted_fwd_rule(feats, rois, levels, strides, p, sr,
                               interpret):
    out = _ml_pallas_fwd_impl(feats, rois, levels, strides, p, sr, interpret,
                              defer_unsort=True)
    tokens = tuple(jnp.zeros((0,) + f.shape, f.dtype) for f in feats)
    return out, (rois, levels, tokens)


def _ml_pallas_sorted_bwd_rule(strides, p, sr, interpret, res, g):
    """Cotangent arrives in SORTED row order (the fwd's output order), so —
    unlike _ml_pallas_bwd_rule — g is used directly; only rois/levels get
    re-sorted to match.  (g[1] is inv's float0 cotangent, ignored.)"""
    from frcnn_tpu.ops.pallas.roi_align_kernel import roi_align_level_bwd

    rois, levels, tokens = res
    g_s = g[0]
    # g carries the fwd's PADDED row count (pad rows: lv=-1, cotangent
    # zero from the caller's take() adjoint — ignored by the kernel).
    r_pad = g_s.shape[0] if g_s.shape[0] != rois.shape[0] else None
    order = jnp.argsort(levels)
    rois_s = jnp.take(rois, order, axis=0)
    lv_s = jnp.take(levels, order, axis=0)
    dfeats = []
    for li, (t, s) in enumerate(zip(tokens, strides)):
        h, w, c = t.shape[1:]
        params = _level_roi_tile(h, w, c)
        assert params is not None, (
            f"level {(h, w, c)} exceeds the VMEM model — gate callers with "
            "multilevel_pallas_fits")
        rt, _, variant = params
        dfeats.append(roi_align_level_bwd(
            g_s.astype(t.dtype), rois_s, lv_s, li, h, w, t.dtype, p,
            1.0 / s, sr, roi_tile=rt, variant=variant, interpret=interpret,
            r_pad=r_pad))
    zeros_levels = np.zeros(levels.shape, jax.dtypes.float0)
    return dfeats, jnp.zeros_like(rois), zeros_levels


_ml_pallas_vjp_sorted.defvjp(_ml_pallas_sorted_fwd_rule,
                             _ml_pallas_sorted_bwd_rule)


def extract_roi_features(feat, rois, mode: str = "align", output_size: int = 7,
                         spatial_scale: float = 1.0 / 16.0, sampling_ratio: int = 2,
                         use_pallas: bool = True, pad_rows: bool = False):
    """cfg.POOLING_MODE dispatcher (reference Network._crop_pool_layer).

    pad_rows=True: WHEN the pallas path engages, return the ROI_TILE-padded
    (R_pad, p, p, C) rows instead of paying a full-copy slice back to R
    (roi_align_pallas docstring) — callers must size row-wise consumers by
    the returned shape and slice their own small outputs back to R.  The
    non-pallas forms return exact R rows either way."""
    if mode == "align":
        if (use_pallas and jax.default_backend() == "tpu"
                and feat.shape[-1] % 128 == 0):
            from frcnn_tpu.ops.pallas.roi_align_kernel import roi_align_pallas

            # positional: custom_vjp kwarg resolution of nondiff args is
            # version-sensitive
            return roi_align_pallas(feat, rois, output_size,
                                    spatial_scale, sampling_ratio,
                                    False, pad_rows)
        return roi_align(feat, rois, output_size, spatial_scale, sampling_ratio)
    if mode == "pool":
        return roi_pool(feat, rois, output_size, spatial_scale)
    if mode == "crop":
        return crop_and_resize_pool(feat, rois, output_size, spatial_scale)
    raise ValueError(f"unknown POOLING_MODE: {mode}")
