"""Fused ResNet bottleneck block as one Pallas TPU kernel.

TPU-native replacement for the XLA composition of a ResNet-v1 bottleneck
(conv1x1 -> BN -> relu -> conv3x3 -> BN -> relu -> conv1x1 -> BN -> +residual
-> relu; reference ``lib/nets/resnet_v1.py`` block structure, SURVEY.md #10).
XLA runs the three convs as separate HBM round-trips, so the early ResNet
stages are **bandwidth-bound**: layer1 of the detect pipeline measures
41 TFLOP/s against a ~3.7 GB activation-traffic floor (docs/PROFILE_r02.md
section 2).  This kernel keeps the two intermediate activations in VMEM and
reads/writes each pixel of HBM once:

  * grid = (batch, row-tiles); each step processes RH output rows of the
    full width.  The 3x3 conv needs one halo row above and below, fetched as
    two extra 1-row blocked inputs whose index maps clamp at the image
    border (the clamped duplicate row is then zeroed in-kernel, making the
    padding exact).
  * conv1 is a single (RH*W, Cin) @ (Cin, mid) matmul over the tile plus one
    row-matmul per halo row, written into an (RH+2, W, mid) VMEM scratch.
  * conv2 builds the nine shifted taps as lane-concatenated copies of the
    scratch (row shifts are free outer-dim slices; column shifts are
    zero-pad + slice on the sublane dim) and contracts them in ONE
    (RH*W, 9*mid) @ (9*mid, mid) matmul — large K amortizes MXU pass
    overhead instead of nine skinny K=mid passes.
  * conv3, the (optional) 1x1 downsample projection of the residual, the
    residual add and the final relu run in the same step; only the block
    output returns to HBM.

The frozen-BN affines are **pre-folded into the conv weights** by the
caller (BN after a bias-free conv is ``x@(W*mul) + add``), so the kernel
sees plain weight+bias pairs.  Stride-2 blocks (layer2+/block0) are NOT
fused — subsampling along the sublane axis costs a relayout that eats the
win; those stay on XLA convs.

Precision mirrors the RoIAlign kernel: f32 inputs use HIGHEST MXU passes
(CPU/parity), bf16 uses native bf16 with f32 accumulation (production).

Numerical truth: ``bottleneck_reference`` below (plain lax convs); equality
is asserted in tests/test_pallas_kernels.py in interpret mode and on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Target VMEM footprint of the 9-tap concat buffer; the row-tile height is
# chosen as the largest divisor of H that keeps it under this.
_CAT_BYTES_MAX = 4 * 1024 * 1024
_RH_MAX = 16


def pick_row_tile(h: int, w: int, mid: int, itemsize: int = 2) -> int | None:
    """Largest RH <= _RH_MAX dividing h whose tap-concat buffer fits; None if
    even RH=1 doesn't fit or h has no usable divisor (caller falls back to
    the XLA path)."""
    for rh in range(min(_RH_MAX, h), 0, -1):
        if h % rh == 0 and rh * w * 9 * mid * itemsize <= _CAT_BYTES_MAX:
            return rh
    return None


def _precision(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _kernel(xtop_ref, xbody_ref, xbot_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            w3_ref, b3_ref, *rest, rh):
    # rest = ([wds_ref, bds_ref,] out_ref, y1s_ref) — downsample refs present
    # only for projection blocks (pallas_call passes refs positionally)
    if len(rest) == 4:
        wds_ref, bds_ref, out_ref, y1s_ref = rest
    else:
        (out_ref, y1s_ref), wds_ref, bds_ref = rest, None, None
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    dt = xbody_ref.dtype
    prec = _precision(dt)
    w = xbody_ref.shape[2]
    mid = w1_ref.shape[1]
    cout = w3_ref.shape[1]
    has_ds = wds_ref is not None

    def conv1(m2d):  # (M, Cin) -> (M, mid), folded-BN bias + relu
        y = jnp.dot(m2d, w1_ref[:, :], preferred_element_type=jnp.float32,
                    precision=prec)
        return jnp.maximum(y + b1_ref[:, :].astype(jnp.float32), 0).astype(dt)

    xb = xbody_ref[0]                                     # (RH, W, Cin)
    y1s_ref[1:rh + 1] = conv1(xb.reshape(rh * w, -1)).reshape(rh, w, mid)
    # halo rows; the clamped border duplicate is zeroed -> exact zero-padding
    top = conv1(xtop_ref[0, 0])                           # (W, mid)
    y1s_ref[0] = jnp.where(t == 0, jnp.zeros_like(top), top)
    bot = conv1(xbot_ref[0, 0])
    y1s_ref[rh + 1] = jnp.where(t == n_t - 1, jnp.zeros_like(bot), bot)

    # nine taps, lane-concatenated: tap (dr, dc) of the 3x3 reads virtual
    # y1 row r+dr-1 = scratch row r+dr, column w+dc-1 (zeros off-edge)
    y1 = y1s_ref[:, :, :]                                 # (RH+2, W, mid)
    pieces = []
    for dr in range(3):
        sl = y1[dr:dr + rh]                               # (RH, W, mid)
        for dc in range(3):
            if dc == 0:
                p_ = jnp.pad(sl[:, :w - 1], ((0, 0), (1, 0), (0, 0)))
            elif dc == 2:
                p_ = jnp.pad(sl[:, 1:], ((0, 0), (0, 1), (0, 0)))
            else:
                p_ = sl
            pieces.append(p_)
    cat = jnp.concatenate(pieces, axis=-1)                # (RH, W, 9*mid)

    y2 = jnp.dot(cat.reshape(rh * w, 9 * mid), w2_ref[:, :],
                 preferred_element_type=jnp.float32, precision=prec)
    y2 = jnp.maximum(y2 + b2_ref[:, :].astype(jnp.float32), 0).astype(dt)

    y3 = jnp.dot(y2, w3_ref[:, :], preferred_element_type=jnp.float32,
                 precision=prec) + b3_ref[:, :].astype(jnp.float32)
    if has_ds:
        res = jnp.dot(xb.reshape(rh * w, -1), wds_ref[:, :],
                      preferred_element_type=jnp.float32, precision=prec)
        res = res + bds_ref[:, :].astype(jnp.float32)
    else:
        res = xb.reshape(rh * w, cout).astype(jnp.float32)
    out = jnp.maximum(y3 + res, 0)
    out_ref[0] = out.reshape(rh, w, cout).astype(dt)


def fused_bottleneck(x, w1, b1, w2cat, b2, w3, b3, wds=None, bds=None, *,
                     interpret: bool = False):
    """One stride-1 bottleneck block, fused.

    x (B, H, W, Cin); w1 (Cin, mid); w2cat (9*mid, mid) — the 3x3 kernel
    reshaped row-major over (dr, dc) taps, i.e. ``k2.reshape(9*mid, mid)``
    of an HWIO (3, 3, mid, mid) kernel; w3 (mid, Cout); optional downsample
    projection wds (Cin, Cout).  All BN affines pre-folded; biases are
    (mid,)/(Cout,) vectors.  Cout must equal Cin when wds is None.
    Returns (B, H, W, Cout) in x.dtype.

    Raises ValueError when no row tile divides H (caller should fall back).
    """
    b, h, w, cin = x.shape
    mid = w1.shape[1]
    cout = w3.shape[1]
    rh = pick_row_tile(h, w, mid, x.dtype.itemsize)
    if rh is None:
        raise ValueError(f"no usable row tile for H={h}")
    n_t = h // rh
    has_ds = wds is not None
    if not has_ds and cin != cout:
        raise ValueError("identity residual needs Cin == Cout")

    def row2d(v):
        return v.reshape(1, -1).astype(x.dtype)

    weights = [w1.astype(x.dtype), row2d(b1), w2cat.astype(x.dtype),
               row2d(b2), w3.astype(x.dtype), row2d(b3)]
    if has_ds:
        weights += [wds.astype(x.dtype), row2d(bds)]

    full = [pl.BlockSpec(wt.shape, lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM) for wt in weights]
    in_specs = [
        pl.BlockSpec((1, 1, w, cin),
                     lambda bi, ti: (bi, jnp.maximum(ti * rh - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rh, w, cin), lambda bi, ti: (bi, ti, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w, cin),
                     lambda bi, ti: (bi, jnp.minimum((ti + 1) * rh, h - 1),
                                     0, 0),
                     memory_space=pltpu.VMEM),
    ] + full

    out = pl.pallas_call(
        functools.partial(_kernel, rh=rh),
        grid=(b, n_t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rh, w, cout), lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((rh + 2, w, mid), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, x, *weights)
    return out


@jax.custom_vjp
def fused_bottleneck_vjp(x, w1, b1, w2cat, b2, w3, b3):
    """Differentiable identity-residual fused block: Pallas forward, backward
    via autodiff of the XLA reference (the early stages are frozen in the
    default config, so the recompute rarely runs in training)."""
    return fused_bottleneck(x, w1, b1, w2cat, b2, w3, b3)


def _id_fwd(x, w1, b1, w2cat, b2, w3, b3):
    return fused_bottleneck_vjp(x, w1, b1, w2cat, b2, w3, b3), (
        x, w1, b1, w2cat, b2, w3, b3)


def _id_bwd(res, g):
    x, w1, b1, w2cat, b2, w3, b3 = res
    mid = w1.shape[1]

    def ref(*a):
        return bottleneck_reference(a[0], a[1], a[2],
                                    a[3].reshape(3, 3, mid, mid), *a[4:])

    _, vjp = jax.vjp(ref, x, w1, b1, w2cat, b2, w3, b3)
    return vjp(g)


fused_bottleneck_vjp.defvjp(_id_fwd, _id_bwd)


@jax.custom_vjp
def fused_bottleneck_ds_vjp(x, w1, b1, w2cat, b2, w3, b3, wds, bds):
    """Projection-residual variant of fused_bottleneck_vjp."""
    return fused_bottleneck(x, w1, b1, w2cat, b2, w3, b3, wds, bds)


def _ds_fwd(*a):
    return fused_bottleneck_ds_vjp(*a), a


def _ds_bwd(res, g):
    mid = res[1].shape[1]

    def ref(*a):
        return bottleneck_reference(a[0], a[1], a[2],
                                    a[3].reshape(3, 3, mid, mid), *a[4:])

    _, vjp = jax.vjp(ref, *res)
    return vjp(g)


fused_bottleneck_ds_vjp.defvjp(_ds_fwd, _ds_bwd)


def bottleneck_reference(x, w1, b1, w2, b2, w3, b3, wds=None, bds=None):
    """Numerical truth: the same folded-weight block via plain lax convs.
    w2 here is the HWIO (3, 3, mid, mid) kernel (NOT the 9*mid concat)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(v, k, pad):
        return jax.lax.conv_general_dilated(
            v, k.astype(v.dtype), (1, 1), pad, dimension_numbers=dn,
            precision=_precision(v.dtype))

    mid = w1.shape[1]
    dt = x.dtype  # keep the chain in x.dtype (f32 biases would promote)
    y = conv(x, w1.reshape(1, 1, -1, mid), [(0, 0), (0, 0)]) + b1.astype(dt)
    y = jnp.maximum(y, 0)
    y = conv(y, w2, [(1, 1), (1, 1)]) + b2.astype(dt)
    y = jnp.maximum(y, 0)
    y = conv(y, w3.reshape(1, 1, mid, -1), [(0, 0), (0, 0)]) + b3.astype(dt)
    if wds is not None:
        res = conv(x, wds.reshape(1, 1, x.shape[-1], -1),
                   [(0, 0), (0, 0)]) + bds.astype(dt)
    else:
        res = x
    return jnp.maximum(y + res, 0)
