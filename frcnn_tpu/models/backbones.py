"""Backbones: VGG-16, ResNet-v1 (50/101/152), MobileNet-v1.

Rebuilds of the reference's ``lib/nets/{vgg16,resnet_v1,mobilenet_v1}.py``
(SURVEY.md #9/#10/#11) in flax.linen, NHWC, stride-16 C4 feature extraction
(``extract_features`` ≙ reference ``_image_to_head``) + per-RoI trunk
(``head_to_tail`` ≙ reference ``_head_to_tail``):

  * VGG16:      conv1_1..conv5_3 (4 maxpools → stride 16); tail = fc6+fc7
                (4096-d, dropout in train).  Reference freezes conv1+conv2.
  * ResNetV1:   conv1 → layer3 (C4, 1024ch, stride 16); tail = layer4 on the
                7x7 RoI crop + global average pool (2048-d).  All BatchNorm
                is **frozen** (batch size is tiny) — implemented as
                FrozenBatchNorm: affine with stored running stats, never
                updated, never trained.  cfg.RESNET.FIXED_BLOCKS freezes
                early stages (via the trainable-mask, see ``frozen_param``).
  * MobileNetV1: 13 depthwise-separable layers; stride-16 cutoff after
                conv11; tail = conv12+conv13 + global pool (1024-d);
                DEPTH_MULTIPLIER scales widths; FIXED_LAYERS freezes.

Freezing is a *training-time* concern in JAX: modules are pure, so frozen ==
zero-gradient, expressed by ``trainable_mask`` consumed by optax.masked in
the train loop (reference does requires_grad_(False) + BN eval mode).

Compute dtype: modules take ``dtype`` (bfloat16 on TPU for the conv trunk);
params stay float32.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Weight initializers matching the torch defaults closely enough for
# from-scratch training; pretrained weights arrive via utils/weight_convert.
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
dense_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# Depthwise kernels are (kh, kw, 1, C): fan_out-scaling sees a bogus huge fan
# and produces ~50x-too-small weights (activations vanish ~10x per separable
# layer — trunk output was exactly zero by layer 4).  fan_in = kh*kw*1 is the
# true per-channel fan.
depthwise_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class FrozenBatchNorm(nn.Module):
    """BatchNorm with permanently-frozen running statistics and affine.

    y = (x - mean) / sqrt(var + eps) * scale + bias, all four stored as
    params (so torch weight conversion is a direct copy) but excluded from
    training by the trainable-mask.  Matches the reference's BN handling:
    eval-mode forward + no grad on affine (resnet_v1.py:~L60-L90).
    """

    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x=None, *, channels: int | None = None):
        """Apply to x, or with x=None return the folded (mul, add) pair of
        size `channels` so a caller can fuse the affine elsewhere (the stem
        folds it into the space-to-depth block conv)."""
        c = x.shape[-1] if x is not None else channels
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        # fold into a single multiply-add (XLA fuses this into the conv)
        mul = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        add = (bias - mean * scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        if x is None:
            return mul, add
        return x * mul + add


# ---------------------------------------------------------------------------
# VGG-16
# ---------------------------------------------------------------------------

_VGG_CFG: Sequence[Any] = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                           512, 512, 512, "M", 512, 512, 512)


class _VGGTrunk(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        i = 1
        block = 1
        for v in _VGG_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                block += 1
                i = 1
            else:
                x = nn.Conv(v, (3, 3), padding="SAME", dtype=self.dtype,
                            kernel_init=conv_init, name=f"conv{block}_{i}")(x)
                x = nn.relu(x)
                i += 1
        return x  # stride 16, 512 channels (conv5_3)


class _VGGTail(nn.Module):
    dtype: Any = jnp.float32
    dim: int = 4096

    @nn.compact
    def __call__(self, pooled, train: bool = False):
        # pooled: (N, 7, 7, 512) → flatten → fc6 → fc7 (reference vgg
        # classifier without fc8).  NOTE: torch flattens CHW; we flatten
        # HWC — weight conversion permutes fc6 rows accordingly.
        x = pooled.reshape(pooled.shape[0], -1)
        x = nn.Dense(self.dim, dtype=self.dtype, kernel_init=dense_init, name="fc6")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(self.dim, dtype=self.dtype, kernel_init=dense_init, name="fc7")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return x


class VGG16(nn.Module):
    """Reference lib/nets/vgg16.py:~1-70 (torchvision features[:30] split)."""

    dtype: Any = jnp.float32
    feat_channels: int = 512
    tail_dim: int = 4096
    input_block: int = 1

    def setup(self):
        self.trunk = _VGGTrunk(dtype=self.dtype, name="trunk")
        self.tail = _VGGTail(dtype=self.dtype, dim=self.tail_dim, name="tail")

    def extract_features(self, x):
        return self.trunk(x)

    def head_to_tail(self, pooled, train: bool = False):
        return self.tail(pooled, train=train)

    def __call__(self, x, train: bool = False):  # init convenience
        f = self.extract_features(x)
        p = f[:, :7, :7, :]
        return f, self.head_to_tail(p.reshape(-1, 7, 7, f.shape[-1]), train=train)

    def frozen_param(self, path: tuple, cfg=None) -> bool:
        # reference: first two conv blocks frozen
        return any(str(p).startswith(("conv1_", "conv2_")) for p in path)


# ---------------------------------------------------------------------------
# ResNet v1 (bottleneck), C4 split
# ---------------------------------------------------------------------------

_RESNET_DEPTHS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def make_norm(norm: str, dtype):
    """'frozen_bn' (reference parity: eval-mode BN, never trained) or
    'group' (GroupNorm-32 — trainable; the standard from-scratch choice)."""
    if norm == "frozen_bn":
        return partial(FrozenBatchNorm, dtype=dtype)
    if norm == "group":
        return partial(nn.GroupNorm, num_groups=32, dtype=dtype)
    raise ValueError(f"unknown norm: {norm}")


class _ConvKernel(nn.Module):
    """Declares a conv kernel param without computing the conv — the fused
    Pallas block path consumes raw weights but must keep the param tree
    identical to the nn.Conv path (checkpoints / weight conversion)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", conv_init, self.shape, jnp.float32)


class Bottleneck(nn.Module):
    channels: int  # bottleneck width; output is channels * 4
    stride: int = 1
    dtype: Any = jnp.float32
    norm: str = "frozen_bn"
    # Allow the fused single-kernel Pallas path (ops/pallas/fused_block.py)
    # where it applies: stride-1 + frozen-BN + bf16 + TPU backend + a spatial
    # extent worth tiling (the 7x7-crop tail and CPU tests keep XLA convs).
    fused: bool = False

    def _use_fused(self, x) -> bool:
        if not (self.fused and self.stride == 1 and self.norm == "frozen_bn"
                and self.dtype == jnp.bfloat16
                and jax.default_backend() == "tpu"):
            return False
        from frcnn_tpu.ops.pallas.fused_block import pick_row_tile
        h = x.shape[1]
        return h >= 16 and pick_row_tile(h, x.shape[2], self.channels) is not None

    @nn.compact
    def __call__(self, x):
        if self._use_fused(x):
            return self._fused_call(x)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype, kernel_init=conv_init)
        bn = make_norm(self.norm, self.dtype)
        residual = x
        y = conv(self.channels, (1, 1), name="conv1")(x)
        y = bn(name="bn1")(y)
        y = nn.relu(y)
        # torchvision-style: stride on the 3x3; symmetric padding 1 (flax
        # 'SAME' pads asymmetrically under stride 2 — breaks weight parity)
        y = conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                 padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = bn(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.channels * 4, (1, 1), name="conv3")(y)
        y = bn(name="bn3")(y)
        if residual.shape[-1] != self.channels * 4 or self.stride != 1:
            residual = conv(self.channels * 4, (1, 1),
                            strides=(self.stride, self.stride), name="downsample_conv")(x)
            residual = bn(name="downsample_bn")(residual)
        return nn.relu(y + residual)

    def _fused_call(self, x):
        """Same block as one Pallas kernel: identical param tree, frozen-BN
        affines folded into the conv weights (bn(conv(v)) == v@(W*mul)+add).
        Forward/backward parity vs the conv path is asserted in
        tests/test_pallas_kernels.py."""
        from frcnn_tpu.ops.pallas import fused_block as fb
        mid = self.channels
        cin = x.shape[-1]
        cout = mid * 4
        bn = make_norm(self.norm, self.dtype)
        k1 = _ConvKernel((1, 1, cin, mid), name="conv1")()
        m1, a1 = bn(name="bn1")(channels=mid)
        k2 = _ConvKernel((3, 3, mid, mid), name="conv2")()
        m2, a2 = bn(name="bn2")(channels=mid)
        k3 = _ConvKernel((1, 1, mid, cout), name="conv3")()
        m3, a3 = bn(name="bn3")(channels=cout)
        w1 = k1[0, 0].astype(self.dtype) * m1
        w2cat = (k2.astype(self.dtype) * m2).reshape(9 * mid, mid)
        w3 = k3[0, 0].astype(self.dtype) * m3
        if cin != cout:
            kd = _ConvKernel((1, 1, cin, cout), name="downsample_conv")()
            md, ad = bn(name="downsample_bn")(channels=cout)
            return fb.fused_bottleneck_ds_vjp(
                x, w1, a1, w2cat, a2, w3, a3,
                kd[0, 0].astype(self.dtype) * md, ad)
        return fb.fused_bottleneck_vjp(x, w1, a1, w2cat, a2, w3, a3)


def pack_images(images, block: int):
    """Host-side packing of (B, H, W, 3) images into the backbone's preferred
    device layout: (B, H, W/block, 3*block) when block > 1 (a free numpy
    view — in-graph the same reshape costs ~3.7 ms at 8x800x1216 because the
    3-wide minor dim occupies 3 of 128 vector lanes; see _StemConv).  Returns
    the input unchanged when block == 1 or W doesn't divide."""
    if block == 1 or images.ndim != 4 or images.shape[-1] != 3 \
            or images.shape[2] % block or images.shape[1] % block:
        return images
    b, h, w, c = images.shape
    return images.reshape(b, h, w // block, c * block)


def preprocess_images(images, cfg, dtype):
    """In-graph mean-subtract/scale for plain (…, 3) or host-blocked (…, 12)
    layouts (reference does this on host in blob prep; BASELINE.json wants
    preprocessing fused into the XLA graph)."""
    means = jnp.asarray(cfg.PIXEL_MEANS, jnp.float32)
    if images.shape[-1] != means.shape[-1]:
        means = jnp.tile(means, images.shape[-1] // means.shape[-1])
    x = (images.astype(jnp.float32) - means) * cfg.TPU.PIXEL_SCALE
    return x.astype(dtype)


def _conv_nhwc(x, k, strides, padding):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, k, strides, padding,
                                        dimension_numbers=dn)


class _StemConv(nn.Module):
    """The ResNet stem (7x7/s2 conv [+ frozen-BN + relu + 3x3/s2 maxpool]),
    computed via space-to-depth block convolution.

    A 7x7 stride-2 conv on a 3-channel image runs at ~3 TFLOP/s on the MXU
    (3 input channels → the systolic array is ~97% idle); measured 11.8 ms of
    the 22 ms trunk at 8x800x1216.  The MLPerf-ResNet trick, taken one step
    further: view the image as 4x4 pixel blocks (H/4, W/4, 48 channels) and
    compute a 2x2 block of stem-conv outputs per position as one 3x3 conv
    with 48→4·64 channels (the 7x7 kernel zero-padded and regrouped — exact,
    not approximate).  The frozen-BN affine + relu fold into the conv
    epilogue, and the 3x3/s2 maxpool is taken directly over the block
    channels of neighbouring positions — the stride-2 (H/2, W/2, 64) tensor
    is never materialized in HBM.  Measured 11.8 ms → ~1.5 ms.

    The stored param stays the canonical (7, 7, 3, 64) torchvision layout
    (weight conversion + checkpoints untouched); the kernel regroup is
    constant-folded by XLA.

    Called with (mul, add) from FrozenBatchNorm: returns the pooled stride-4
    tensor.  Called without: returns the plain stride-2 conv output (the
    GroupNorm-FPN path, where the norm is data-dependent and can't pre-fold)
    via the 2x2-block variant of the same trick.  Odd spatial sizes fall back
    to the naive conv (never hit with the even TPU.BUCKETS; CPU tests may).

    Fastest path — HOST-BLOCKED input (B, H, W/4, 12): any in-graph reshape
    of the (…, 3) image costs ~3.7 ms at 8x800x1216 (the 3-wide minor dim
    maps to 3 of 128 vector lanes, so relayouts run at ~12 GB/s), while the
    same reshape on the host is a free numpy view.  Engines reshape before
    feeding the device (see ``pack_images``); the conv then runs directly on
    the blocked layout — kernel (7, 3, 12, 2·64), stride (2, 1), W handled
    as blocks-of-4 producing 2 output pixels in channels — measured 8.7 ms →
    ~1.5 ms.  Exact, like every other path here.
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mul=None, add=None):
        f = self.features
        kernel = self.param("kernel", conv_init, (7, 7, 3, f), jnp.float32)
        b, h, w, c = x.shape
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        fused = mul is not None

        if c == 12:  # host-blocked (B, H, W/4, 12) fast path
            assert fused and h % 4 == 0, "blocked stem needs frozen-BN + H%4==0"
            # K[u, e, b*3+cc, t*f+o] = k7[u, v, cc, o] with v = 4(e-1)+b+3-2t:
            # out col j = 2q+t taps image col 4(q+e-1)+b (zeros off-range)
            k = jnp.zeros((7, 3, 12, 2 * f), kernel.dtype)
            for t in (0, 1):
                for e in range(3):
                    for bb in range(4):
                        v = 4 * (e - 1) + bb + 3 - 2 * t
                        if 0 <= v <= 6:
                            k = k.at[:, e, bb * 3:(bb + 1) * 3,
                                     t * f:(t + 1) * f].set(kernel[:, v])
            y = _conv_nhwc(x, k, (2, 1), [(3, 3), (1, 1)])  # (b, h/2, w, 2f)
            y = nn.relu(y * jnp.tile(mul, 2) + jnp.tile(add, 2))
            # W maxpool: out col q = max over j in {2q-1, 2q, 2q+1} =
            # {(q-1, t=1), (q, 0), (q, 1)} — contiguous f-wide channel slices
            y0, y1 = y[..., :f], y[..., f:]
            prev = jnp.pad(y1, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :w]
            wmax = jnp.maximum(jnp.maximum(prev, y0), y1)
            # H maxpool 3/s2 (exact: max_pool pads with -inf)
            return nn.max_pool(wmax, (3, 1), strides=(2, 1),
                               padding=[(1, 1), (0, 0)])

        def finish(y):  # bn + relu + pool on a stride-2 (h/2, w/2, f) tensor
            if not fused:
                return y
            y = nn.relu(y * mul + add)
            return nn.max_pool(y, (3, 3), strides=(2, 2),
                               padding=[(1, 1), (1, 1)])

        if h % 2 or w % 2:  # exact fallback (odd inputs)
            return finish(_conv_nhwc(x, kernel, (2, 2), [(3, 3), (3, 3)]))

        if not fused or h % 4 or w % 4:
            # space-to-depth(2): (b, h/2, w/2, 12), channel idx = a*6 + b*3 + c;
            # kernel padded 7x7 → 8x8 at the front (tap u'=u+1 so u'-4 = 2d+a,
            # d in 0..3, a in 0..1) and regrouped → exact 4x4/s1 conv
            xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
            xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
            k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
            k4 = k8.reshape(4, 2, 4, 2, c, f)
            k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, f)
            # output row i draws from s2d rows i+d-2, d in 0..3 → pad (2, 1)
            return finish(_conv_nhwc(xs, k4, (1, 1), [(2, 1), (2, 1)]))

        # ---- fully fused stride-4 path -------------------------------------
        # space-to-depth(4): (b, h/4, w/4, 48), channel idx = a*12 + b*3 + c
        P, Q = h // 4, w // 4
        xs = x.reshape(b, P, 4, Q, 4, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, P, Q, 16 * c)
        # Output pixel (2p+s, 2q+t) taps image row 4p + (2s+u-3); writing
        # 2s+u-3 = 4(d-1)+a (d in 0..2, a in 0..3) gives a 3-tap block conv:
        # pad the 7 kernel rows into 12 = 3 blocks of 4 at offset 1+2s.
        parts = []
        for s in (0, 1):
            for t in (0, 1):
                p = jnp.pad(kernel, ((1 + 2 * s, 4 - 2 * s),
                                     (1 + 2 * t, 4 - 2 * t), (0, 0), (0, 0)))
                p = p.reshape(3, 4, 3, 4, c, f).transpose(0, 2, 1, 3, 4, 5)
                parts.append(p.reshape(3, 3, 16 * c, f))
        kb = jnp.concatenate(parts, axis=-1)  # out ch = (2s+t)*f + o
        y = _conv_nhwc(xs, kb, (1, 1), [(1, 1), (1, 1)])  # (b, P, Q, 4f)
        y = nn.relu(y * jnp.tile(mul, 4) + jnp.tile(add, 4))
        # 3x3/s2 maxpool over the virtual (h/2, w/2) grid: window rows
        # {2m-1, 2m, 2m+1} = blocks {(m-1, s=1), (m, 0), (m, 1)}; post-relu
        # values are >= 0 so zero-padding the m-1/n-1 border is exact.
        yb = y.reshape(b, P, Q, 2, 2, f)
        r_prev = jnp.pad(yb[:, :, :, 1], ((0, 0), (1, 0), (0, 0), (0, 0),
                                          (0, 0)))[:, :P]
        rmax = jnp.maximum(jnp.maximum(r_prev, yb[:, :, :, 0]),
                           yb[:, :, :, 1])  # (b, P, Q, t, f)
        c_prev = jnp.pad(rmax[:, :, :, 1], ((0, 0), (0, 0), (1, 0),
                                            (0, 0)))[:, :, :Q]
        return jnp.maximum(jnp.maximum(c_prev, rmax[:, :, :, 0]),
                           rmax[:, :, :, 1])  # (b, P, Q, f)


# Stage-width cap for the fused Pallas bottleneck path: only stages at or
# below this bottleneck width use the fused kernel.  The wide stages are
# MXU-bound under XLA already; in-situ per-stage A/B (docs/PROFILE_r02.md
# section 6b) shows layer1 (64) -1.6 ms, layer2 (128) neutral, layer3 (256)
# +1.0 ms when fused.  scripts/probe_fused_insitu.py overrides this for A/Bs.
FUSED_MAX_CH = 128


class _ResNetTrunk(nn.Module):
    depth: int = 50
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        blocks = _RESNET_DEPTHS[self.depth]
        mul, add = FrozenBatchNorm(dtype=self.dtype, name="bn1")(channels=64)
        x = _StemConv(features=64, dtype=self.dtype, name="conv1")(x, mul, add)
        for li, (n, ch, stride) in enumerate(
            zip(blocks[:3], (64, 128, 256), (1, 2, 2)), start=1
        ):
            for bi in range(n):
                x = Bottleneck(ch, stride if bi == 0 else 1, dtype=self.dtype,
                               fused=self.fused and ch <= FUSED_MAX_CH,
                               name=f"layer{li}_block{bi}")(x)
        return x  # (H/16, W/16, 1024)


class _ResNetTail(nn.Module):
    depth: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled, train: bool = False):
        blocks = _RESNET_DEPTHS[self.depth]
        x = pooled
        for bi in range(blocks[3]):
            x = Bottleneck(512, 2 if bi == 0 else 1, dtype=self.dtype,
                           name=f"layer4_block{bi}")(x)
        return x.mean(axis=(1, 2))  # global average pool → (N, 2048)


class ResNetV1(nn.Module):
    """Reference lib/nets/resnet_v1.py:~1-150: conv1→layer3 = C4 stride 16;
    tail = layer4 (stride 2 inside the 7x7 crop) + global avg pool."""

    depth: int = 50
    dtype: Any = jnp.float32
    feat_channels: int = 1024
    tail_dim: int = 2048
    fused: bool = True   # fused Pallas blocks (auto-gated; see Bottleneck)
    # preferred host-packed input layout (see pack_images/_StemConv): the
    # frozen-BN stem consumes (B, H, W/4, 12) directly
    input_block: int = 4

    def setup(self):
        self.trunk = _ResNetTrunk(depth=self.depth, dtype=self.dtype,
                                  fused=self.fused, name="trunk")
        self.tail = _ResNetTail(depth=self.depth, dtype=self.dtype, name="tail")

    def extract_features(self, x):
        return self.trunk(x)

    def head_to_tail(self, pooled, train: bool = False):
        return self.tail(pooled, train=train)

    def __call__(self, x, train: bool = False):
        f = self.extract_features(x)
        p = f[:, :7, :7, :]
        return f, self.head_to_tail(p.reshape(-1, 7, 7, f.shape[-1]), train=train)

    def frozen_param(self, path: tuple, cfg=None) -> bool:
        fixed_blocks = cfg.RESNET.FIXED_BLOCKS if cfg is not None else 1
        s = [str(p) for p in path]
        # all FrozenBatchNorm params frozen; conv1/bn1 always frozen;
        # layer1..layer{fixed_blocks} frozen (cfg.RESNET.FIXED_BLOCKS)
        if any(p.startswith(("bn", "downsample_bn")) for p in s):
            return True
        if any(p in ("conv1", "bn1") for p in s[:2]):
            return True
        for k in range(1, fixed_blocks + 1):
            if any(p.startswith(f"layer{k}_") for p in s[:2]):
                return True
        return False


# ---------------------------------------------------------------------------
# MobileNet v1
# ---------------------------------------------------------------------------

# (channels, stride) per separable layer after the stem; stride-16 cutoff
# after layer 11 (reference mobilenet_v1.py:~1-200).
_MOBILENET_CFG = ((64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
                  (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),
                  (1024, 2), (1024, 1))


class SeparableConv(nn.Module):
    channels: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, (3, 3), strides=(self.stride, self.stride), padding="SAME",
                    feature_group_count=in_ch, use_bias=False, dtype=self.dtype,
                    kernel_init=depthwise_init, name="depthwise")(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn_dw")(x)
        x = nn.relu6(x)
        x = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=conv_init, name="pointwise")(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn_pw")(x)
        return nn.relu6(x)


def _mch(c: int, dm: float) -> int:
    return max(int(c * dm), 8)


class _MobileTrunk(nn.Module):
    depth_multiplier: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dm = self.depth_multiplier
        x = nn.Conv(_mch(32, dm), (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, kernel_init=conv_init, name="conv0")(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn0")(x)
        x = nn.relu6(x)
        for i, (c, s) in enumerate(_MOBILENET_CFG[:11], start=1):
            x = SeparableConv(_mch(c, dm), s, dtype=self.dtype, name=f"sep{i}")(x)
        return x  # stride 16, 512*dm channels


class _MobileTail(nn.Module):
    depth_multiplier: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled, train: bool = False):
        x = pooled
        for i, (c, _) in enumerate(_MOBILENET_CFG[11:], start=12):
            # reference runs the tail at stride 1 on the 7x7 crop
            x = SeparableConv(_mch(c, self.depth_multiplier), 1, dtype=self.dtype,
                              name=f"sep{i}")(x)
        return x.mean(axis=(1, 2))


class MobileNetV1(nn.Module):
    """Reference lib/nets/mobilenet_v1.py: stem + 13 separable layers;
    head = layers 0-11 (stride 16), tail = layers 12-13 + global pool."""

    depth_multiplier: float = 1.0
    dtype: Any = jnp.float32
    input_block: int = 1

    @property
    def feat_channels(self) -> int:
        return _mch(512, self.depth_multiplier)

    @property
    def tail_dim(self) -> int:
        return _mch(1024, self.depth_multiplier)

    def setup(self):
        self.trunk = _MobileTrunk(depth_multiplier=self.depth_multiplier,
                                  dtype=self.dtype, name="trunk")
        self.tail = _MobileTail(depth_multiplier=self.depth_multiplier,
                                dtype=self.dtype, name="tail")

    def extract_features(self, x):
        return self.trunk(x)

    def head_to_tail(self, pooled, train: bool = False):
        return self.tail(pooled, train=train)

    def __call__(self, x, train: bool = False):
        f = self.extract_features(x)
        p = f[:, :7, :7, :]
        return f, self.head_to_tail(p.reshape(-1, 7, 7, f.shape[-1]), train=train)

    def frozen_param(self, path: tuple, cfg=None) -> bool:
        fixed_layers = cfg.MOBILENET.FIXED_LAYERS if cfg is not None else 5
        s = [str(p) for p in path]
        if any(p.startswith(("bn", "bn_dw", "bn_pw")) for p in s):
            return True
        if any(p in ("conv0", "bn0") for p in s[:2]) and fixed_layers > 0:
            return True
        for k in range(1, fixed_layers):
            if any(p == f"sep{k}" for p in s[:2]):
                return True
        return False


def build_backbone(name: str, cfg, dtype=jnp.float32):
    """Backbone factory (reference tools/trainval_net.py --net dispatch)."""
    if name == "vgg16":
        return VGG16(dtype=dtype)
    if name in ("res50", "res101", "res152"):
        return ResNetV1(depth=int(name[3:]), dtype=dtype,
                        fused=cfg.TPU.FUSED_RESNET_BLOCKS)
    if name.startswith("mobile"):
        return MobileNetV1(depth_multiplier=cfg.MOBILENET.DEPTH_MULTIPLIER, dtype=dtype)
    raise ValueError(
        f"unknown backbone: {name!r} (expected vgg16, res50, res101, res152, mobile)")
