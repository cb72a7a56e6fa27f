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
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        # fold into a single multiply-add (XLA fuses this into the conv)
        mul = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        add = (bias - mean * scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
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


class Bottleneck(nn.Module):
    channels: int  # bottleneck width; output is channels * 4
    stride: int = 1
    dtype: Any = jnp.float32
    norm: str = "frozen_bn"

    @nn.compact
    def __call__(self, x):
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


class _ResNetTrunk(nn.Module):
    depth: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        blocks = _RESNET_DEPTHS[self.depth]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, kernel_init=conv_init, name="conv1")(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for li, (n, ch, stride) in enumerate(
            zip(blocks[:3], (64, 128, 256), (1, 2, 2)), start=1
        ):
            for bi in range(n):
                x = Bottleneck(ch, stride if bi == 0 else 1, dtype=self.dtype,
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

    def setup(self):
        self.trunk = _ResNetTrunk(depth=self.depth, dtype=self.dtype, name="trunk")
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
        return ResNetV1(depth=int(name[3:]), dtype=dtype)
    if name.startswith("mobile"):
        return MobileNetV1(depth_multiplier=cfg.MOBILENET.DEPTH_MULTIPLIER, dtype=dtype)
    raise ValueError(
        f"unknown backbone: {name!r} (expected vgg16, res50, res101, res152, mobile)")
