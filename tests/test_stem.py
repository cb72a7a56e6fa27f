"""ResNet space-to-depth stem: exactness of every dispatch path.

The stem (reference torchvision conv1 7x7/s2 + BN + relu + maxpool 3x3/s2,
`lib/nets/resnet_v1.py:~L40-L80`) is rebuilt as a space-to-depth block conv
(backbones._StemConv) because a 3-channel conv leaves the MXU ~97% idle.
Every path must be *exact* (up to f32 reassociation) vs the naive ops:

  * fused (mul/add) path, in-graph s2d(2x2 output block) — even H/W
  * fused path, odd-size fallback (plain conv)
  * host-blocked (B, H, W/4, 12) input path
  * unfused path (GroupNorm FPN stem) — stride-2 conv only
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from frcnn_tpu.models.backbones import (FrozenBatchNorm, ResNetV1, _StemConv,
                                        _conv_nhwc, pack_images)


def naive_stem(x, k, mul, add):
    y = _conv_nhwc(x, k, (2, 2), [(3, 3), (3, 3)])
    y = nn.relu(y * mul + add)
    return nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


@pytest.fixture(scope="module")
def stem():
    rng = np.random.RandomState(0)
    m = _StemConv(features=64, dtype=jnp.float32)
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x0)
    mul = jnp.asarray(rng.uniform(0.5, 1.5, 64).astype(np.float32))
    add = jnp.asarray(rng.randn(64).astype(np.float32))
    return m, v, mul, add


@pytest.mark.parametrize("hw", [(64, 96), (62, 98), (63, 97), (50, 50)])
def test_fused_stem_matches_naive(stem, hw):
    m, v, mul, add = stem
    rng = np.random.RandomState(sum(hw))
    x = jnp.asarray(rng.randn(2, *hw, 3).astype(np.float32))
    got = m.apply(v, x, mul, add)
    want = naive_stem(x, v["params"]["kernel"], mul, add)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_blocked_input_matches_naive(stem):
    m, v, mul, add = stem
    rng = np.random.RandomState(7)
    x = rng.randn(2, 64, 96, 3).astype(np.float32)
    got = m.apply(v, jnp.asarray(pack_images(x, 4)), mul, add)
    want = naive_stem(jnp.asarray(x), v["params"]["kernel"], mul, add)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_unfused_stem_is_plain_conv(stem):
    m, v, _, _ = stem
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    got = m.apply(v, x)
    want = _conv_nhwc(x, v["params"]["kernel"], (2, 2), [(3, 3), (3, 3)])
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pack_images_contract():
    x = np.zeros((2, 64, 96, 3), np.float32)
    assert pack_images(x, 4).shape == (2, 64, 24, 12)
    assert pack_images(x, 1).shape == x.shape
    odd = np.zeros((2, 64, 98, 3), np.float32)  # W not divisible
    assert pack_images(odd, 4).shape == odd.shape
    oddh = np.zeros((2, 62, 96, 3), np.float32)  # H not divisible
    assert pack_images(oddh, 4).shape == oddh.shape


def test_resnet_trunk_blocked_equals_plain():
    rng = np.random.RandomState(0)
    im = rng.uniform(-2, 2, (1, 128, 160, 3)).astype(np.float32)
    m = ResNetV1(depth=50)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(im),
               method="extract_features")
    f1 = m.apply(v, jnp.asarray(im), method="extract_features")
    f2 = m.apply(v, jnp.asarray(pack_images(im, m.input_block)),
                 method="extract_features")
    assert f1.shape == f2.shape == (1, 8, 10, 1024)
    # 50 layers of f32 reassociation; features are O(10)
    np.testing.assert_allclose(f1, f2, atol=2e-3)


def test_frozen_bn_scale_bias_mode():
    bn = FrozenBatchNorm()
    x = jnp.ones((1, 4, 4, 8))
    v = bn.init(jax.random.PRNGKey(0), x)
    mul, add = bn.apply(v, channels=8)
    np.testing.assert_allclose(bn.apply(v, x), x * mul + add, atol=1e-6)
