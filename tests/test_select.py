"""topk_strided: exact agreement with jax.lax.top_k on tie-free data,
saturation-fallback correctness on adversarial inputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.ops.select import topk_strided


def _assert_matches_direct(x, k, **kw):
    """On tie-free data the selected (value, index) pairs must equal
    lax.top_k's exactly (order included: unique values fix the order)."""
    fv, fi = topk_strided(jnp.asarray(x), k, **kw)
    wv, wi = jax.lax.top_k(jnp.asarray(x), k)
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(wv))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(wi))


def test_random_uniform():
    rng = np.random.RandomState(0)
    x = rng.permutation(29184).reshape(4, 7296).astype(np.float32)
    _assert_matches_direct(x, 2000)


def test_large_level_shape():
    # the production FPN L2 shape (K=116736, k=2000) scaled down in batch
    rng = np.random.RandomState(1)
    x = rng.permutation(2 * 116736).reshape(2, 116736).astype(np.float32)
    _assert_matches_direct(x, 2000)


def test_clustered_scores_spread_by_striding():
    """Spatially contiguous high-score runs (objects light up consecutive
    anchors) must not trigger the fallback: strided blocks spread them."""
    rng = np.random.RandomState(2)
    x = rng.rand(2, 29184).astype(np.float32) * 0.1
    x[0, 5000:6800] += 0.9 + rng.rand(1800) * 0.05   # one dominant run
    x[1, 100:500] += 0.9 + rng.rand(400) * 0.05
    x[1, 20000:21000] += 0.9 + rng.rand(1000) * 0.05
    # float32 rounding makes some values non-unique here, so equal-valued
    # ties may legally order differently (module docstring) — compare the
    # sorted values and the selected index SET, not the order
    fv, fi = topk_strided(jnp.asarray(x), 1500)
    wv, wi = jax.lax.top_k(jnp.asarray(x), 1500)
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(wv))
    for b in range(x.shape[0]):
        assert set(np.asarray(fi)[b].tolist()) == set(np.asarray(wi)[b].tolist())


def test_saturation_fallback_all_equal():
    """Degenerate all-equal scores saturate block 0 → the cond falls back
    to the direct top_k, whose tie order (lowest index first) must appear."""
    x = jnp.ones((2, 4096), jnp.float32)
    fv, fi = topk_strided(x, 300)
    np.testing.assert_array_equal(np.asarray(fi),
                                  np.tile(np.arange(300), (2, 1)))
    np.testing.assert_array_equal(np.asarray(fv), np.ones((2, 300)))


def test_saturation_fallback_one_hot_block():
    """All of the top-k packed into one strided block (idx % G constant)
    saturates it → fallback must still return the exact set."""
    g = 128
    x = np.zeros((1, 64 * g), np.float32)
    hot = np.arange(0, 64 * g, g)           # the whole of block 0
    x[0, hot] = 1000.0 + np.arange(len(hot))
    fv, fi = topk_strided(jnp.asarray(x), 60, num_blocks=g, m=8)
    want_v, want_i = jax.lax.top_k(jnp.asarray(x), 60)
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(want_i))


def test_small_input_direct_path():
    # union >= input → must silently use the direct top_k
    rng = np.random.RandomState(3)
    x = rng.permutation(2 * 480).reshape(2, 480).astype(np.float32)
    _assert_matches_direct(x, 300)


def test_non_divisible_length_padding():
    rng = np.random.RandomState(4)
    x = rng.permutation(3 * 10001).reshape(3, 10001).astype(np.float32)
    _assert_matches_direct(x, 777)


@pytest.mark.parametrize("k", [1, 8, 129])
def test_tiny_k(k):
    rng = np.random.RandomState(5)
    x = rng.permutation(2 * 8192).reshape(2, 8192).astype(np.float32)
    _assert_matches_direct(x, k)
