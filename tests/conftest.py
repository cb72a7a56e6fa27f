"""Test configuration.

Tests run on CPU with a virtual 8-device platform so that sharding /
collective code paths compile and execute without TPU hardware (the stand-in
for multi-chip, per SURVEY.md §4).  Must set env vars before jax imports.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config API works.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(3)  # cfg.RNG_SEED


def random_boxes(rng, n, width=800, height=600, min_size=2.0):
    """Random well-formed inclusive-corner boxes."""
    x1 = rng.uniform(0, width - min_size - 1, n)
    y1 = rng.uniform(0, height - min_size - 1, n)
    w = rng.uniform(min_size, width / 2, n)
    h = rng.uniform(min_size, height / 2, n)
    x2 = np.minimum(x1 + w, width - 1)
    y2 = np.minimum(y1 + h, height - 1)
    return np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)
