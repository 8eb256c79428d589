"""Test configuration: force an 8-virtual-device CPU platform BEFORE the
first jax backend use, so sharding/collective logic is exercised without a
TPU slice.

Note: this image boots a sitecustomize that registers the TPU plugin and
pins ``jax_platforms`` in-process, so plain env vars are not enough — we
override via ``jax.config.update`` (backend init is lazy, so this takes
effect as long as no device has been touched yet).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
