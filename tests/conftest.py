"""Test harness: force a virtual 8-device CPU platform (SURVEY §4d).

Multi-device sharding tests run against ``xla_force_host_platform_device_count``
without needing TPU hardware; numerics tests are platform-agnostic.

The runtime image pre-registers a tunneled-TPU PJRT plugin ("axon") from
``sitecustomize`` at interpreter start, which also pre-imports jax — so env
vars alone are too late.  Backends still initialize lazily, so forcing the
platform via ``jax.config`` here (before any backend init) pins the whole
test session to the in-process CPU client.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
