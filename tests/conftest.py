"""Test configuration: force an 8-device virtual CPU mesh.

Note: this machine's axon sitecustomize resets ``JAX_PLATFORMS=axon`` at
interpreter startup, so the env var alone is not enough -- we must call
``jax.config.update`` after importing jax (before any backend init).

Real-TPU checks are exercised by ``bench.py`` and tests gated on
``LZ4TPU_REAL_TPU=1``; the default suite must be deterministic and fast.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("LZ4TPU_REAL_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import random  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return random.Random(0x124)
