"""Test configuration: force an 8-device virtual CPU mesh before jax loads.

Real-TPU checks are exercised by ``bench.py`` and tests gated on
``LZ4TPU_REAL_TPU=1``; the default suite must be deterministic and fast.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import random  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return random.Random(0x124)
