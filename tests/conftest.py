"""Test configuration: force a virtual 8-device CPU mesh.

The image's sitecustomize pre-imports JAX and registers the axon TPU
plugin in every interpreter, so setting env vars here is too late — but
backend *initialization* is lazy, so flipping the platform config before
the first device query keeps tests on a fast local CPU backend (with 8
virtual devices for the sharding tests), exercising exactly the same
traced kernels that run on TPU.
"""

import os

# must precede first backend initialization (CPU client reads XLA_FLAGS then)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng(request):
    # function-scoped + name-seeded (stable crc32, not PYTHONHASHSEED-
    # randomized hash): inputs are independent of which other tests run
    # (a shared session stream made tolerances order-dependent)
    import zlib
    seed = zlib.crc32(request.node.name.encode())
    return np.random.default_rng(20260817 + seed)
