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

# The interpret-mode fused-step kernel is the largest single XLA:CPU
# compile in the suite; in a LONG-LIVED suite process LLVM segfaults on
# it nondeterministically on this image (observed twice at the same
# call; always green in a fresh interpreter — the image's XLA:CPU AOT
# kernels are built for mismatched host features, see the
# "prefer-no-scatter ... could lead to SIGILL" load warnings).
# test_pallas_step_isolated.py re-runs the module in a fresh
# interpreter; the env marker below lets that child (or a developer
# running the file directly with the marker set) collect it normally.
if os.environ.get("OBGC_PALLAS_STEP_SUBPROC") != "1":
    collect_ignore = ["test_pallas_step.py"]

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
