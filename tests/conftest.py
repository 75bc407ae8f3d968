"""Test configuration: run on a virtual 8-device CPU mesh.

Real-TPU runs happen via bench.py / the eval harness; unit tests validate
numerics and the multi-chip sharding path without hardware.
SPSVO_TEST_TPU=1 skips the CPU forcing so the opt-in real-TPU parity tests
(e.g. test_fused_solver_tpu_lowering_parity) can run against the hardware.
"""
import os

if os.environ.get("SPSVO_TEST_TPU") != "1":
    # jax may already be imported by the interpreter's sitecustomize (axon
    # TPU plugin), so plain env vars are too late — but backend init is
    # lazy, so the config override below still wins as long as no
    # computation ran yet.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng(request):
    # deterministic per-test stream: independent of execution order and of
    # Python's per-process hash salt
    import zlib
    seed = zlib.crc32(request.node.nodeid.encode())
    return np.random.default_rng(seed)


@pytest.fixture(scope="session")
def sample_image_dir():
    d = "/root/reference/src/odml_visual_odometry/sample_images"
    if not os.path.isdir(d):
        pytest.skip("reference sample images unavailable")
    return d
