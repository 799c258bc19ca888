"""Test configuration: an 8-device virtual CPU mesh by default, the real
TPU on request.

Default (CI / CPU hosts): multi-chip sharding is validated on virtual CPU
devices (xla_force_host_platform_device_count); real-TPU runs happen via
bench.py and the driver's dryrun.

FHE_TEST_TPU=1: do NOT pin the backend -- the suite runs on the ambient
device (the axon TPU when present), mirroring the reference's
suites-under-MLX parity method (UnitTestMLX.cpp:22-24: same tests, GPU
build, byte-equality).  The device-only subset lives in
test_tpu_device.py and is marked `tpu`.

NOTE: this environment pre-imports jax at interpreter startup (axon
sitecustomize) with JAX_PLATFORMS=axon already captured, so the env var
alone is ignored -- jax.config.update is required to force CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

ON_TPU = os.environ.get("FHE_TEST_TPU") == "1"
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if ON_TPU:
        return
    skip_tpu = pytest.mark.skip(
        reason="needs the real device (set FHE_TEST_TPU=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
