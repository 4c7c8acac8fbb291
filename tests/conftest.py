"""Test configuration: force CPU with 8 virtual devices + float64 support.

Multi-device behavior is tested without a TPU pod by overriding the host
platform device count — the TPU-native answer to "multi-node testing without
a cluster" (SURVEY.md section 4 item 6).

Note: this environment pre-imports jax at interpreter startup (site hook for
the TPU tunnel), so plain env vars are too late; jax.config.update still
works because no backend client exists until first use.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >= 8 virtual CPU devices, got {len(devs)}"
    return devs
