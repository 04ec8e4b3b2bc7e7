"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

The reference has no distributed tests (SURVEY.md §4); we add them here, which
JAX makes cheap via --xla_force_host_platform_device_count.
"""
import os

# Force CPU: the session env pins JAX_PLATFORMS to the real TPU tunnel, but
# tests must run on a deterministic 8-device virtual CPU mesh.  Set
# PROCYON_TEST_TPU=1 to run the suite against the real chip instead.
if not os.environ.get("PROCYON_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("PROCYON_TEST_TPU"):
    # The axon sitecustomize force-sets jax_platforms="axon,cpu" at
    # interpreter start; backends init lazily, so overriding here (before any
    # jax.devices() call) still wins.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture
def rng():
    return np.random.default_rng(0)
