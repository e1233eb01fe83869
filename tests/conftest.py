"""Test harness: hermetic, CPU-only, 8 virtual JAX devices.

The reference test suite is live-integration only (SURVEY.md §4); this
suite is the deterministic layer it lacks. Multi-chip sharding tests run
against an 8-device host mesh (xla_force_host_platform_device_count)."""

import os

# Must run before any jax import anywhere in the test session. The
# environment may pre-set JAX_PLATFORMS to a real accelerator (e.g. the
# axon TPU tunnel) — hermetic tests always run on virtual CPU devices.
# Set YRT_TEST_TPU=1 to run the suite against real hardware instead.
if not os.environ.get("YRT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    # jax may already be imported at interpreter startup (site hook); its
    # backends initialize lazily, so redirecting the platform still works.
    import jax

    jax.config.update("jax_platforms", "cpu")

# tornado's AsyncHTTPTestCase.fetch uses the module-level timeout (env
# knob only — subclass overrides are ignored); agent routes that spawn
# real pandas subprocesses outgrow the 5 s default under full-suite load
os.environ.setdefault("ASYNC_TEST_TIMEOUT", "30")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_unit_vectors(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture
def unit_vectors():
    return make_unit_vectors
