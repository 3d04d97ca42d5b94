"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is validated on
host CPU with 8 virtual devices (the driver separately dry-run-compiles the multi-chip
path via ``__graft_entry__.dryrun_multichip``).

Note: this environment's sitecustomize pre-imports jax and pins JAX_PLATFORMS=axon
(single real TPU chip -- concurrent test processes would deadlock on the device lock),
so env vars are latched before conftest runs; ``jax.config.update`` is the only way to
redirect tests to CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_assets():
    """Path to the reference repo's DDS test corpus, if mounted (optional parity fixtures)."""
    path = "/root/reference/src/assets/tests"
    if not os.path.isdir(path):
        pytest.skip("reference assets not available")
    return path
