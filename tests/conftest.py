"""Test config: run JAX on a virtual 8-device CPU mesh.

Tests must be hardware-independent and exercise multi-chip sharding logic, so
we force the host platform with 8 virtual devices (the standard JAX
fake-multi-device pattern) before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize may have imported jax and pinned the
# platform list to the TPU backend already — override via the live config
# (effective as long as no backend has been initialized yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: >9s tests (train-step/e2e/golden-layout/mesh-equality); the "
        "fast pre-commit path is `pytest -m 'not slow'` (<5 min), CI runs all")
