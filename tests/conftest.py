"""Test configuration: force CPU with 8 virtual devices.

Tests run the same jitted code the TPU runs; an 8-device host mesh
exercises the multi-chip sharding paths (SURVEY.md §4 test strategy).

Note: in this environment the axon TPU plugin ignores the JAX_PLATFORMS
env var, so we force the platform through the config API after import.
XLA_FLAGS must still be set before the backend initializes.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running (multi-process / large) tests"
    )
