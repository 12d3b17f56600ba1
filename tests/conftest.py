"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is tested the standard JAX way — fake host-platform
devices (SURVEY.md §4d). Golden parity tests against the float64 NumPy
reference oracles enable x64.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN_DIR


def load_golden(name):
    return np.load(os.path.join(GOLDEN_DIR, name))
