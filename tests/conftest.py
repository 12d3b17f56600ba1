"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is tested the standard JAX way — fake host-platform
devices (SURVEY.md §4d). Golden parity tests against the float64 NumPy
reference oracles enable x64.

IMPORTANT: this harness's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon (TPU tunnel), so env vars set here are too late —
the platform must be forced through jax.config, which also bypasses the
axon remote-compile interposer (complex FFTs hang/fail through it).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import os  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN_DIR


def load_golden(name):
    return np.load(os.path.join(GOLDEN_DIR, name))
