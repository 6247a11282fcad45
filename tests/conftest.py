"""Test harness config.

Tests run on CPU (the env pins JAX_PLATFORMS=axon → one real TPU via a slow
tunnel, so we override in-process) with 8 virtual devices — the nompi.h
analog: the full multi-device code paths compile and run on a fake mesh
(SURVEY.md section 4 point 3).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session", autouse=True)
def _x64():
    # fp64 available for reference solutions; solver dtype set per-test
    jax.config.update("jax_enable_x64", True)
    yield
