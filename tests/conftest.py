"""Test harness: run everything on CPU with 8 virtual devices.

Mirrors the reference's single-node TAP strategy (SURVEY.md §4) — no real
cluster needed; multi-chip sharding tests use the virtual device mesh.

Note: this environment's sitecustomize imports jax and pins the TPU
platform via JAX_PLATFORMS before conftest runs, so env vars alone don't
switch backends — use jax.config.update, and set XLA_FLAGS before the
first backend initialization (it is read lazily).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
