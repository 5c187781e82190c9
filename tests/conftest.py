"""Test harness configuration.

Tests run on the JAX CPU backend with 8 virtual devices so the full
multi-chip sharding paths (mesh, shard_map, top-k merge) execute in CI
without TPU hardware — the environment must be set before JAX imports.
(`PALLAS_AXON_POOL_IPS` is cleared so an ambient TPU-tunnel site config
can't hijack the platform selection.)
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def db_path(tmp_path):
    """A per-test throwaway database path."""
    return tmp_path / "testdb.sqlite"


def make_unit_rows(rng, n, d):
    """Random unit-norm float32 row vectors."""
    m = rng.standard_normal((n, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return m


@pytest.fixture
def unit_rows(rng):
    return lambda n, d: make_unit_rows(rng, n, d)
