"""Test env: force CPU with 8 virtual devices so the party mesh / sharding
paths compile and run hermetically without TPU hardware (the driver benches
on the real chip). Must run before jax is imported anywhere."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import random

import numpy as np
import pytest

from honeybadgermpc_tpu.elliptic_curve import Subgroup
from honeybadgermpc_tpu.field import GF


@pytest.fixture(scope="session")
def galois_field():
    return GF(Subgroup.BLS12_381)


@pytest.fixture
def rng():
    return random.Random(1234)


@pytest.fixture
def np_rng():
    return np.random.default_rng(1234)
