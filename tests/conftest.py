"""Test configuration: force the CPU backend with 8 virtual devices so sharding tests
run without TPU hardware (the standard JAX fake-backend trick, SURVEY.md §4). Must run
before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin in this image force-appends itself to jax_platforms even when
# JAX_PLATFORMS=cpu is set; pin the config explicitly.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
