"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before the jax backend initialises (SURVEY.md §4:
multi-device tests via xla_force_host_platform_device_count).  The image's
sitecustomize force-registers the TPU (axon) plugin ignoring JAX_PLATFORMS,
so the platform is pinned via jax.config instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
